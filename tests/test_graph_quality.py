"""Graph sink (S18-S22, V5) and quality checks (V1, V2, V6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.aggregates import (
    link_inputs_agg,
    transactions_agg,
)
from dataengineering_spark.plans.queries import transfers_from_events
from dataengineering_spark.quality.checks import (
    check_prices,
    require_nonempty,
    validate_counts_match,
)
from dataengineering_spark.sources.graph import GraphSink
from tests.conftest import SF_SMOKE


@pytest.fixture
def transfers(spark):
    return transfers_from_events(read_table(spark, "events", SF_SMOKE))


def test_graph_sink_vertices_edges(spark, tmp_path, transfers):
    sink = GraphSink(str(tmp_path / "graph"))
    v = transactions_agg(transfers).withColumnRenamed("transaction_id", "id")
    e = link_inputs_agg(transfers).select(
        F.col("sender_address").alias("src"),
        F.col("transaction_id").alias("dst"),
        "value",
        "value_usd",
    )
    vstats = sink.write_vertices(v, "transactions")
    estats = sink.write_edges(e, "link_inputs")
    assert vstats.ok and estats.ok
    assert sink.vertices(spark, "transactions").count() == v.count()
    assert sink.edges(spark, "link_inputs").count() == e.count()


def test_graph_sink_rejects_null_keys(spark, tmp_path):
    sink = GraphSink(str(tmp_path / "graph"))
    bad = spark.createDataFrame(
        [("a", 1.0), (None, 2.0)], "id string, w double"
    )
    with pytest.raises(ValueError, match="rejected 1 rows"):
        sink.write_vertices(bad, "t")
    # non-strict mode: stats instead of exception (V5-as-metrics)
    stats = sink.write_vertices(bad, "t", strict=False)
    assert stats.reject_count == 1 and stats.null_key_count == 1


def test_graph_sink_rejects_oversize_attrs(spark, tmp_path):
    sink = GraphSink(str(tmp_path / "graph"))
    big = spark.createDataFrame(
        [("a", "x" * (GraphSink.MAX_ATTR_BYTES + 1))], "id string, blob string"
    )
    stats = sink.write_vertices(big, "t", strict=False)
    assert stats.size_exceeded_count == 1


def test_validate_counts_match(spark):
    orders = read_table(spark, "orders", SF_SMOKE)
    assert validate_counts_match(orders, orders).passed
    res = validate_counts_match(orders, orders.limit(10))
    assert not res.passed and res.details["right"] == 10


def test_validate_counts_by_group(spark):
    orders = read_table(spark, "orders", SF_SMOKE)
    ok = validate_counts_match(orders, orders, group_col="o_orderstatus")
    assert ok.passed
    skewed = orders.filter(F.col("o_orderstatus") != "O")
    bad = validate_counts_match(orders, skewed, group_col="o_orderstatus")
    assert not bad.passed
    assert any(g["o_orderstatus"] == "O" for g in bad.details["mismatched_groups"])


def test_check_prices_rules(spark):
    prices = spark.createDataFrame(
        [("ETH", 3000.0), ("ZERO", 0.0), ("OK", 1.0)], "symbol string, price double"
    )
    tokens = spark.createDataFrame(
        [("ETH",), ("OK",), ("MISSING",)], "symbol string"
    )
    native, zero, missing = check_prices(prices, tokens, native_symbol="ETH")
    assert native.passed
    assert zero.passed  # 1/3 < 50%
    assert not missing.passed and missing.details["missing"] == ["MISSING"]

    bad_native, *_ = check_prices(
        prices.filter("symbol != 'ETH'"), tokens, native_symbol="ETH"
    )
    assert not bad_native.passed


def test_require_nonempty(spark):
    df = spark.range(1)
    assert require_nonempty(df) is df
    with pytest.raises(ValueError, match="empty input"):
        require_nonempty(df.filter("id < 0"), "batch")


def test_pagerank_checkpointing_is_result_invariant(spark):
    """Deep iteration counts truncate lineage via localCheckpoint;
    integer-arithmetic supersteps make truncation observationally
    invisible — ranks must match the unbroken-lineage run exactly."""
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.operators.graph_analytics import pagerank_ranks

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("a", "c", 3), ("d", "a", 1)],
        ["src", "dst", "w"],
    )
    nodes = spark.createDataFrame([(n,) for n in "abcd"], ["node"])
    plain = {
        r.node: r.rank_micro
        for r in pagerank_ranks(edges, nodes, n_iters=12, checkpoint_every=0).collect()
    }
    release_tracked()
    chk = {
        r.node: r.rank_micro
        for r in pagerank_ranks(edges, nodes, n_iters=12, checkpoint_every=4).collect()
    }
    release_tracked()
    assert plain == chk
    assert all(v > 0 for v in plain.values())


def test_observe_metrics_single_pass(spark):
    from pyspark.sql import functions as F

    from dataengineering_spark.quality.checks import observe_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], ["k", "v"]
    )
    observed, obs = observe_metrics(
        df,
        "batch_obs",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "sum_v": F.sum("v"),
        },
    )
    assert observed.filter(F.col("k") > 0).count() == 3  # consuming action
    got = obs.get
    assert got["n_rows"] == 3 and got["n_null_v"] == 1 and got["sum_v"] == 40.0


def test_chunk_spans_udtf(spark):
    from dataengineering_spark.functions.udf_registry import register_chunk_spans_udtf

    register_chunk_spans_udtf(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_spans('abcdefghij', 4) ORDER BY start"
    ).collect()
    assert [(r.start, r.piece) for r in rows] == [(0, "abcd"), (4, "efgh"), (8, "ij")]
    lateral = spark.sql(
        """
        SELECT t.id, c.start, c.piece
        FROM VALUES (1, 'xxxyyy'), (2, 'zz') AS t(id, txt),
        LATERAL chunk_spans(t.txt, 3) AS c
        ORDER BY t.id, c.start
        """
    ).collect()
    assert [(r.id, r.start, r.piece) for r in lateral] == [
        (1, 0, "xxx"), (1, 3, "yyy"), (2, 0, "zz"),
    ]
