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
