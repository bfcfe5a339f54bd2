"""Chain dialects (T8), partition dedup maintenance (A8), job config
(X1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_spark.catalog import Chain
from dataengineering_spark.operators.chain_state import (
    chain_state,
    dialect_for,
    head_table_name,
)
from dataengineering_spark.operators.maintenance import dedup_table_partitions
from dataengineering_spark.jobs import JobConfig, run_job


def test_dialect_routing():
    assert dialect_for(Chain.BITCOIN).offset_col == "block_number"
    assert dialect_for(Chain.RIPPLE).offset_cast == "bigint"
    assert dialect_for(Chain.HEDERA).derive_from_txn_id
    assert dialect_for(Chain.POLYGON).table == "{chain}.master"  # default
    assert head_table_name(Chain.BITCOIN) == "bitcoin.txns"
    assert head_table_name(Chain.ETHEREUM) == "ethereum.tld_raw_hot"


def test_chain_state_default_and_btc(spark):
    master = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00"), (12, "2024-01-01 00:05:00")],
        "block long, block_date_time string",
    ).withColumn("block_date_time", F.to_timestamp("block_date_time"))
    row = chain_state(master, Chain.POLYGON).collect()[0]
    assert (row.chain, row.block) == ("polygon", 12)
    assert row.block_date_time is not None

    txns = spark.createDataFrame([(100,), (101,)], "block_number long")
    row = chain_state(txns, Chain.BITCOIN).collect()[0]
    assert (row.chain, row.block) == ("bitcoin", 101)


def test_chain_state_ripple_string_blocks(spark):
    master = spark.createDataFrame(
        [("9",), ("10",)], "block string"
    )  # string max would say "9"; cast must say 10
    row = chain_state(master, Chain.RIPPLE).collect()[0]
    assert row.block == 10


def test_chain_state_hedera_txn_id(spark):
    master = spark.createDataFrame(
        [
            (5, "0.0.887615-1651341539-309799857"),
            (7, "0.0.887615-1651341600-123456789"),
        ],
        "block long, transaction_id string",
    )
    row = chain_state(master, Chain.HEDERA).collect()[0]
    assert row.block == 7
    assert str(row.consensus_ts) == "1651341600.123456789"


def test_chain_state_date_pruning_predicate(spark):
    master = spark.createDataFrame(
        [(1, "2023-12-31 23:00:00"), (99, "2024-01-02 00:00:00")],
        "block long, block_date_time string",
    ).withColumn("block_date_time", F.to_timestamp("block_date_time"))
    row = chain_state(master, Chain.POLYGON, since_date="2024-01-01").collect()[0]
    assert row.block == 99


def test_dedup_table_partitions_scoped(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "p1"), (1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"), (3, "c", "p2")],
        "id int, v string, p string",
    )
    df.write.partitionBy("p").parquet(path)
    # scoped: only p1 rewritten; p2's duplicate must survive
    stats = dedup_table_partitions(spark, path, "p", partitions=["p1"])
    assert stats == {"before": 3, "after": 2}
    remaining = spark.read.parquet(path)
    assert remaining.count() == 4  # p1: 2 rows, p2: still 2 dupes
    # full-table pass cleans the rest
    stats = dedup_table_partitions(spark, path, "p")
    assert spark.read.parquet(path).count() == 3


def test_run_job_retries_then_succeeds():
    calls = {"n": 0}
    events = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "done"

    cfg = JobConfig(
        "j",
        retries=5,
        retry_delay_s=0.0,
        on_success=lambda n: events.append(("ok", n)),
        on_failure=lambda n, e: events.append(("fail", n)),
    )
    assert run_job(cfg, flaky, sleep=lambda s: None) == "done"
    assert events == [("ok", "j")]


def test_run_job_exhausts_and_notifies():
    events = []

    def dead():
        raise RuntimeError("permanent")

    cfg = JobConfig(
        "j", retries=2, retry_delay_s=0.0,
        on_failure=lambda n, e: events.append((n, str(e))),
    )
    with pytest.raises(RuntimeError, match="permanent"):
        run_job(cfg, dead, sleep=lambda s: None)
    assert events == [("j", "permanent")]


def test_run_job_timeout():
    t = {"now": 0.0}

    def clock():
        return t["now"]

    def slow_fail():
        t["now"] += 10.0
        raise RuntimeError("each attempt 10s")

    cfg = JobConfig("j", retries=100, retry_delay_s=0.0, timeout_s=25.0)
    with pytest.raises(RuntimeError):
        run_job(cfg, slow_fail, sleep=lambda s: None, clock=clock)
    assert t["now"] <= 40.0  # bounded by timeout, not 100 retries


def test_merge_upsert_three_branches(spark):
    from dataengineering_spark.operators.maintenance import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B")], ["key", "price", "status"]
    )
    source = spark.createDataFrame(
        [(2, 99.0, "B2"), (3, 30.0, "C")], ["key", "price", "status"]
    )
    out = {r.key: r for r in merge_upsert(target, source, ["key"]).collect()}
    assert out[1].price == 10.0 and out[1].action == "keep"
    assert out[2].price == 99.0 and out[2].status == "B2" and out[2].action == "update"
    assert out[3].price == 30.0 and out[3].action == "insert"
    assert len(out) == 3


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest as _pytest

    from dataengineering_spark.operators.maintenance import merge_upsert

    t = spark.createDataFrame([(1, 1.0)], ["key", "a"])
    s = spark.createDataFrame([(1, 1.0)], ["key", "b"])
    with _pytest.raises(ValueError):
        merge_upsert(t, s, ["key"])


def test_merge_upsert_no_action_col(spark):
    from dataengineering_spark.operators.maintenance import merge_upsert

    t = spark.createDataFrame([(1, 1.0)], ["key", "a"])
    s = spark.createDataFrame([(2, 2.0)], ["key", "a"])
    merged = merge_upsert(t, s, ["key"], action_col=None)
    assert set(merged.columns) == {"key", "a"}
    assert merged.count() == 2
