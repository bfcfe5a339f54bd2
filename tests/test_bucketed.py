"""Bucketed layout: the join/agg shuffle is amortized into the write.

The assertions are differential plan checks — the SAME join that costs
two Exchanges from plain parquet costs zero from the bucketed layout —
plus a value-level equivalence check so the layout is proven to change
only the plan, never the result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.sources.bucketed import (
    bucket_spec,
    colocated_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """orders + a lineitem rollup, both bucketed 8-ways on o_orderkey."""
    base = tmp_path_factory.mktemp("bucketed")
    orders = read_table(spark, "orders", SF).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lines = (
        read_table(spark, "lineitem", SF)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    write_bucketed(
        orders, "orders_b", 8, ["o_orderkey"], sort_cols=["o_orderkey"],
        path=str(base / "orders_b"), one_file_per_bucket=True,
    )
    write_bucketed(
        lines, "lines_b", 8, ["o_orderkey"], sort_cols=["o_orderkey"],
        path=str(base / "lines_b"), one_file_per_bucket=True,
    )
    yield "orders_b", "lines_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lines_b")


def test_bucket_spec_reflects_layout(spark, bucketed_tables):
    spec = bucket_spec(spark, bucketed_tables[0])
    assert spec["n_buckets"] == 8
    assert spec["bucket_cols"] == ["o_orderkey"]
    assert spec["sort_cols"] == ["o_orderkey"]


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    joined = colocated_join(spark, *bucketed_tables, on=["o_orderkey"])
    plan = plan_of(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_plain_parquet_join_pays_the_shuffle(spark):
    """Differential control: without the layout the identical join
    plans at least one Exchange (broadcast or shuffle), proving the
    bucketed plan's zero-Exchange shape comes from the layout."""
    orders = read_table(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    lines = (
        read_table(spark, "lineitem", SF)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    plan = plan_of(orders.join(lines, "o_orderkey"))
    assert "Exchange" in plan or "BroadcastHashJoin" in plan, plan


def test_groupby_on_bucket_key_is_exchange_free(spark, bucketed_tables):
    agg = (
        spark.table(bucketed_tables[0])
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    assert "Exchange" not in plan_of(agg), plan_of(agg)


def test_layout_changes_plan_not_values(spark, bucketed_tables):
    got = {
        (r.o_orderkey, float(r.o_totalprice), float(r.total_qty))
        for r in colocated_join(spark, *bucketed_tables, on=["o_orderkey"])
        .select("o_orderkey", "o_totalprice", "total_qty")
        .collect()
    }
    orders = read_table(spark, "orders", SF).select("o_orderkey", "o_totalprice")
    lines = (
        read_table(spark, "lineitem", SF)
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
    )
    ref = {
        (r.o_orderkey, float(r.o_totalprice), float(r.total_qty))
        for r in orders.join(lines, "o_orderkey").collect()
    }
    assert got == ref


def test_point_lookup_prunes_buckets(spark, bucketed_tables):
    """An equality filter on the bucket column scans ONE bucket of 8 —
    at 100 TB a key lookup reads 1/n_buckets of the table before any
    row-group statistics even apply.  autoBucketedScan must be off
    for a bare filter: the auto heuristic only keeps the bucketed
    scan when a join/agg needs the distribution, and it disables
    bucket pruning along with it."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(bucketed_tables[0]).filter(F.col("o_orderkey") == 32)
        plan = plan_of(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_colocated_join_refuses_unbucketed_side(spark, bucketed_tables):
    read_table(spark, "nation", SF).write.mode("overwrite").saveAsTable(
        "nation_plain"
    )
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            colocated_join(
                spark, bucketed_tables[0], "nation_plain", on=["o_orderkey"]
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_plain")
