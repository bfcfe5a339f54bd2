"""Partition pruning on partitioned layouts — static and dynamic.

At 100 TB the fact table is date/status-partitioned; a scan that
cannot prove partition elimination reads everything. Static pruning
(literal predicate → PartitionFilters) and dynamic partition pruning
(the filter arrives at runtime from the dim side of a join) are both
plan-visible, so these tests pin them the same way test_plan_shape
pins broadcast/pushdown.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _write_partitioned(spark, tmp_path):
    src = spark.createDataFrame(
        [(i, ["A", "B", "C"][i % 3], float(i)) for i in range(300)],
        ["id", "status", "amount"],
    )
    path = str(tmp_path / "fact_by_status")
    src.write.mode("overwrite").partitionBy("status").parquet(path)
    return path


def test_static_partition_pruning(spark, tmp_path):
    path = _write_partitioned(spark, tmp_path)
    df = spark.read.parquet(path).filter(F.col("status") == "B")
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan and "status" in plan
    # the pruned scan must not enumerate the other partitions' rows
    assert df.count() == 100
    assert df.select(F.min((F.col("id") % 3)).alias("m")).collect()[0].m == 1


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    path = _write_partitioned(spark, tmp_path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("A", "keep"), ("B", "drop"), ("C", "drop")], ["status", "tag"]
    )
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "status")
    plan = _executed_plan(joined)
    # runtime filter pushed into the partitioned scan
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 100
    assert set(r.status for r in joined.select("status").distinct().collect()) == {"A"}
