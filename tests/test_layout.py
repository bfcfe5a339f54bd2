"""Z-order layout: key correctness (vs a Python bit-interleave
reference) and the write-side clustering plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineering_spark.operators.layout import cluster_by_morton, morton_key
from tests.conftest import SF_SMOKE


def _ref_morton(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_morton_key_matches_bit_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)], "a LONG, b LONG"
    )
    rows = df.select("a", "b", morton_key(("a", "b")).alias("z")).collect()
    for r in rows:
        assert r["z"] == _ref_morton([r["a"], r["b"]], 16), (r["a"], r["b"])


def test_morton_locality_prunes_both_dims(spark):
    # a query on EITHER dimension touches a bounded z-range: the top
    # bucket (high interleaved bits) splits both dimension halves
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    z = df.select("a", "b", morton_key(("a", "b"), bits=4).alias("z"))
    by_bucket = z.groupBy((F.col("z") / 64).cast("int").alias("bucket")).agg(
        F.max("a").alias("ma"), F.min("a").alias("na"),
        F.max("b").alias("mb"), F.min("b").alias("nb"),
    )
    for r in by_bucket.collect():
        # each of the 4 coarse buckets covers a half-range of BOTH dims
        assert r["ma"] - r["na"] <= 7, r
        assert r["mb"] - r["nb"] <= 7, r


def test_cluster_by_morton_plan_and_order(spark):
    from dataengineering_spark.catalog import read_table

    orders = read_table(spark, "orders", SF_SMOKE)
    out = cluster_by_morton(
        orders, ("o_custkey % 65536", "o_orderkey % 65536"), n_files=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    # within-partition sortedness of the key
    import itertools

    def check(it):
        part = [r["_zkey"] for r in it]
        assert part == sorted(part)
        yield len(part)

    sizes = out.select("_zkey").rdd.mapPartitions(check).collect()
    assert sum(sizes) == orders.count()
