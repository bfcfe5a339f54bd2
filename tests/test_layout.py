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


def test_zorder_write_produces_prunable_files(spark, tmp_path):
    """End-to-end file-skipping proof: write the Morton-clustered
    frame and read back the parquet FOOTER stats — per-file _zkey
    [min, max] ranges must be pairwise disjoint (range partitioning),
    so any zkey range predicate prunes to the files it intersects.
    This is the property Delta/Iceberg OPTIMIZE ZORDER delivers,
    verified here at the raw-parquet layer the engine writes."""
    import os

    import pyarrow.parquet as pq

    from dataengineering_spark.catalog import read_table

    orders = read_table(spark, "orders", SF_SMOKE).select(
        "o_orderkey", "o_custkey"
    )
    out = str(tmp_path / "zordered")
    cluster_by_morton(
        orders, ["o_custkey", "o_orderkey"], bits=16, n_files=8
    ).write.parquet(out)

    ranges = []
    for name in sorted(os.listdir(out)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, name)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "_zkey"
        )
        lo = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))

    assert len(ranges) >= 4  # range partitioner actually split
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file zkey ranges overlap - no skipping possible"

    # a point probe in zkey space intersects exactly one file's range
    probe = ranges[len(ranges) // 2][0]
    touched = sum(1 for lo, hi in ranges if lo <= probe <= hi)
    assert touched == 1
