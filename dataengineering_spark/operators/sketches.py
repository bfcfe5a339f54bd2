"""Distinct-count sketches that are deterministic ACROSS ENGINES.

Spark's ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` use different hash functions and register
layouts, so their estimates can never be compared exactly. The KMV
(k-minimum-values) sketch here derives every hash from md5, which both
engines compute identically — the estimate is a pure function of the
data, reproducible bit-for-bit anywhere md5 and IEEE doubles exist.

Estimator (Bar-Yossef et al. 2002): map each value to a uniform hash
in (0, 1]; if the k-th smallest hash among distinct values is h_k, the
distinct count is ≈ (k-1)/h_k (exact count when fewer than k distinct
values exist).

Scale shape: the global path is distinct → TakeOrdered(k) — the
distinct is the only shuffle and the top-k never concentrates rows on
one task. The grouped path reuses the two-stage top-k pattern
(rank within (partition, group), then within group over ≤ partitions×k
survivors) — no low-cardinality single-task windows. Sketch state is
k doubles per group: mergeable, tiny, the same contract as a real
sketch library's serialized registers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

UNIT_DENOM = 4294967296.0  # 2^32


def kmv_unit_hash(col: Column | str) -> Column:
    """Uniform hash in (0, 1]: (first 8 md5 hex chars as uint32 + 1)
    / 2^32. Engine-portable: DuckDB reproduces it from the same md5."""
    c = F.col(col) if isinstance(col, str) else col
    u32 = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    return (u32 + F.lit(1.0)) / F.lit(UNIT_DENOM)


def kmv_unit_hash_sql(expr: str) -> str:
    """The DuckDB/ANSI mirror of :func:`kmv_unit_hash` for oracle
    generation (same 2^32 grid, same +1 offset)."""
    from dataengineering_spark.operators.dedup import hex32_sql

    return f"(({hex32_sql(f'md5(CAST({expr} AS VARCHAR))')}) + 1.0) / {UNIT_DENOM!r}"


def _estimate(k: int) -> Column:
    n, hk = F.count(F.lit(1)), F.max("h")
    return (
        F.when(n < k, n.cast("double"))
        .otherwise((F.lit(float(k)) - F.lit(1.0)) / hk)
        .alias("distinct_est")
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Single-row frame with ``distinct_est`` for one column."""
    hs = df.select(kmv_unit_hash(col).alias("h")).distinct()
    kmin = hs.orderBy("h").limit(k)  # TakeOrderedAndProject
    return kmin.agg(_estimate(k))


def kmv_distinct_by(
    df: DataFrame, group_cols: list[str], col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV estimates: group columns + ``distinct_est``."""
    hs = df.select(*group_cols, kmv_unit_hash(col).alias("h")).distinct()
    w_local = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy("h")
    pruned = (
        hs.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .drop("lr")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kmin = (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    return kmin.groupBy(*group_cols).agg(_estimate(k))


# --- mergeable sketch state -------------------------------------------------
#
# The form a 100 TB incremental pipeline actually uses: per-shard (or
# per-stream-epoch) sketches materialize as (group, kmins array<double>)
# rows — k doubles of state, the same contract as a sketch library's
# serialized registers — and combine with a lossless union-merge: the k
# smallest distinct hashes of the union of per-shard k-min sets ARE the
# k smallest of the union (any global top-k hash is top-k in its own
# shard), so estimate(merge(shards)) == estimate(whole), exactly.


def kmv_sketch_by(
    df: DataFrame, group_cols: list[str], col: str, k: int = 64
) -> DataFrame:
    """Sketch STATE per group: group columns + ``kmins`` — the sorted
    ≤ k smallest distinct unit hashes. Same two-stage top-k shape as
    :func:`kmv_distinct_by` (no low-cardinality single-task windows)."""
    hs = df.select(*group_cols, kmv_unit_hash(col).alias("h")).distinct()
    w_local = Window.partitionBy(F.spark_partition_id(), *group_cols).orderBy("h")
    pruned = (
        hs.withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .drop("lr")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    kmin = (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    return kmin.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("h")).alias("kmins")
    )


def kmv_merge_sketches(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Union-merge sketch states across shards/streams: one row per
    group with the merged ``kmins``. The shuffle payload is one ≤ k
    double array per input sketch row — never the data."""
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmins")))),
            1,
            k,
        ).alias("kmins")
    )


def kmv_estimate_from_sketch(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Attach ``distinct_est`` to a sketch-state frame (exact count
    when the group never filled its k slots)."""
    n = F.size("kmins")
    est = (
        F.when(n < k, n.cast("double"))
        .otherwise(
            (F.lit(float(k)) - F.lit(1.0)) / F.element_at(F.col("kmins"), k)
        )
        .alias("distinct_est")
    )
    return sketch.select("*", est)


# --- Apache DataSketches HLL state ------------------------------------------
#
# The JVM-native counterpart of the KMV state above: Spark ships the
# Apache DataSketches HLL aggregates (hll_sketch_agg / hll_union_agg /
# hll_sketch_estimate), whose serialized sketch is a binary column —
# register state that merges losslessly across shards (register-wise
# max in dense mode, coupon-set union in sparse mode), so
# estimate(union(shard sketches)) == estimate(direct sketch of the
# whole), exactly, for equal lgConfigK. These wrappers pin that
# contract: same lgK on build and merge, and the merge path carries
# one ~2^lgK-byte blob per (group, shard) — never the data. The
# estimate is NOT engine-portable (DuckDB's HLL hashes differently);
# cross-engine checks assert merge-consistency and error bounds, not
# the raw estimate — that is what the KMV sketch is for.


def hll_sketch_by(
    df: DataFrame, group_cols: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """HLL sketch STATE per group: group columns + ``hll`` binary."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lgk)).alias("hll")
    )


def hll_merge_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-merge HLL states across shards/streams (equal lgK)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg("hll", F.lit(False)).alias("hll")
    )


def hll_estimate_from_sketch(sketch: DataFrame) -> DataFrame:
    """Attach ``distinct_est`` (double) to an HLL-state frame."""
    return sketch.select(
        "*", F.hll_sketch_estimate("hll").cast("double").alias("distinct_est")
    )
