"""Skew mitigation (100 TB posture; SURVEY.md §4 / build-plan risks).

First line of defense is AQE: ``spark.sql.adaptive.skewJoin`` splits
oversized join partitions at runtime and is ON in session.py. The
helpers here cover what AQE can't:

- ``salted_join``: a shuffle join where one key dominates (a hub
  address, a null-ish default token). AQE splits the *partition*,
  but every row of the hot key still lands on one task pair; salting
  spreads one key over N subkeys by replicating the small side N
  ways — classic key-salting, expressed declaratively.
- ``salted_collect``: aggregations with no partial combine
  (collect_list/collect_set) concentrate a hot group's rows on one
  reducer; two-phase salted collection bounds any task at
  |group|/N. (sum/count/min/max DON'T need this — Spark's partial
  aggregation already combines map-side.)

Both are semantically transparent: results equal the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic pseudo-random salt in [0, n_salts): derived from a
    per-row spray (rand would break retry idempotency of a task)."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.hash(F.monotonically_increasing_id(), F.spark_partition_id()),
            F.lit(n_salts),
        ).cast("int"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the
    right side replicated across all salts. Output matches the plain
    ``left.join(right, on, how)`` for left-preserving joins only:
    inner / left / left_outer / left_semi / left_anti. Right-preserving
    joins (right/full outer) would emit each unmatched right row once
    per salt replica, so they are rejected.

    Cost model: right side is shuffled n_salts times — use when
    |right| * n_salts ≪ |left|'s hot-key mass, i.e. the standard
    skew trade."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only "
            f"({sorted(allowed)}); got how={how!r} — the replicated "
            f"right side would duplicate unmatched right rows."
        )
    salted_left = with_salt(left, n_salts)
    replicated_right = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = salted_left.join(
        replicated_right, on=[*on, "_salt"], how=how
    )
    return out.drop("_salt")


def salted_collect(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    distinct: bool = False,
) -> DataFrame:
    """Two-phase collect_list/collect_set: phase 1 collects within
    (keys, salt) — bounding any task's group size — phase 2 flattens
    the per-salt arrays. Output: keys + ``values`` array (sorted for
    determinism)."""
    collect = F.collect_set if distinct else F.collect_list
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(collect(value_col).alias("_partial"))
    )
    merged = phase1.groupBy(*keys).agg(
        F.flatten(F.collect_list("_partial")).alias("values")
    )
    values = F.array_sort(
        F.array_distinct(F.col("values")) if distinct else F.col("values")
    )
    return merged.withColumn("values", values)


def explain_skew(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Key-frequency profile — the diagnostic to run before choosing a
    mitigation. Returns the heaviest keys with their share. Ties at
    the ``top`` boundary break on the keys themselves so the profile
    is reproducible across runs and engines."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return (
        counts.withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
        .limit(top)
    )
