"""Table maintenance (SURVEY.md §2.4 A8, §4 dedup row): the
``OPTIMIZE TABLE ... FINAL DEDUPLICATE`` family as engine-side
partition rewrites.

The reference enumerates ``_YYYY_MM`` partitions and issues one
blocking OPTIMIZE per partition per shard
(``clickhouse/v1/utils.py:159-193``). Here dedup is a scoped rewrite:
only the requested partitions are read, deduplicated, and atomically
replaced via dynamic partition overwrite — other partitions are never
touched, so the operation is O(partition) not O(table), which is what
makes it runnable against a 100 TB table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    action_col: str | None = "action",
) -> DataFrame:
    """MERGE INTO semantics as one full-outer join (no MERGE statement
    needed on plain parquet):

    - key in both         → source row wins (WHEN MATCHED THEN UPDATE)
    - key only in source  → source row inserted (WHEN NOT MATCHED)
    - key only in target  → target row kept

    Both frames must share the same schema. ``action_col`` (optional)
    appends 'update' / 'insert' / 'keep' per row so the merge is
    auditable. One shuffle on the key — the join IS the merge; at
    scale, write the result with dynamic partition overwrite
    (``dedup_table_partitions`` shows the scoped-rewrite pattern).

    Reference analogue: the staging-flush lifecycle
    (``clickhouse/v1/operator.py`` DELETE+reload) expressed as a
    declarative plan instead of imperative DML.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"schema mismatch: {sorted(target.columns)} vs {sorted(source.columns)}"
        )
    non_keys = [c for c in target.columns if c not in keys]
    t = target.withColumn("_t_present", F.lit(1))
    s = source.withColumn("_s_present", F.lit(1))
    joined = t.alias("t").join(s.alias("s"), keys, "full_outer")
    matched = F.col("s._s_present").isNotNull()
    cols = [
        *[F.col(k).alias(k) for k in keys],
        *[
            F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in non_keys
        ],
    ]
    if action_col:
        cols.append(
            F.when(matched & F.col("t._t_present").isNotNull(), F.lit("update"))
            .when(matched, F.lit("insert"))
            .otherwise(F.lit("keep"))
            .alias(action_col)
        )
    return joined.select(*cols)


def dedup_table_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partitions: list | None = None,
    subset: list[str] | None = None,
) -> dict:
    """Deduplicate a partitioned parquet table in place.

    - ``partitions=None``: all partitions (the whole-table OPTIMIZE);
    - otherwise only the listed partition values are rewritten
      (the per-YYYYMM variant).
    - ``subset``: dedup key columns (None = full-row distinct).

    Returns {"before": n, "after": n} row counts for the rewritten
    scope.
    """
    df = spark.read.parquet(path)
    scope = df if partitions is None else df.filter(
        F.col(partition_col).isin(partitions)
    )
    before = scope.count()
    deduped = scope.distinct() if subset is None else scope.dropDuplicates(subset)
    after = deduped.count()
    (
        deduped.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return {"before": before, "after": after}
