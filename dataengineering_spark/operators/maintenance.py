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
