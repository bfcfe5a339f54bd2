"""Bucketed table layout for shuffle-free co-located joins
(100 TB posture; SCALE.md).

A fact⋈fact join (orders⋈lineitem at 100 TB) can't broadcast either
side; the default is a sort-merge join that shuffles BOTH tables
every query. Bucketing pays that shuffle once at write time: both
tables hash-clustered into the same number of buckets on the join
key, after which every join on that key is exchange-free (each task
reads matching bucket files directly).

Spark's bucketing rides the session catalog (`saveAsTable`), so these
helpers wrap table-name IO rather than path IO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the Sort from
    sort-merge plans — the full co-located layout."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    matching bucket specs the physical plan contains no Exchange on
    either side (asserted in tests) — the join runs at file-read
    parallelism regardless of table size."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
