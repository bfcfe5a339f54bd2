"""Bucketed table layout — amortizing the join shuffle into the write.

At 100 TB the dominant cost of a fact-to-fact join (events x orders on
customer key, lineitem x orders on order key) is the shuffle: both
sides re-hash every run. Spark's bucketed tables
(``bucketBy(n, key).sortBy(key)``) persist that hash partitioning INTO
the storage layout: each side is pre-split into ``n`` bucket files by
``hash(key) % n``, the catalog records the spec, and a scan of the
table reports a hash distribution on the bucket columns. A join or
aggregation keyed on the bucket columns then satisfies its clustering
requirement straight off the scan — **zero Exchange in the plan**
(asserted in ``tests/test_bucketed.py``), which at cluster scale means
zero network movement for every subsequent run against the layout.

Rules pinned here (and easy to get silently wrong):

- Both sides must bucket on the SAME columns; equal bucket counts
  join exchange-free outright, and 2:1 ratios still avoid the shuffle
  when ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on
  (the larger side's buckets are coalesced, Spark 3.1+).
- The join keys must be a superset match of the bucket columns with
  IDENTICAL types — an int-vs-bigint key cast re-introduces the
  exchange without warning.
- ``sortBy`` additionally persists in-bucket order; Spark still
  inserts a defensive Sort when a bucket spans multiple files, so
  writers that care compact to one file per bucket
  (``repartition(n, key)`` before write).
- This is the managed-table counterpart of the reference's manual
  "keep related rows in one shard" ClickHouse sharding-key layouts —
  but enforced by the catalog and visible to the optimizer, not a
  naming convention.

The reference has no analogue (ClickHouse handled placement); this is
native Spark capability surfaced as a first-class io path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    one_file_per_bucket: bool = False,
) -> None:
    """Write ``df`` as a bucketed catalog table.

    ``one_file_per_bucket`` pre-repartitions on the bucket columns so
    each bucket lands in exactly one file — the layout under which a
    ``sortBy`` matching the join keys also eliminates the Sort on read.
    """
    cols = list(bucket_cols)
    if one_file_per_bucket:
        df = df.repartition(n_buckets, *cols)
    writer = df.write.format(fmt).mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *list(sort_cols)[1:])
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> dict:
    """Catalog-recorded bucket layout of ``table``:
    ``{"n_buckets": int, "bucket_cols": [...], "sort_cols": [...]}``
    (zeros/empties when the table is not bucketed). Reads the DESCRIBE
    metadata, so it reflects what the OPTIMIZER will see, not what the
    writer intended."""
    rows = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    import re

    n = int(rows.get("Num Buckets", "0") or 0)

    def _cols(key: str) -> list[str]:
        raw = rows.get(key, "") or ""
        return [c.strip(" `") for c in re.findall(r"`([^`]+)`", raw)] or [
            c.strip() for c in raw.strip("[]").split(",") if c.strip()
        ]

    return {
        "n_buckets": n,
        "bucket_cols": _cols("Bucket Columns"),
        "sort_cols": _cols("Sort Columns"),
    }


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket columns.

    Raises if either side's bucket layout doesn't cover ``on`` —
    the failure mode is otherwise silent (the join still runs, it just
    quietly pays the full shuffle this layout exists to avoid).

    The join is MERGE-hinted: under the size thresholds that hold in
    tests Catalyst would pick a broadcast join, and a broadcast plan
    marks the scans ``Bucketed: false (disabled by query planner)`` —
    the layout goes unused. At the scales this layout targets both
    sides are far past broadcastable anyway, so the hint pins the
    plan tests exercise to the plan production would run."""
    keys = list(on)
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if not spec["n_buckets"] or [
            c for c in spec["bucket_cols"] if c not in keys
        ]:
            raise ValueError(
                f"{t} is not bucketed on a subset of join keys {keys}: {spec}"
            )
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), keys, how)
    )
