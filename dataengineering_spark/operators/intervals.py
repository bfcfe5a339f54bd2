"""Order-statistics window kernels: 2-D skyline and interval union.

Both are single-window-shuffle re-expressions of computations that are
naively quadratic (skyline: all-pairs dominance test) or sequential
(interval union: sweep-line merge). The reference runs shapes like
these as ClickHouse SQL through the generic execute operator
(``clickhouse/v1/operator.py:440-499``); here they are reusable
distributed plans whose only exchange is the hash partition on the
group key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(partition_by: str | Sequence[str]) -> list[str]:
    return [partition_by] if isinstance(partition_by, str) else list(partition_by)


def skyline_2d(
    df: DataFrame,
    partition_by: str,
    x: str,
    y: str,
) -> DataFrame:
    """Rows not STRICTLY dominated on (x, y) within each partition.

    Strict dominance: r is dropped iff some same-partition row has
    BOTH greater x AND greater y. With the window ordered x DESC, a
    RANGE frame ending at -1 PRECEDING sees exactly the rows with
    x ≥ mine+1 (x must be integral for the offset to mean "strictly
    greater"), so the quadratic test collapses to one cumulative max
    of y. Ties on x never dominate each other, which the RANGE frame
    (value-based, tie-inclusive boundaries) gets right and a ROWS
    frame would not.
    """
    w = (
        Window.partitionBy(partition_by)
        .orderBy(F.col(x).desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    dom = F.max(y).over(w)
    return (
        df.withColumn("_dom_y", dom)
        .filter(F.col("_dom_y").isNull() | (F.col("_dom_y") <= F.col(y)))
        .drop("_dom_y")
    )


def interval_union(
    df: DataFrame,
    partition_by: str | Sequence[str],
    start: str,
    end: str,
    island_col: str = "island",
) -> DataFrame:
    """Label overlapping/touching intervals with a per-partition island id.

    Sweep-line as windows: an interval opens a new island iff its
    start exceeds the running max of all previous ends (ordered by
    (start, end); ties are island-equivalent so intra-tie order is
    irrelevant); a running sum of those flags is the island label.
    Intervals that merely touch (start == previous end) MERGE — the
    half-open convention [start, end). Callers aggregate per
    (partition, island) for coverage / merged spans.
    """
    wo = Window.partitionBy(*_keys(partition_by)).orderBy(start, end)
    prevmax = F.max(end).over(wo.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prevmax.isNull() | (F.col(start) > prevmax), 1
    ).otherwise(0)
    return df.withColumn("_new", new_island).withColumn(
        island_col,
        F.sum("_new").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")


def interval_coverage(
    df: DataFrame,
    partition_by: str | Sequence[str],
    start: str,
    end: str,
) -> DataFrame:
    """Total covered length and merged-interval count per partition."""
    isl = interval_union(df, partition_by, start, end)
    per_island = isl.groupBy(*_keys(partition_by), "island").agg(
        F.min(start).alias("_lo"), F.max(end).alias("_hi")
    )
    return per_island.groupBy(*_keys(partition_by)).agg(
        F.sum(F.col("_hi") - F.col("_lo")).alias("covered"),
        F.count("*").alias("n_intervals"),
    )
