"""Backward as-of join — the time-series operator Spark's join zoo
lacks (pandas ``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``).

For each left row, attach value columns from the most recent right
row whose timestamp is <= the left timestamp, per key. Implemented as
a composition of existing DataFrame ops (no UDF, no per-row Python):

1. union the two sides into one tagged stream,
2. one Window per key ordered by (ts, side) with rights sorting
   before lefts at equal timestamps (<= semantics),
3. ``last(struct(ts, values...), ignoreNulls=True)`` over the
   unbounded-preceding frame carries the latest right ROW forward —
   the struct is non-null for every right row, so a right row whose
   value columns are NULL still matches and attaches its NULLs
   (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics), and the
   match timestamp used by ``tolerance`` always comes from the same
   row that supplied the values,
4. keep only left rows.

Scale shape: exactly ONE exchange, hash-partitioned by the join key —
the same shuffle a sort-merge join would pay, with per-key windows
over high-cardinality keys (users, instruments), never a global sort.
An optional ``tolerance`` bounds the lookback like pandas
``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left columns plus ``{value}{suffix}`` for
    each value column (null when no right row at-or-before exists, or
    when the match is older than ``tolerance_seconds``).

    Right-side rows must be unique per (key, right_ts) — pre-aggregate
    duplicates upstream (e.g. ``groupBy(key, ts).agg(max_by(...))``)
    or the carried value at a tied timestamp is undefined.
    """
    on = list(on)
    value_cols = list(value_cols)
    left_cols = left.columns

    # The tagged-stream composition owns a small internal namespace;
    # a key or value column with one of these names would silently
    # collide (e.g. a value column literally named '_mts' would give
    # the match struct two '_mts' fields and tolerance would read the
    # wrong one). Fail loudly instead.
    reserved = {"_ts", "_side", "_row", "_m", "_mts"} | {
        f"_v_{v}" for v in value_cols
    }
    clash = (set(on) | set(value_cols) | {left_ts, right_ts}) & reserved
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} before joining"
        )

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # lefts sort AFTER rights at equal ts
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_v_{v}") for v in value_cols],
        F.struct(*left_cols).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_v_{v}") for v in value_cols],
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # One carried struct per row, non-null exactly for RIGHT rows: a
    # right row with NULL value columns still advances the match (its
    # NULLs attach), and tolerance is judged against the timestamp of
    # the very row the values came from.
    match_struct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("_mts"),
            *[F.col(f"_v_{v}").alias(v) for v in value_cols],
        ),
    )
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last(match_struct, ignorenulls=True).over(w).alias("_m")
    )
    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("_ts").cast("long") - F.col("_m._mts").cast("long")
            <= F.lit(tolerance_seconds)
        )
        fill = [
            F.when(fresh, F.col(f"_m.{v}")).alias(f"{v}{suffix}")
            for v in value_cols
        ]
    else:
        fill = [F.col(f"_m.{v}").alias(f"{v}{suffix}") for v in value_cols]
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left_cols], *fill
    )
