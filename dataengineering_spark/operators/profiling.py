"""Data-profiling operators: single-pass multi-column statistics and
mergeable equi-width histograms — the "know your 100 TB before you
train on it" layer.

Scale shape:

- ``profile_columns`` computes every column's statistics in ONE scan
  (a single global aggregate row, partial-combined map-side) and then
  unpivots the 1-row result into (column, stat...) rows driver-free —
  profiling N columns never costs N scans.
- ``histogram_by`` buckets rows with a pure closed-form expression
  (no sort, no window); counts are map-side combined and the shuffle
  is ≤ nbins rows per task.  Histogram STATE is trivially mergeable —
  per-shard histograms sum bin-wise into exactly the whole-table
  histogram — which is what incremental/streaming profiling relies
  on; ``merge_histograms`` is that sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineering_spark.functions.scalars import _dec_to_double


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_val)
    — one output row per profiled numeric column, computed in a single
    scan.  ``sum_val`` routes through DECIMAL(18,6) so the double is
    reproducible across engines and row orders."""
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nn"),
            F.countDistinct(col).alias(f"{c}__nd"),
            F.min(col).cast("double").alias(f"{c}__mn"),
            F.max(col).cast("double").alias(f"{c}__mx"),
            _dec_to_double(F.sum(col.cast("decimal(18,6)"))).alias(
                f"{c}__sm"
            ),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx, {c}__sm"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_val)"
        )
    )


def histogram_by(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram STATE over ``[lo, hi)``: (group...,
    bin_idx, n).  Out-of-range values clamp into the edge bins (the
    usual profiling convention: the histogram covers everything);
    NULLs are dropped.  ``bin_idx`` is closed-form —
    ``floor((x - lo) * nbins / (hi - lo))`` clamped — so the same
    expression reproduces in any engine."""
    x = F.col(col)
    raw = F.floor((x - F.lit(lo)) * nbins / (F.lit(hi) - F.lit(lo)))
    bin_idx = F.least(
        F.lit(nbins - 1), F.greatest(F.lit(0), raw.cast("long"))
    ).alias("bin_idx")
    keys = [*(group_cols or []), "bin_idx"]
    return (
        df.filter(x.isNotNull())
        .select(*(group_cols or []), bin_idx)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histograms(
    hists: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Bin-wise sum of histogram states (drops any shard columns not
    listed in ``group_cols``): per-shard histograms merge LOSSLESSLY
    into the whole-data histogram — counts just add."""
    keys = [*(group_cols or []), "bin_idx"]
    return hists.groupBy(*keys).agg(F.sum("n").alias("n"))
