"""Exact integer allocation (largest-remainder / Hamilton method).

Splitting a group total across its members proportionally to a weight
is everywhere in financial data engineering (invoice line splits,
revenue recognition, cost allocation), and the float version is
always wrong: rounded shares don't sum back to the total. The
largest-remainder method does it exactly in integer arithmetic:

    base_i = ⌊T·w_i / W⌋        (W = Σ w_i per group)
    R      = T − Σ base_i       (0 ≤ R < group size leftover units)
    alloc_i = base_i + 1 for the R largest remainders (T·w_i mod W),
              ties broken by the caller's ``tie`` column ascending.

Invariants (fuzz-checked in tests/test_differential_fuzz.py):
Σ alloc = T per group, and every alloc is within 1 unit of the exact
proportional share — the defining properties of the method.

Plan shape: every window partitions by the group key, so the whole
operator is ONE keyed shuffle; group sizes are the natural fan-in
(lineitems per order ≤ 7 at any TPC-H scale), so no skew guard is
needed. All arithmetic is int64: callers quantize (e.g. cents) before
calling.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder(
    df: DataFrame,
    group: str,
    weight: str,
    total: str,
    tie: str,
    out: str = "alloc",
) -> DataFrame:
    """Add ``out``: the largest-remainder allocation of ``total``
    (constant per group, integer units) proportional to ``weight``
    (positive integer units), deterministic via ``tie``."""
    per_group = Window.partitionBy(group)
    # weight joins the tie chain: rows duplicated on `tie` with equal
    # remainders but different weights would otherwise take the +1 unit
    # in engine-dependent order (remainders of different weights CAN
    # collide mod W); with it, remaining ties are fully-identical rows,
    # which are interchangeable
    by_rem = Window.partitionBy(group).orderBy(
        F.col("_rem").desc(), F.col(tie), F.col(weight)
    )
    b = (
        df.withColumn("_tot_w", F.sum(weight).over(per_group))
        .withColumn("_base", F.expr(f"(`{total}` * `{weight}`) DIV _tot_w"))
        .withColumn("_rem", (F.col(total) * F.col(weight)) % F.col("_tot_w"))
    )
    r = b.withColumn("_base_sum", F.sum("_base").over(per_group)).withColumn(
        "_rk", F.row_number().over(by_rem)
    )
    return r.withColumn(
        out,
        F.col("_base")
        + F.when(
            F.col("_rk") <= F.col(total) - F.col("_base_sum"), F.lit(1)
        ).otherwise(F.lit(0)),
    ).drop("_tot_w", "_base", "_rem", "_base_sum", "_rk")


def fifo_match(
    df: DataFrame,
    group: str,
    qty: str,
    order: Sequence[str],
    receipt_flag: str,
) -> DataFrame:
    """Set-at-a-time FIFO matching: issues consume receipts in order.

    Each receipt/issue owns the half-open interval [cum − qty, cum) of
    its group's running total (cumulative sum over ``order`` within
    its own side), and a receipt funds an issue iff the intervals
    overlap; the matched quantity is min(ends) − max(starts). This is
    provably the same pairing the imperative queue walk produces
    (fuzz-checked against a Python simulation in
    tests/test_differential_fuzz.py) but runs as ONE equi-join on the
    group key plus interval predicates — per-group streams pair inside
    their hash partition, nothing iterates.

    Returns one row per (receipt, issue) funding pair: the group key,
    both sides' ``order`` columns prefixed ``r_``/``i_``, and
    ``qty_matched`` (always positive). ``order`` must be a
    deterministic total order per (group, side) — append a tiebreak
    column if the natural key can duplicate.
    """
    cum = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    def side(flagged: DataFrame, prefix: str) -> DataFrame:
        return flagged.withColumn("_cend", F.sum(qty).over(cum)).select(
            F.col(group).alias(f"{prefix}_g"),
            *[F.col(c).alias(f"{prefix}_{c}") for c in order],
            (F.col("_cend") - F.col(qty)).alias(f"{prefix}_start"),
            F.col("_cend").alias(f"{prefix}_end"),
        )

    r = side(df.filter(F.col(receipt_flag)), "r")
    i = side(df.filter(~F.col(receipt_flag)), "i")
    j = r.join(
        i,
        (F.col("r_g") == F.col("i_g"))
        & (F.col("r_start") < F.col("i_end"))
        & (F.col("i_start") < F.col("r_end")),
    )
    return j.select(
        F.col("r_g").alias(group),
        *[F.col(f"r_{c}") for c in order],
        *[F.col(f"i_{c}") for c in order],
        (
            F.least("r_end", "i_end") - F.greatest("r_start", "i_start")
        ).alias("qty_matched"),
    )
