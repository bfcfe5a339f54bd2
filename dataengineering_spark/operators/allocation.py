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
    by_rem = Window.partitionBy(group).orderBy(F.col("_rem").desc(), F.col(tie))
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
