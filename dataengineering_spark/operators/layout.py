"""Data-layout clustering: Z-order (Morton) keys for multi-dimensional
data skipping.

A 100 TB table sorted on one column prunes scans on that column only;
interleaving the bits of two (or more) key columns into one Morton key
and range-writing on it gives every interleaved dimension partial
locality, so min/max row-group statistics prune selective predicates
on ANY of them (the technique behind Delta/Iceberg OPTIMIZE ZORDER —
implemented here as plain integer expressions, no table format
required).

The bit math is arithmetic-only (floor-division and modulo on BIGINT —
exact in both Spark and DuckDB, and inside whole-stage codegen), so an
oracle can replay the key bit-for-bit; no engine bit-twiddling
intrinsics are assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key_sql(cols: Sequence[str], bits: int = 16) -> str:
    """Dialect-neutral SQL computing the Morton interleave of the low
    ``bits`` bits of each (non-negative integer) column expression in
    ``cols``. Column j contributes its bit i at output position
    ``i * len(cols) + j`` — the standard round-robin interleave.

    Arithmetic only: bit i of x is ``floor(x / 2^i) % 2``; the term is
    then scaled by ``2^(out_pos)``. With the default 16 bits × ≤3
    columns every term and the sum stay well inside BIGINT.
    """
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            out_pos = i * n + j
            terms.append(
                f"(CAST(floor(({c}) / {2 ** i}) AS BIGINT) % 2) * {2 ** out_pos}"
            )
    return "(" + " + ".join(terms) + ")"


def morton_key(cols: Sequence[str], bits: int = 16) -> Column:
    """:func:`morton_key_sql` as a Column (one parsed expression —
    wide but flat integer math, fully codegen'd)."""
    return F.expr(morton_key_sql(cols, bits))


def cluster_by_morton(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Return ``df`` re-laid-out for write: range-partitioned and
    partition-sorted on the Morton key of ``cols``.

    ``repartitionByRange`` samples key quantiles, so output files tile
    the Z-curve evenly even when the key distribution is skewed; the
    within-partition sort makes parquet row-group min/max stats tight
    on the key AND correlated-tight on every interleaved column. The
    caller writes the result; this function does not sink.

    Note RangePartitioner's bound sampling runs per job — if the
    caller both writes and inspects the frame, persist it first
    (`caching.persist_tracked`), the same two-job hazard documented at
    `operators/chunking.py`.
    """
    keyed = df.withColumn(key_col, morton_key([str(c) for c in cols], bits))
    parted = (
        keyed.repartitionByRange(n_files, key_col)
        if n_files is not None
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col)
