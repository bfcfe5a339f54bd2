"""Scalar/aggregate expression helpers (SURVEY.md §2.8, §2.4).

Everything here is a thin builder over ``pyspark.sql.functions`` so
expressions stay JVM-side inside whole-stage codegen — no Python UDFs.

Oracle-exactness note: sums of DoubleType are order-dependent, and a
distributed partial aggregate will not bit-match a single-threaded
oracle. Every "money" sum therefore routes through DecimalType
(associative, exact) and casts the final result back to double —
deterministic on both engines regardless of partitioning. The SQL
half of the contract is ``dsum_sql`` in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal(18,6) per-row (capacity 1e12); Spark widens the sum buffer
# by 10 digits to decimal(28,6) (capacity 1e22 ≫ any 100 TB sum).
# An earlier decimal(13,6) was ~12% faster per aggregate but ANSI
# mode hard-fails the cast at 1e7 (caught by the differential-fuzz
# battery) and its 1e17 sum-buffer capacity is marginal against a
# genuine 1e12-row money sum — robustness wins. 18 also mirrors the
# oracle's DECIMAL(18,6) exactly; rounding at 6 decimals is identical
# either way, so every oracle hash is unchanged.
DECIMAL_T = "decimal(18,6)"


def _dec_to_double(dec: Column) -> Column:
    """DECIMAL → DOUBLE through an exact decimal STRING.

    Java's BigDecimal.doubleValue() computes (double)unscaled / 10^scale
    when the unscaled value fits a long — TWO roundings, up to 1 ulp off
    the correctly-rounded result once |sum| * 10^scale exceeds 2^53
    (~9e9 at scale 6). Found by the sf1 headroom parity sweep:
    pricing_summary's sum_charge diverged from DuckDB (whose direct cast
    is correctly rounded) only past that magnitude. Double.parseDouble
    of the exact decimal text IS correctly rounded, so this path is
    engine-exact at any scale."""
    return dec.cast("string").cast("double")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, oracle-exact sum of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    out = _dec_to_double(F.sum(c.cast(DECIMAL_T)))
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Oracle-exact average: exact decimal sum divided by count, in
    double — identical on any engine because both operands are
    deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    out = _dec_to_double(F.sum(c.cast(DECIMAL_T))) / F.count(c)
    return out.alias(alias) if alias else out


def conditional_sum(value: Column | str, cond: Column, alias: str | None = None) -> Column:
    """``sum(value WHERE cond)`` with the reference's pandas semantics:
    an empty slice sums to 0, not null (reference
    ``tigergraph/v1/streaming_operator.py:310-324`` — pandas
    ``.sum()`` on an empty selection yields 0.0, while Spark's
    ``sum(when(...))`` yields null; ``coalesce`` reconciles them)."""
    v = F.col(value) if isinstance(value, str) else value
    out = F.coalesce(
        _dec_to_double(F.sum(F.when(cond, v.cast(DECIMAL_T)))), F.lit(0.0)
    )
    return out.alias(alias) if alias else out


def scale_by_decimals(value: Column | str, decimals: Column | str) -> Column:
    """Token-value scaling ``value / 10**decimals`` (reference
    ``clickhouse/v1/operator.py:484``). Stays in double like the
    reference; callers needing exactness cast to decimal first."""
    v = F.col(value) if isinstance(value, str) else value
    d = F.col(decimals) if isinstance(decimals, str) else decimals
    return v / F.pow(F.lit(10.0), d)


def conditional_reset(col: Column | str, cond: Column, reset_to=0) -> Column:
    """``df.loc[cond, col] = reset_to`` (reference
    ``clickhouse/v1/operator.py:483,486-487``): keep the column value
    except where the condition holds."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(cond, F.lit(reset_to)).otherwise(c)


def usd_enrich(value: Column | str, price: Column | str) -> Column:
    """USD enrichment ``value * price`` (reference
    ``tigergraph/v1/streaming_operator.py:94-95``)."""
    v = F.col(value) if isinstance(value, str) else value
    p = F.col(price) if isinstance(price, str) else price
    return v * p


def extract_nanos_timestamp(txn_id: Column | str, as_decimal: bool = True) -> Column:
    """Hedera nanosecond-timestamp recovery from a transaction id like
    ``0.0.887615-1651341539-309799857`` → ``1651341539.309799857``
    (reference ``clickhouse/utils.py:57-59``: strip the ``x.y.z-``
    account prefix, then turn the remaining ``-`` into a ``.``).

    ``as_decimal=False`` returns the canonical ``secs.nanos`` STRING
    instead of DECIMAL(20,9) — width-20 decimals exceed int64-backed
    decimal ranges in some engines, so cross-engine comparators should
    use the string (or split-BIGINT) form."""
    c = F.col(txn_id) if isinstance(txn_id, str) else txn_id
    stripped = F.regexp_replace(c, r"^\d+\.\d+\.\d+-", "")
    s = F.regexp_replace(stripped, "-", ".")
    return s.cast("decimal(20,9)") if as_decimal else s


def extract_nanos_timestamp_parts(txn_id: Column | str) -> tuple[Column, Column]:
    """Split form of :func:`extract_nanos_timestamp`: (seconds BIGINT,
    nanos BIGINT). Exact on any engine — no wide decimal involved."""
    c = F.col(txn_id) if isinstance(txn_id, str) else txn_id
    stripped = F.regexp_replace(c, r"^\d+\.\d+\.\d+-", "")
    parts = F.split(stripped, "-")
    return parts.getItem(0).cast("long"), parts.getItem(1).cast("long")
