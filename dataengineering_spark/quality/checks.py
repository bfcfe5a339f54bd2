"""Data-quality checks (SURVEY.md §2.10).

The reference's validations are imperative assertions sprinkled
through operators; here they are DataFrame-native checks returning a
structured result (raise-on-demand), so a pipeline can collect all
violations in one pass instead of dying on the first.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    name: str
    passed: bool
    details: dict = field(default_factory=dict)

    def raise_if_failed(self) -> "CheckResult":
        if not self.passed:
            raise AssertionError(f"check {self.name} failed: {self.details}")
        return self


def validate_counts_match(
    left: DataFrame,
    right: DataFrame,
    group_col=None,
) -> CheckResult:
    """Exact count reconciliation between two sources (reference
    ``validate_bt_bq_counts``, ``airflow/bitquery.py:354-424``).
    With ``group_col``: per-group counts must match group-for-group
    (full outer join catches groups missing on either side)."""
    if group_col is None:
        lc, rc = left.count(), right.count()
        return CheckResult(
            "counts_match", lc == rc, {"left": lc, "right": rc}
        )
    lg = left.groupBy(group_col).agg(F.count(F.lit(1)).alias("l_n"))
    rg = right.groupBy(group_col).agg(F.count(F.lit(1)).alias("r_n"))
    diff = (
        lg.join(rg, on=group_col, how="full")
        .filter(
            F.coalesce(F.col("l_n"), F.lit(-1))
            != F.coalesce(F.col("r_n"), F.lit(-1))
        )
    )
    bad = diff.limit(20).collect()
    return CheckResult(
        "counts_match_by_group",
        not bad,
        {"mismatched_groups": [row.asDict() for row in bad]},
    )


def check_prices(
    prices: DataFrame,
    supported_tokens: DataFrame,
    native_symbol: str,
    symbol_col: str = "symbol",
    price_col: str = "price",
    max_zero_ratio: float = 0.5,
) -> list[CheckResult]:
    """The reference's three pricing rules
    (``coinprice/pricing_checks.py:76-120``):
    (a) the chain's native token must have a positive price;
    (b) fewer than ``max_zero_ratio`` of tokens may be zero-priced;
    (c) every supported token must appear in the price table."""
    agg = prices.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(price_col) <= 0).cast("long")).alias("n_zero"),
        F.max(
            F.when(F.col(symbol_col) == native_symbol, F.col(price_col))
        ).alias("native_price"),
    ).collect()[0]

    native_ok = agg.native_price is not None and agg.native_price > 0
    zero_ratio = (agg.n_zero or 0) / agg.n if agg.n else 0.0
    missing = (
        supported_tokens.select(symbol_col)
        .distinct()
        .join(prices.select(symbol_col).distinct(), on=symbol_col, how="left_anti")
    )
    missing_rows = [r[symbol_col] for r in missing.limit(20).collect()]
    return [
        CheckResult(
            "native_price_positive",
            native_ok,
            {"native_symbol": native_symbol, "price": agg.native_price},
        ),
        CheckResult(
            "zero_price_ratio",
            zero_ratio < max_zero_ratio,
            {"ratio": zero_ratio, "limit": max_zero_ratio},
        ),
        CheckResult(
            "no_missing_tokens",
            not missing_rows,
            {"missing": missing_rows},
        ),
    ]


def require_nonempty(df: DataFrame, context: str = "input") -> DataFrame:
    """Empty-input guard (reference raises on empty GCS prefixes and
    skips empty batches, ``tigergraph/v1/utils.py:219-220``,
    ``tigergraph/v1/streaming_operator.py:75-76``)."""
    if df.isEmpty():
        raise ValueError(f"{context}: empty input")
    return df


def observe_metrics(df: DataFrame, name: str, metrics: dict):
    """Attach named aggregate metrics to a plan via ``df.observe``.

    The metrics are computed ON THE SAME PASS as whatever action
    consumes the frame — the Spark-native replacement for the
    reference's count-then-act double reads (``airflow/bitquery.py``
    count validation issues a second query over the source). At 100 TB
    a second validation scan is the difference between one pass and
    two; observed metrics are accumulator-backed and free.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` AFTER the consuming action completes.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(a) for a, c in metrics.items()])
    return observed, obs
