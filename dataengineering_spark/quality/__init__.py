from dataengineering_spark.quality.checks import (
    CheckResult,
    validate_counts_match,
    check_prices,
    require_nonempty,
)

__all__ = [
    "CheckResult",
    "validate_counts_match",
    "check_prices",
    "require_nonempty",
]
