from dataengineering_spark.functions.scalars import (
    dsum,
    davg,
    conditional_sum,
    scale_by_decimals,
    conditional_reset,
    usd_enrich,
    extract_nanos_timestamp,
)

__all__ = [
    "dsum",
    "davg",
    "conditional_sum",
    "scale_by_decimals",
    "conditional_reset",
    "usd_enrich",
    "extract_nanos_timestamp",
]
