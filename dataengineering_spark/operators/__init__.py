from dataengineering_spark.operators.windows import log_index, top1_by_order
from dataengineering_spark.operators.joins import (
    enrich_with_prices,
    enrich_transfers,
    attach_constant_price,
)
from dataengineering_spark.operators.aggregates import (
    transactions_agg,
    link_inputs_agg,
    link_outputs_agg,
    chain_state_summary,
)

__all__ = [
    "log_index",
    "top1_by_order",
    "enrich_with_prices",
    "enrich_transfers",
    "attach_constant_price",
    "transactions_agg",
    "link_inputs_agg",
    "link_outputs_agg",
    "chain_state_summary",
]
