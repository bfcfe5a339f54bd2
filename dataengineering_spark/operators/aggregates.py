"""Grouped aggregations (SURVEY.md §2.4, A1-A4).

The reference implements these as pandas ``groupby().apply`` with
hand-written aggregator functions (reference
``tigergraph/v1/streaming_operator.py:310-348``,
``tigergraph/v1/utils.py:131-169``) — a grouped-map UDF shape. None
of them actually need per-group Python: every one is a conditional
sum / max, which Spark executes as a partial (map-side) + final hash
aggregate with whole-stage codegen. At scale that means one shuffle
of pre-combined partials instead of shipping raw rows.

Column-name contract: transfers frames carry
``transaction_id, sender_address, receiver_address, type,
coin_value, coin_value_usd, fee, fee_usd, block_date_time``
(FIXTURES.md §1; types 0=external, 1=internal, 2=token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineering_spark.functions.scalars import conditional_sum


def transactions_agg(df: DataFrame) -> DataFrame:
    """Per-transaction vertex payload (reference
    ``tigergraph/v1/streaming_operator.py:310-324``): conditional
    value sums by transfer type, fee totals, last event time."""
    t = F.col("type")
    return df.groupBy("transaction_id").agg(
        conditional_sum("coin_value", t == 0, "external_value"),
        conditional_sum("coin_value_usd", t == 0, "external_value_usd"),
        conditional_sum("coin_value", t == 1, "internal_value"),
        conditional_sum("coin_value_usd", t == 1, "internal_value_usd"),
        conditional_sum("coin_value_usd", t == 2, "token_value_usd"),
        conditional_sum("fee", t.isNotNull(), "fee"),
        conditional_sum("fee_usd", t.isNotNull(), "fee_usd"),
        F.max("block_date_time").alias("block_date_time"),
    )


def link_inputs_agg(df: DataFrame) -> DataFrame:
    """Per (transaction, sender) edge payload (reference
    ``tigergraph/v1/streaming_operator.py:327-337``): native transfer
    types only, value+fee leaves the sender."""
    native = F.col("type").isin(0, 1)
    return df.groupBy("transaction_id", "sender_address").agg(
        conditional_sum(F.col("coin_value") + F.col("fee"), native, "value"),
        conditional_sum(F.col("coin_value_usd") + F.col("fee_usd"), native, "value_usd"),
    )


def link_outputs_agg(df: DataFrame) -> DataFrame:
    """Per (transaction, receiver) edge payload (reference
    ``tigergraph/v1/streaming_operator.py:340-348``): value arrives
    without the fee."""
    native = F.col("type").isin(0, 1)
    return df.groupBy("transaction_id", "receiver_address").agg(
        conditional_sum("coin_value", native, "value"),
        conditional_sum("coin_value_usd", native, "value_usd"),
    )


def chain_state_summary(df: DataFrame, chain_col: str = "chain") -> DataFrame:
    """Chain-state pivot (reference
    ``tigergraph/v1/streaming_operator.py:151-162``): pandas
    ``pivot_table(index=chain, aggfunc=max)`` degenerates to a
    groupBy-max because the index is the only grouping level."""
    value_cols = [c for c in df.columns if c != chain_col]
    return df.groupBy(chain_col).agg(*[F.max(c).alias(c) for c in value_cols])
