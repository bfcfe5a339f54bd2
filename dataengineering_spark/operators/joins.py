"""Enrichment joins (SURVEY.md §2.3).

Every join in the reference is an equi-join of a large fact batch
against a small dimension (token metadata, prices) done in pandas on
the driver (``clickhouse/v1/operator.py:475-481``). Here the fact
side stays distributed and every dimension is explicitly broadcast,
so the join is a map-side broadcast-hash-join with zero shuffle of
the fact table — the only plan shape that survives a 100 TB fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_prices(
    metadata: DataFrame,
    prices: DataFrame,
    on: str = "symbol",
) -> DataFrame:
    """Token metadata ⋈ latest prices, left outer (reference
    ``clickhouse/v1/operator.py:475``): metadata rows without a price
    survive with null price (later fillna(0))."""
    return metadata.join(F.broadcast(prices), on=on, how="left")


def enrich_transfers(
    transfers: DataFrame,
    enriched_metadata: DataFrame,
    on: str = "token_address",
) -> DataFrame:
    """Transfers ⋈ enriched metadata, inner (reference
    ``clickhouse/v1/operator.py:476-481``). The inner join doubles as
    a semi-join filter: transfers of unsupported tokens are dropped.
    Join keys are normalized to string on both sides, mirroring the
    reference's ``astype(str)`` casts
    (``tigergraph/v1/streaming_operator.py:82-83``)."""
    left = transfers.withColumn(on, F.col(on).cast("string"))
    right = enriched_metadata.withColumn(on, F.col(on).cast("string"))
    return left.join(F.broadcast(right), on=on, how="inner")


def attach_constant_price(df: DataFrame, price_row: DataFrame) -> DataFrame:
    """The Ripple degenerate join: both sides carry a constant key so
    the merge attaches one price row to every transfer (reference
    ``clickhouse/v1/operator.py:588-595``).

    Implementation: the single row is collected and attached as
    literal columns. A broadcast cross join is semantically identical
    but runs as BroadcastNestedLoopJoin, which disables whole-stage
    codegen for the stage (~9x slower measured); literals keep the
    whole pipeline in one codegen span and ship nothing to executors.
    (The reference itself fetches this price to the driver via REST —
    S25 — so the collect introduces no new driver dependency.)"""
    rows = price_row.limit(2).collect()
    if len(rows) != 1:
        raise ValueError(
            f"attach_constant_price expects exactly 1 price row, got {len(rows)}"
        )
    out = df
    for name in price_row.columns:
        out = out.withColumn(name, F.lit(rows[0][name]))
    return out
