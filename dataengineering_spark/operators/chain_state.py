"""Chain-dialect layer (SURVEY.md §2.9 T8-T9, §2.8 F7/F12, §7 step 8).

The reference hand-writes five SQL shapes for "what is the current
high-water block of chain X" (``clickhouse/utils.py:8-69``):

- default: ``max(block)`` + ``max(block_date_time)`` from
  ``{chain}.master`` with a date-pruning predicate;
- btc-family (bitcoin/litecoin/dogecoin/bitcoin_cash):
  ``max(block_number)`` from ``{chain}.txns``;
- ripple: block stored as string → ``max(toUInt64(block))``;
- hedera: consensus timestamp recovered from the transaction id via
  regexp (F7), top-1 by block;
- ethereum: hot table ``ethereum.tld_raw_hot``.

Here each dialect is a row of declarative config — table name, offset
column, optional cast/derivation — and ONE implementation executes
any of them. Adding a chain is a config entry, not a new function.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineering_spark.catalog import Chain
from dataengineering_spark.functions.scalars import extract_nanos_timestamp


@dataclass(frozen=True)
class ChainDialect:
    """One chain's head-probe shape."""

    table: str  # logical table name pattern, {chain} substituted
    offset_col: str
    time_col: str | None = "block_date_time"
    offset_cast: str | None = None  # e.g. "bigint" for ripple's string blocks
    derive_from_txn_id: bool = False  # hedera F7 path


DIALECTS: dict[Chain, ChainDialect] = {
    Chain.BITCOIN: ChainDialect("{chain}.txns", "block_number"),
    Chain.LITECOIN: ChainDialect("{chain}.txns", "block_number"),
    Chain.DOGECOIN: ChainDialect("{chain}.txns", "block_number"),
    Chain.BITCOIN_CASH: ChainDialect("{chain}.txns", "block_number"),
    Chain.RIPPLE: ChainDialect("{chain}.master", "block", offset_cast="bigint"),
    Chain.HEDERA: ChainDialect(
        "{chain}.master", "block", derive_from_txn_id=True
    ),
    Chain.ETHEREUM: ChainDialect("ethereum.tld_raw_hot", "block"),
}
DEFAULT_DIALECT = ChainDialect("{chain}.master", "block")


def dialect_for(chain: Chain) -> ChainDialect:
    return DIALECTS.get(chain, DEFAULT_DIALECT)


def _offset_expr(d: ChainDialect) -> Column:
    c = F.col(d.offset_col)
    return c.cast(d.offset_cast) if d.offset_cast else c


def chain_state(
    df: DataFrame,
    chain: Chain,
    since_date: str | None = None,
) -> DataFrame:
    """Current high-water mark of a chain's table, in that chain's
    dialect. Returns one row: (chain, block, block_date_time).

    ``since_date`` reproduces the reference's manual partition-pruning
    predicate (``WHERE block_date_time >= toDate(...)``,
    ``clickhouse/utils.py:29-31``) — on a date-partitioned lake table
    Spark prunes partitions from the same filter automatically.
    """
    d = dialect_for(chain)
    if since_date and d.time_col and d.time_col in df.columns:
        df = df.filter(F.col(d.time_col) >= F.lit(since_date))

    if d.derive_from_txn_id:
        # hedera: consensus nanos live inside transaction_id (F7);
        # the head block is top-1 by block, its timestamp derived.
        top = df.orderBy(_offset_expr(d).desc()).limit(1)
        return top.select(
            F.lit(chain.value).alias("chain"),
            _offset_expr(d).alias("block"),
            extract_nanos_timestamp("transaction_id").alias("consensus_ts"),
        )

    aggs = [F.max(_offset_expr(d)).alias("block")]
    if d.time_col and d.time_col in df.columns:
        # two independent maxes over one snapshot — the reference
        # deliberately splits these queries because max(block) and
        # max(block_date_time) can disagree (airflow/bitquery.py:121-122);
        # one DataFrame with two aggregates preserves that semantics
        # while reading the data once.
        aggs.append(F.max(F.col(d.time_col)).alias("block_date_time"))
    return df.agg(*aggs).select(F.lit(chain.value).alias("chain"), "*")


def head_table_name(chain: Chain) -> str:
    """Resolve the dialect's table pattern for catalog lookup."""
    return dialect_for(chain).table.format(chain=chain.value)
