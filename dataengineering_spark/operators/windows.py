"""Window operators (SURVEY.md §2.5).

The reference derives ``log_index`` by globally sorting the batch in
pandas and ranking within each transaction (reference
``clickhouse/v1/operator.py:455-470``); that is driver-local and
single-threaded. Here it is a ``row_number`` window: the shuffle is
hash-partitioned by the partition key only, each partition sorts
locally, and nothing ever concentrates on one machine — the same
plan works at 100 TB as at 6k rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(sort_columns: Sequence[str] | Mapping[str, bool]) -> list[Column]:
    """Accept the reference's two sort specs: a plain list (all
    ascending) or an {column: ascending} mapping
    (``clickhouse/v1/operator.py:458-465``)."""
    if isinstance(sort_columns, Mapping):
        return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_columns.items()]
    return [F.col(c).asc() for c in sort_columns]


def log_index(
    df: DataFrame,
    partition_by: str = "transaction_id",
    sort_columns: Sequence[str] | Mapping[str, bool] = (),
    output_col: str = "log_index",
) -> DataFrame:
    """1-based ordinal per ``partition_by`` group after a total order.

    Equivalent to the reference's sort + ``groupby(key).rank(
    method="first").astype(int)`` (``clickhouse/v1/operator.py:
    455-470``). pandas rank(method="first") depends on the pre-sort
    order including ties, so callers must pass a tie-breaking total
    order in ``sort_columns`` for deterministic output — the same
    caveat the reference silently has.
    """
    order = _order_cols(sort_columns) or [F.monotonically_increasing_id().asc()]
    w = Window.partitionBy(partition_by).orderBy(*order)
    return df.withColumn(output_col, F.row_number().over(w))


def top1_by_order(
    df: DataFrame,
    order_by: Sequence[Column],
) -> DataFrame:
    """``ORDER BY ... LIMIT 1`` (reference ``clickhouse/utils.py:
    57-60``, the Hedera head-block probe). Implemented as a global
    sort + limit; Spark turns this into a TakeOrdered (per-partition
    top-1 + driver merge of one row per partition), not a full sort."""
    return df.orderBy(*order_by).limit(1)
