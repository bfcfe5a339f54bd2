"""Projection/filter/rename primitives (SURVEY.md §2.2, P1-P6, F6,
F11) — the pandas idioms of the reference as DataFrame transforms.

These are deliberately thin: their value is naming the reference's
vocabulary (subset/drop/rename/mask/fillna/str-cast) so ported
pipelines read the same, while Catalyst gets a fully declarative plan
(column pruning + predicate pushdown reach the scan).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """``df[["a","b"]]`` (reference ``clickhouse/v1/operator.py:478``)."""
    return df.select(*columns)


def drop_columns(df: DataFrame, *columns: str) -> DataFrame:
    """``df.drop(columns=...)`` (reference ``clickhouse/v1/operator.py:485``)."""
    return df.drop(*columns)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """``df.rename(columns={...})`` (reference ``coinprice/utils.py:28-30``)."""
    return df.withColumnsRenamed(dict(mapping))


def mask_filter(df: DataFrame, cond: Column) -> DataFrame:
    """Boolean-mask row filter (reference ``df[df["type"].isin([0,1])]``,
    ``clickhouse/v1/operator.py:483``)."""
    return df.filter(cond)


def fill_nulls(df: DataFrame, value=0, subset: Sequence[str] | None = None) -> DataFrame:
    """``df.fillna(0)`` (reference ``tigergraph/v1/streaming_operator.py:90``)."""
    return df.na.fill(value, subset=list(subset) if subset else None)


def stringify_keys(df: DataFrame, *columns: str) -> DataFrame:
    """Join-key normalization to string (reference ``astype(str)``
    sweeps, ``tigergraph/v1/streaming_operator.py:82-83``,
    ``coinprice/utils.py:13-17``)."""
    return df.withColumns({c: F.col(c).cast("string") for c in columns})


def sort_rows(
    df: DataFrame, by: Sequence[str] | Mapping[str, bool]
) -> DataFrame:
    """``df.sort_values`` with list or {col: ascending} spec
    (reference ``clickhouse/v1/operator.py:458-465``). Note Spark
    DataFrames carry no row order through further transforms — pair
    with log_index (W1) to materialize an ordering."""
    if isinstance(by, Mapping):
        cols = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in by.items()]
    else:
        cols = [F.col(c).asc() for c in by]
    return df.orderBy(*cols)
