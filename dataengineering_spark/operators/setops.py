"""Set operations (SURVEY.md §2.7) and dedup maintenance (A8).

UNION ALL in the reference is string concatenation of .sql files
(``airflow/bigquery/utils.py:56-83``); set difference is pandas
``set()`` math (``coinprice/pricing_checks.py:118-120``); dedup is
``OPTIMIZE TABLE ... FINAL DEDUPLICATE`` pushed to ClickHouse
(``clickhouse/v1/utils.py:173-193``). All three are native DataFrame
ops here.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """N-way UNION ALL by column name (reference concatenates query
    text with ``"\\n UNION ALL \\n"``, ``airflow/bigquery/utils.py:79``).
    ``unionByName`` is position-independent, so reordered projections
    in the inputs cannot silently mis-zip columns."""
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def missing_keys(expected: DataFrame, present: DataFrame, on: str) -> DataFrame:
    """Keys in ``expected`` absent from ``present`` (reference's
    ``tokens - token_prices`` validation set-difference,
    ``coinprice/pricing_checks.py:118-120``). Left-anti join: Spark
    broadcasts the right side when small, no full shuffle."""
    return expected.select(on).distinct().join(
        present.select(on).distinct(), on=on, how="left_anti"
    )


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup (reference delegates to ClickHouse ``OPTIMIZE ...
    DEDUPLICATE``, ``clickhouse/v1/utils.py:173-193``). Full-row
    dedup is ``distinct``; subset dedup is ``dropDuplicates`` — note
    the survivor row for subset-dedup is partition-order dependent,
    same nondeterminism the reference's storage engine has."""
    return df.distinct() if subset is None else df.dropDuplicates(subset)
