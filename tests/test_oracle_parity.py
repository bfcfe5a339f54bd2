"""Differential tests: every registry query vs its DuckDB oracle at
sf0.01 — the same gate the driver's CORRECTNESS check applies."""

from __future__ import annotations

import pytest

from dataengineering_spark.plans.queries import QUERIES
from tests.conftest import SF_ORACLE, assert_frames_match

SQL_BACKED = [name for name, spec in QUERIES.items() if spec.sql is not None]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_ORACLE)
    rel = duck.sql(spec.sql)
    try:
        assert_frames_match(sdf, rel)
    finally:
        # Operators that pin a partitioning (discrete_pcts, chunking,
        # global rank/cumsum) persist_tracked their layouts; without a
        # release here the suite accumulates one cache per query AND
        # Spark's cache manager starts substituting those
        # InMemoryRelations into later queries' identical subtrees,
        # which breaks the plan-shape guards order-dependently.
        from dataengineering_spark.caching import release_tracked

        release_tracked()


def test_all_queries_have_fn():
    for name, spec in QUERIES.items():
        assert callable(spec.fn), name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    assert set(e.queries()) >= set(e.oracle_sql())
