"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``dataengineering_spark.plans.queries`` — the registry
of (Spark callable, DuckDB oracle SQL) pairs covering SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full
    streaming-batch transform (log_index window → broadcast enrichment
    joins → decimal scaling → conditional-sum aggregation)."""
    from dataengineering_spark.plans.queries import q_enrichment_pipeline

    return q_enrichment_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dataengineering_spark.plans.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    from dataengineering_spark.plans.queries import get_oracle_sql

    return get_oracle_sql()
