from dataengineering_spark.plans.queries import QUERIES, QuerySpec, get_queries, get_oracle_sql

__all__ = ["QUERIES", "QuerySpec", "get_queries", "get_oracle_sql"]
