"""dataengineering_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
library ``merklescience/dataengineering`` (an Airflow + pandas +
ClickHouse-over-HTTP ETL toolkit) on top of idiomatic PySpark:
DataFrame/SQL transforms optimized by Catalyst, Structured-Streaming
style incremental sync, and large-scale LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Nothing in here is a port: the reference delegates execution to
external databases and driver-local pandas; this engine expresses the
same semantics as distributed Spark plans.
"""

from dataengineering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
