"""IO matrix (SURVEY.md §2.1, S1-S17).

The reference moves data as files over HTTP with curl — CSVWithNames /
Parquet / JSONEachRow formats (``clickhouse/connector.py:101-170``,
``clickhouse/v1/bash_hook.py:190-305``), loops over GCS prefixes one
blob at a time (``clickhouse/v1/operator.py:279-351``), batches
inserts 50k lines per POST (``clickhouse/v1/requests.py:24-118``),
and flushes partitions with DELETE-then-reload
(``airflow/bigquery/utils.py:114-128``).

Spark replaces all of that: a glob scan is the multi-file loop, task
partitioning is the insert batching, and dynamic partition overwrite
is the idempotent flush. These wrappers pin the semantics (format
names, header behavior, explicit schemas) so pipelines written
against the reference's vocabulary keep working.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Reference format vocabulary → Spark data source + options
# (``clickhouse/connector.py:113-117``: Parquet / JSONEachRow /
# CSVWithNames).
FORMATS: dict[str, tuple[str, dict[str, str]]] = {
    "parquet": ("parquet", {}),
    "Parquet": ("parquet", {}),
    "JSONEachRow": ("json", {}),
    "json": ("json", {}),
    "CSVWithNames": ("csv", {"header": "true"}),
    "csv": ("csv", {"header": "true"}),
    # ClickHouse FORMAT-clause spellings (fed by functions/dialect.py)
    "JSON": ("json", {}),
    "JSONCompact": ("json", {}),
    "JSONCompactStrings": ("json", {}),
    "TSVWithNames": ("csv", {"header": "true", "sep": "\t"}),
    "TSV": ("csv", {"header": "false", "sep": "\t"}),
}


def read_any(
    spark: SparkSession,
    path: str | list[str],
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options: str,
) -> DataFrame:
    """Read path(s) — a single file, a directory, or a glob. The glob
    form subsumes the reference's per-blob GCS folder loop (S12): one
    scan, parallel across files, with partition pruning intact.

    Explicit ``schema`` recommended in production paths (inference
    costs a listing + sample pass and can flip types between runs —
    the reference's pd.read_csv inference bug class)."""
    source, base_opts = FORMATS[fmt]
    reader = spark.read.options(**{**base_opts, **options})
    if schema is not None:
        reader = reader.schema(schema)
    else:
        if source == "csv":
            reader = reader.option("inferSchema", "true")
    paths = path if isinstance(path, list) else [path]
    return reader.format(source).load(paths)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Iterable[str] | None = None,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    """Write in any reference format. ``max_records_per_file``
    preserves the reference's insert-batch-size knob (50k lines/POST,
    ``clickhouse/v1/requests.py:29``) as a file-sizing control rather
    than a manual loop."""
    source, base_opts = FORMATS[fmt]
    writer = df.write.mode(mode).options(**{**base_opts, **options})
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(source).save(path)


def fan_out(df: DataFrame, sinks: dict[str, dict]) -> None:
    """Multi-sink fan-out: one computed batch written to N tables
    (the reference's insert_tables loop,
    ``clickhouse/v1/operator.py:490-498``). The input is persisted
    once so the upstream plan — often a full enrichment pipeline —
    executes once, not once per sink."""
    from pyspark import StorageLevel

    df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for path, conf in sinks.items():
            write_any(df, path, **conf)
    finally:
        df.unpersist()


def flush_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """Idempotent partition reload: replaces exactly the partitions
    present in ``df``, leaving others untouched — the reference's
    ``DELETE FROM tbl WHERE {partition_filter}`` + reload
    (``airflow/bigquery/utils.py:114-128``) as one atomic dynamic
    partition overwrite."""
    source, base_opts = FORMATS[fmt]
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .options(**base_opts)
        .partitionBy(*partition_by)
        .format(source)
        .save(path)
    )


def run_sql_file(
    spark: SparkSession,
    path: str,
    params: dict | None = None,
    dialect: str = "spark",
) -> list[DataFrame]:
    """Execute a file of ``;``-separated SQL statements (the
    reference's multi-statement runner,
    ``clickhouse/v1/bash_hook.py:307-355`` and
    ``airflow/bigquery/utils.py:86-111``), with named parameters
    instead of string templating (F9). Returns one DataFrame per
    statement. ``dialect="clickhouse"`` routes each statement through
    the ClickHouse→Spark shim (``functions/dialect.py``) so a
    reference user's SQL files run unchanged."""
    with open(path) as f:
        text = f.read()
    results = []
    for stmt in text.split(";"):
        stmt = stmt.strip()
        if not stmt:
            continue
        if dialect == "clickhouse":
            from dataengineering_spark.functions.dialect import (
                translate_clickhouse_sql,
            )

            stmt = translate_clickhouse_sql(stmt).sql
        results.append(spark.sql(stmt, args=params or {}))
    return results
