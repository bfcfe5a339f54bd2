"""IO matrix tests (S1-S17): format round-trips, globs, fan-out,
partition flush, SQL-file runner."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.sources.io import (
    fan_out,
    flush_partitions,
    read_any,
    run_sql_file,
    write_any,
)
from tests.conftest import SF_SMOKE


def test_format_round_trips(spark, tmp_path):
    src = read_table(spark, "nation", SF_SMOKE)
    for fmt in ("parquet", "CSVWithNames", "JSONEachRow"):
        path = str(tmp_path / fmt)
        write_any(src, path, fmt=fmt)
        back = read_any(spark, path, fmt=fmt, schema=src.schema)
        assert back.count() == src.count()
        assert sorted(back.columns) == sorted(src.columns)


def test_glob_read_replaces_folder_loop(spark, tmp_path):
    """S12: one glob scan instead of the reference's per-blob loop."""
    src = read_table(spark, "region", SF_SMOKE)
    write_any(src, str(tmp_path / "a"))
    write_any(src, str(tmp_path / "b"))
    both = read_any(spark, str(tmp_path / "*"), schema=src.schema)
    assert both.count() == 2 * src.count()


def test_fan_out_multi_sink(spark, tmp_path):
    src = read_table(spark, "supplier", SF_SMOKE)
    sinks = {
        str(tmp_path / "s1"): {"fmt": "parquet"},
        str(tmp_path / "s2"): {"fmt": "CSVWithNames"},
    }
    fan_out(src, sinks)
    assert read_any(spark, str(tmp_path / "s1")).count() == src.count()
    assert (
        read_any(spark, str(tmp_path / "s2"), fmt="csv", schema=src.schema).count()
        == src.count()
    )


def test_flush_partitions_is_idempotent_partial_reload(spark, tmp_path):
    """S17: re-loading one partition must not clobber the others."""
    ev = read_table(spark, "events", SF_SMOKE).withColumn(
        "etype", F.col("event_type")
    )
    path = str(tmp_path / "part")
    flush_partitions(ev, path, ["etype"])
    total = read_any(spark, path).count()
    assert total == ev.count()

    one = ev.filter(F.col("etype") == "click")
    n_click = one.count()
    # reload just the click partition, doubled rows would indicate append
    flush_partitions(one, path, ["etype"])
    after = read_any(spark, path)
    assert after.count() == total
    assert after.filter(F.col("etype") == "click").count() == n_click


def test_run_sql_file_multi_statement(spark, tmp_path):
    read_table(spark, "nation", SF_SMOKE).createOrReplaceTempView("nation_v")
    sql_path = tmp_path / "multi.sql"
    sql_path.write_text(
        "SELECT COUNT(*) AS n FROM nation_v;\n"
        "SELECT MAX(n_nationkey) AS mx FROM nation_v;"
    )
    results = run_sql_file(spark, str(sql_path))
    assert len(results) == 2
    assert results[0].collect()[0].n == 25
    assert results[1].collect()[0].mx == 24


def test_run_sql_file_with_params(spark, tmp_path):
    """F9: parameterized SQL replaces the reference's jinja/[[ ]]
    string templating."""
    read_table(spark, "nation", SF_SMOKE).createOrReplaceTempView("nation_v")
    sql_path = tmp_path / "param.sql"
    sql_path.write_text("SELECT COUNT(*) AS n FROM nation_v WHERE n_regionkey = :rk")
    (res,) = run_sql_file(spark, str(sql_path), params={"rk": 0})
    assert res.collect()[0].n == 5


def test_max_records_per_file(spark, tmp_path):
    """The reference's 50k-line insert batching as a file-size knob."""
    src = read_table(spark, "customer", SF_SMOKE).coalesce(1)
    path = str(tmp_path / "batched")
    write_any(src, path, max_records_per_file=50)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= src.count() // 50


def test_merge_schema_reads_evolved_parquet(spark, tmp_path):
    """Schema evolution: files written before/after a column was added
    read as one frame under mergeSchema, old rows null-filled."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "v1"]).write.parquet(p + "/gen=1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v1", "v2"]).write.parquet(
        p + "/gen=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r.id: (r.v1, r.v2) for r in df.select("id", "v1", "v2").collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_corrupt_json_records_are_quarantined(spark, tmp_path):
    """PERMISSIVE ingestion: malformed lines land in the corrupt-record
    column instead of failing the batch — the dead-letter split a
    100 TB ingest needs (one bad blob must not kill the job)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    path = tmp_path / "raw.json"
    path.write_text('{"id": 1, "v": "ok"}\n{BROKEN\n{"id": 3, "v": "fine"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(path))
        .cache()  # Spark requires materialization before corrupt-column-only predicates
    )
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert sorted(r.id for r in good.collect()) == [1, 3]
        assert bad.count() == 1 and "{BROKEN" in bad.collect()[0]._corrupt_record
    finally:
        df.unpersist()
