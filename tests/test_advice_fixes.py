"""Regression tests for the round-4 ADVICE findings: tracked-cache
release, case-insensitive email redaction, asof reserved-name guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def test_token_budget_shards_cache_is_released(spark):
    from dataengineering_spark.caching import release_tracked, tracked_count
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.chunking import token_budget_shards

    release_tracked()  # start clean regardless of earlier tests
    docs = read_table(spark, "documents", SF_ORACLE)
    before = tracked_count()
    shards = token_budget_shards(docs, "n_chars", "doc_id", budget=50_000)
    assert shards.count() == docs.count()
    assert tracked_count() == before + 1
    assert release_tracked() >= 1
    assert tracked_count() == 0


def test_email_redaction_is_case_insensitive(spark, duck):
    from dataengineering_spark.functions.text import (
        EMAIL_PATTERN,
        redact_contacts,
    )

    samples = [
        ("write John.Doe@Gmail.com today",),
        ("UPPER@EXAMPLE.COM and lower@example.com",),
        ("no contact here",),
    ]
    df = spark.createDataFrame(samples, "t STRING").select(
        redact_contacts(F.col("t")).alias("r")
    )
    ours = [r["r"] for r in df.collect()]
    assert ours[0] == "write <EMAIL> today"
    assert ours[1] == "<EMAIL> and <EMAIL>"
    assert ours[2] == "no contact here"

    # DuckDB (RE2) applies the identical pattern identically
    for (t,), expect in zip(samples, ours):
        got = duck.execute(
            "SELECT regexp_replace(?, ?, '<EMAIL>', 'g')", [t, EMAIL_PATTERN]
        ).fetchone()[0]
        assert got == expect


def test_asof_join_rejects_reserved_column_names(spark):
    from dataengineering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 5)], "k INT, t INT, _mts INT"
    )
    right = spark.createDataFrame(
        [(1, 9, 7)], "k INT, t INT, _mts INT"
    )
    with pytest.raises(ValueError, match="_mts"):
        asof_join(left, right, ["k"], "t", "t", ["_mts"])
    with pytest.raises(ValueError, match="_ts"):
        asof_join(
            left.withColumnRenamed("_mts", "_ts"),
            right.withColumnRenamed("_mts", "v"),
            ["k"],
            "_ts",
            "t",
            ["v"],
        )
