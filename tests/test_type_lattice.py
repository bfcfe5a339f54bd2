"""Regression tests for the type-family lattice in assert_frames_match.

Round-5 postmortem: the driver's value hash is dtype-sensitive, so a DuckDB
HUGEINT (SUM over BIGINT) materializing as float64 hash-mismatched a Spark
bigint column even though every cell value was equal (bin_packing_merged).
The in-repo gate compares Python values, which are blind to that.  These
tests pin the lattice so the class cannot slip again.
"""

from __future__ import annotations

import pytest

from tests.conftest import (
    _duck_type_family,
    _spark_type_family,
    assert_frames_match,
)


def test_hugeint_vs_bigint_fails(spark, duck):
    """DuckDB SUM(BIGINT) -> HUGEINT must be flagged against Spark bigint
    even though the fetched Python values are equal ints."""
    sdf = spark.createDataFrame([(1, 10)], "k int, total bigint")
    rel = duck.sql("SELECT 1 AS k, SUM(v) AS total FROM (VALUES (10)) t(v)")
    assert str(rel.types[1]).upper() == "HUGEINT", "oracle shape drifted"
    with pytest.raises(AssertionError, match="type-family"):
        assert_frames_match(sdf, rel)


def test_hugeint_cast_to_bigint_passes(spark, duck):
    sdf = spark.createDataFrame([(1, 10)], "k int, total bigint")
    rel = duck.sql(
        "SELECT 1 AS k, CAST(SUM(v) AS BIGINT) AS total FROM (VALUES (10)) t(v)"
    )
    assert_frames_match(sdf, rel)


def test_int_vs_double_fails(spark, duck):
    sdf = spark.createDataFrame([(1,)], "x bigint")
    rel = duck.sql("SELECT CAST(1 AS DOUBLE) AS x")
    with pytest.raises(AssertionError, match="type-family"):
        assert_frames_match(sdf, rel)


def test_int_widths_are_one_family(spark, duck):
    sdf = spark.createDataFrame([(1,)], "x int")
    rel = duck.sql("SELECT CAST(1 AS BIGINT) AS x")
    assert_frames_match(sdf, rel)


def test_family_mapping_table():
    from pyspark.sql import types as T

    assert _spark_type_family(T.LongType()) == "int"
    assert _spark_type_family(T.DoubleType()) == "float"
    assert _spark_type_family(T.DecimalType(18, 6)) == "decimal"
    assert _spark_type_family(T.ArrayType(T.LongType())) == "other"
    assert _duck_type_family("HUGEINT") == "float"  # materializes float64
    assert _duck_type_family("DECIMAL(18,6)") == "decimal"
    assert _duck_type_family("UBIGINT") == "int"
    assert _duck_type_family("TIMESTAMP WITH TIME ZONE") == "timestamp"
