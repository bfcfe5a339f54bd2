"""trailing_range_agg (bucketed decomposition) must be
indistinguishable from the RANGE window on adversarial inputs: ties
(peer rows), events exactly window_sec apart (edge-bucket boundary),
sparse keys with empty buckets in between, and single-event keys."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dataengineering_spark.operators.windows import trailing_range_agg

H = 3600
DAY = 86400


def _compare(spark, rows):
    df = spark.createDataFrame(rows, "event_id long, user_id long, _sec long, value double")
    w = Window.partitionBy("user_id").orderBy("_sec").rangeBetween(-(DAY - 1), 0)
    ref = {
        r.event_id: (r.n, float(r.s))
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).alias("s"),
        ).collect()
    }
    got = {
        r.event_id: (r.n, float(r.s))
        for r in trailing_range_agg(
            df, "user_id", "_sec", F.col("value").cast("decimal(18,6)"),
            id_cols=["event_id"], count_col="n", sum_col="s",
        ).select("event_id", "n", "s").collect()
    }
    assert got == ref


def test_ties_are_peers(spark):
    # three events at the identical second: RANGE includes all peers
    # for each of them, regardless of evaluation order
    _compare(
        spark,
        [(1, 7, 1000 * H, 1.5), (2, 7, 1000 * H, 2.5), (3, 7, 1000 * H, 4.0),
         (4, 7, 1000 * H + 10, 8.0)],
    )


def test_exact_window_boundary(spark):
    # t and t-86399 are IN; t-86400 is OUT — the edge-bucket join's
    # >= t - (window_sec-1) bound, off-by-one on either side flips it
    t = 2000 * H + 123
    _compare(
        spark,
        [(1, 1, t - DAY, 100.0), (2, 1, t - DAY + 1, 10.0), (3, 1, t, 1.0)],
    )


def test_sparse_buckets_and_single_events(spark):
    # key 1: events 30 days apart (every full/edge lookup misses);
    # key 2: one event; key 3: dense same-hour cluster
    rows = [(1, 1, 100 * DAY, 1.0), (2, 1, 130 * DAY, 2.0), (3, 2, 5 * DAY, 9.0)]
    rows += [(100 + i, 3, 50 * DAY + i * 7, float(i)) for i in range(40)]
    _compare(spark, rows)


def test_bucket_multiple_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 0, 1.0)], "event_id long, user_id long, _sec long, value double")
    with pytest.raises(ValueError, match="multiple"):
        trailing_range_agg(
            df, "user_id", "_sec", "value", id_cols=["event_id"],
            window_sec=1000, bucket_sec=3600,
        )
