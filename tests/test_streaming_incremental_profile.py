"""Incremental profiling over a stream: per-micro-batch histogram and
KMV sketch STATES appended from foreachBatch, then union-merged after
the stream drains — and the merged states must equal the direct
whole-table computation exactly (both merges are lossless). This is
the mergeable-state contract doing its actual job: profiling a feed
you can only see one micro-batch at a time."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.profiling import (
    histogram_by,
    merge_histograms,
)
from dataengineering_spark.operators.sketches import (
    kmv_distinct_by,
    kmv_estimate_from_sketch,
    kmv_merge_sketches,
    kmv_sketch_by,
)
from tests.conftest import SF_ORACLE

HIST_ARGS = dict(lo=0.0, hi=400.0, nbins=20)
KMV_K = 32


def test_streaming_incremental_sketch_state(spark, tmp_path):
    ev = read_table(spark, "events", SF_ORACLE).select(
        "event_id", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    hist_dir = str(tmp_path / "hist_state")
    kmv_dir = str(tmp_path / "kmv_state")
    batches = []

    def update_states(df, epoch_id):
        batches.append(epoch_id)
        histogram_by(df, "value", **HIST_ARGS).write.mode("append").parquet(
            hist_dir
        )
        kmv_sketch_by(df, ["event_type"], "user_id", k=KMV_K).write.mode(
            "append"
        ).parquet(kmv_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(update_states)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batches) >= 2, "stream must actually arrive in pieces"

    # merged histogram state == direct whole-table histogram
    merged_hist = {
        (r["bin_idx"]): r["n"]
        for r in merge_histograms(spark.read.parquet(hist_dir)).collect()
    }
    direct_hist = {
        (r["bin_idx"]): r["n"]
        for r in histogram_by(ev, "value", **HIST_ARGS).collect()
    }
    assert merged_hist == direct_hist

    # merged KMV state estimates == direct per-group estimates, exactly
    merged_est = {
        r["event_type"]: r["distinct_est"]
        for r in kmv_estimate_from_sketch(
            kmv_merge_sketches(
                spark.read.parquet(kmv_dir), ["event_type"], k=KMV_K
            ),
            k=KMV_K,
        ).collect()
    }
    direct_est = {
        r["event_type"]: r["distinct_est"]
        for r in kmv_distinct_by(ev, ["event_type"], "user_id", k=KMV_K).collect()
    }
    assert merged_est == direct_est
