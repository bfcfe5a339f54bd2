"""Streaming content dedup: stream-of-parts must equal batch-of-whole
on the kept-key SET, duplicates must be dropped across microbatch
boundaries, and the dedup state must be watermark-bounded."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataengineering_spark.streaming.dedup import (
    content_dedup_batch,
    content_dedup_stream,
    content_key,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    )


def test_content_key_normalizes(spark):
    df = _mk_docs(
        spark,
        [
            (1, "Hello,   World!", None),
            (2, "hello world", None),
            (3, "different entirely", None),
        ],
    )
    keys = [r.k for r in df.select(content_key("text").alias("k")).collect()]
    assert keys[0] == keys[1] != keys[2]


def test_batch_twin_keeps_one_per_content(spark):
    df = _mk_docs(
        spark,
        [
            (1, "aa bb", None),
            (2, "AA   bb!", None),
            (3, "cc", None),
        ],
    )
    kept = content_dedup_batch(df, "text")
    assert kept.count() == 2


def test_stream_dedups_across_microbatches(spark, tmp_path):
    """Two files → two microbatches (maxFilesPerTrigger=1); a duplicate
    arriving in the SECOND batch must be dropped by cross-batch state,
    and the kept set must equal the batch twin's kept set."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    base = "2024-01-01 10:{m:02d}:00"
    batch1 = [
        (1, "alpha beta", base.format(m=0)),
        (2, "gamma delta", base.format(m=1)),
        (3, "Alpha   BETA!", base.format(m=2)),  # intra-batch dup of 1
    ]
    batch2 = [
        (4, "ALPHA beta", base.format(m=10)),  # cross-batch dup of 1
        (5, "epsilon", base.format(m=11)),
    ]

    def write_file(rows, name):
        (
            spark.createDataFrame(rows, "doc_id long, text string, ts string")
            .withColumn("ts", F.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    write_file(batch1, "a")
    write_file(batch2, "b")

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = content_dedup_stream(stream, "text", "ts", delay="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    kept_ids = sorted(r.doc_id for r in got.select("doc_id").collect())
    # one survivor per content class: {alpha beta}, {gamma delta}, {epsilon}
    assert len(kept_ids) == 3
    batch_all = spark.read.parquet(src)
    batch_kept = content_dedup_batch(batch_all, "text")
    assert batch_kept.count() == 3
    # kept CONTENT classes agree with the batch twin (survivor identity
    # within a class is arrival/partition-order dependent in both)
    stream_classes = {
        r.k for r in got.select(content_key("text").alias("k")).collect()
    }
    batch_classes = {
        r.k
        for r in batch_kept.select(content_key("text").alias("k")).collect()
    }
    assert stream_classes == batch_classes


def test_state_evicts_past_watermark(spark, tmp_path):
    """A duplicate arriving AFTER the watermark passed its original is
    re-emitted — proof the state is horizon-bounded (at 100 TB/day the
    alternative, unbounded dropDuplicates state, is a slow OOM)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def write_rows(rows):
        (
            spark.createDataFrame(rows, "doc_id long, text string, ts string")
            .withColumn("ts", F.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )

    # Observed state-store mechanics this test depends on: the watermark
    # only advances at batch END (from the previous batch's max event
    # time), and expired state is evicted at batch END — AFTER that
    # batch's rows were deduplicated against it. So proving eviction
    # takes FOUR microbatches: seed the digest (b0), advance the clock
    # past its 30-min horizon (b1), let a further batch actually evict
    # it (b2), then repeat the content (b3) — re-emitted. The repeat's
    # ts must also stay above the then-current watermark (13:30) or it
    # is discarded as late data rather than deduplicated.
    write_rows([(1, "repeat me", "2024-01-01 10:00:00")])
    time.sleep(1.1)  # file-source batch order follows modification time
    write_rows([(2, "advance the clock", "2024-01-01 13:30:00")])
    time.sleep(1.1)
    write_rows([(4, "tick once more", "2024-01-01 14:00:00")])
    time.sleep(1.1)
    write_rows([(3, "repeat me", "2024-01-01 13:40:00")])

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = content_dedup_stream(stream, "text", "ts", delay="30 minutes")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    # doc 1's digest state (expired 10:30) was evicted before doc 3's
    # batch, so the repeat is re-emitted: all four kept
    assert kept == [1, 2, 3, 4], kept
