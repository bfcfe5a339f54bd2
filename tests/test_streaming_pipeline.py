"""End-to-end streaming sync pipeline: rate-limited source → windowed
+ broadcast-joined transform → two-sink fan-out → commit-from-
destination, drained across MULTIPLE bounded triggers, with the sink
contents checked against the same transform run in one batch pass
(the exact-equality oracle: stream-of-parts == batch-of-whole)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from dataengineering_spark.operators.joins import enrich_transfers
from dataengineering_spark.operators.windows import log_index
from dataengineering_spark.streaming.pipeline import streaming_sync_pipeline
from dataengineering_spark.streaming.state import SyncStateStore

N_BLOCKS = 600
MAX_PER_TRIGGER = 150
LAG = 40
TOKENS = ["0xaaa", "0xbbb", "0xccc"]


def _write_transfers(spark, path: str) -> None:
    """3 transfers per block, 2 transactions, token rotating by row."""
    (
        spark.range(N_BLOCKS * 3)
        .select(
            (F.col("id") / 3).cast("long").alias("block"),
            F.concat(F.lit("tx-"), ((F.col("id") / 3).cast("long") * 2 + F.col("id") % 2).cast("string")).alias("transaction_id"),
            F.concat(F.lit("tr-"), F.col("id").cast("string")).alias("transfer_id"),
            F.element_at(F.array(*[F.lit(t) for t in TOKENS]), (F.col("id") % 3 + 1).cast("int")).alias("token_address"),
            (F.col("id") % 97).cast("double").alias("amount"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .parquet(path)
    )


def _transform_builder(prices):
    def transform(batch):
        indexed = log_index(
            batch, "transaction_id", ["block", "transfer_id"]
        )
        enriched = enrich_transfers(indexed, prices, on="token_address")
        return enriched.withColumn(
            "amount_usd",
            F.round(F.col("amount") * F.col("usd_price"), 6),
        )

    return transform


def test_streaming_sync_pipeline_end_to_end(spark, tmp_path):
    src = str(tmp_path / "transfers")
    detail = str(tmp_path / "detail")
    agg = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")
    _write_transfers(spark, src)
    prices = spark.createDataFrame(
        [(t, 1.5 + i) for i, t in enumerate(TOKENS)],
        "token_address string, usd_price double",
    )
    store = SyncStateStore(str(tmp_path / "state"))
    transform = _transform_builder(prices)

    def sink_detail(df, epoch_id):
        df.write.mode("append").parquet(detail)

    def sink_agg(df, epoch_id):
        (
            df.groupBy("block")
            .agg(
                F.count(F.lit(1)).alias("n_transfers"),
                F.round(F.sum("amount_usd"), 6).alias("block_usd"),
            )
            .write.mode("append")
            .parquet(agg)
        )

    def destination_max():
        import glob

        if not glob.glob(detail + "/*.parquet"):
            return None
        m = spark.read.parquet(detail).agg(F.max("block").alias("m")).collect()[0].m
        return None if m is None else int(m)

    q = streaming_sync_pipeline(
        spark,
        src,
        transform,
        [sink_detail, sink_agg],
        store,
        "transfers",
        destination_max,
        ckpt,
        max_offsets_per_trigger=MAX_PER_TRIGGER,
        streaming_lag=LAG,
        range_splits=4,
        trigger_once=False,
    )
    target_hi = N_BLOCKS - 1 - LAG
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if store.get("transfers").last_synced_block == target_hi:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)

    # --- multi-trigger drain with bounded, monotone watermark commits ---
    history = store.history("transfers")
    assert len(history) >= (target_hi + 1) // MAX_PER_TRIGGER, history
    prev = -1
    for st in history:
        assert prev < st.last_synced_block <= prev + MAX_PER_TRIGGER
        prev = st.last_synced_block
    assert history[-1].last_synced_block == target_hi

    # --- detail sink == the same transform over the whole range -------
    batch_oracle = transform(
        spark.read.parquet(src).filter(F.col("block") <= target_hi)
    )
    got = spark.read.parquet(detail)
    cols = sorted(got.columns)
    assert cols == sorted(batch_oracle.columns)
    assert got.count() == batch_oracle.count()
    assert (
        got.select(cols).exceptAll(batch_oracle.select(cols)).count() == 0
    )
    assert (
        batch_oracle.select(cols).exceptAll(got.select(cols)).count() == 0
    )

    # --- agg sink: one row per (epoch, block); totals match detail ----
    agg_df = spark.read.parquet(agg)
    assert agg_df.count() == target_hi + 1  # block ranges never overlap
    totals = agg_df.agg(
        F.sum("n_transfers").alias("n"), F.round(F.sum("block_usd"), 4).alias("usd")
    ).collect()[0]
    oracle_totals = (
        batch_oracle.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("amount_usd"), 6)), 4).alias("usd"),
        ).collect()[0]
    )
    assert totals.n == oracle_totals.n
    assert abs(totals.usd - oracle_totals.usd) < 1e-3


def test_streaming_sync_pipeline_tick_then_restart(spark, tmp_path):
    """trigger_once ticks: each call drains exactly one clamped range
    (the reference's scheduler-tick model) and a second PROCESS (fresh
    query over the same checkpoint) resumes where the first left off."""
    src = str(tmp_path / "transfers")
    detail = str(tmp_path / "detail")
    ckpt = str(tmp_path / "ckpt")
    _write_transfers(spark, src)
    prices = spark.createDataFrame(
        [(t, 2.0) for t in TOKENS], "token_address string, usd_price double"
    )
    store = SyncStateStore(str(tmp_path / "state"))
    transform = _transform_builder(prices)

    def sink_detail(df, epoch_id):
        df.write.mode("append").parquet(detail)

    def destination_max():
        import glob

        if not glob.glob(detail + "/*.parquet"):
            return None
        m = spark.read.parquet(detail).agg(F.max("block").alias("m")).collect()[0].m
        return None if m is None else int(m)

    def tick():
        q = streaming_sync_pipeline(
            spark, src, transform, [sink_detail], store, "transfers",
            destination_max, ckpt,
            max_offsets_per_trigger=MAX_PER_TRIGGER,
            streaming_lag=LAG,
            trigger_once=True,
        )
        q.awaitTermination(120)

    tick()
    assert store.get("transfers").last_synced_block == MAX_PER_TRIGGER - 1
    tick()
    assert store.get("transfers").last_synced_block == 2 * MAX_PER_TRIGGER - 1
    landed = spark.read.parquet(detail)
    assert landed.select("block").distinct().count() == 2 * MAX_PER_TRIGGER


def test_sampling_operators_apply_unchanged_to_streams(spark, tmp_path):
    """The batch sampling operators are plain projections/filters, so
    the SAME functions must work on a streaming frame — operator reuse
    across batch and stream is the architectural contract (one
    codepath, two execution modes), and hash membership means the
    streaming result equals the batch result row-for-row."""
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.sampling import dataset_split, mixture_sample

    src_dir = tmp_path / "docs_src"
    src_dir.mkdir()
    batch = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], ["doc_id", "source"]
    )
    batch.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b1"))

    def pipeline(df):
        kept = mixture_sample(df, "doc_id", "source", {"s0": 1_000_000}, 300_000)
        return dataset_split(kept, "doc_id")

    expected = {
        (r.doc_id, r.split)
        for r in pipeline(spark.read.parquet(str(src_dir / "b1"))).collect()
    }

    stream = spark.readStream.schema("doc_id long, source string").parquet(
        str(src_dir / "b1")
    )
    out_rows = []
    q = (
        pipeline(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda bdf, _id: out_rows.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.doc_id, r.split) for r in out_rows}
    assert got == expected and len(got) > 0


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (clicks ⋈ purchases
    within 10 minutes, per user; timestamps offset off epoch 0, which
    collides with the initial watermark) must produce exactly the batch join's
    rows — the Structured Streaming flagship the incremental runner's
    stream-static joins don't cover."""
    from pyspark.sql import functions as F

    c_dir, p_dir = tmp_path / "clicks", tmp_path / "purch"
    c_dir.mkdir(); p_dir.mkdir()
    clicks = spark.createDataFrame(
        [(u, m) for u in range(4) for m in (0, 7, 30)], "cu long, cm long"
    ).select("cu", F.timestamp_seconds(F.col("cm") * 60 + 1_000_000_000).alias("cts"))
    purchases = spark.createDataFrame(
        [(0, 5, 9.0), (0, 12, 3.0), (1, 8, 4.0), (2, 45, 7.0), (3, 31, 1.0)],
        "pu long, pm long, amount double",
    ).select("pu", F.timestamp_seconds(F.col("pm") * 60 + 1_000_000_000).alias("pts"), "amount")
    clicks.coalesce(1).write.mode("overwrite").parquet(str(c_dir / "b"))
    purchases.coalesce(1).write.mode("overwrite").parquet(str(p_dir / "b"))

    cond = F.expr(
        "cu = pu AND pts >= cts AND pts <= cts + INTERVAL 10 MINUTES"
    )
    batch = {
        (r.cu, r.cts, r.pts, r.amount)
        for r in spark.read.parquet(str(c_dir / "b"))
        .join(spark.read.parquet(str(p_dir / "b")), cond)
        .collect()
    }

    cs = (
        spark.readStream.schema("cu long, cts timestamp").parquet(str(c_dir / "b"))
        .withWatermark("cts", "1 hour")
    )
    ps = (
        spark.readStream.schema("pu long, pts timestamp, amount double")
        .parquet(str(p_dir / "b"))
        .withWatermark("pts", "1 hour")
    )
    rows = []
    q = (
        cs.join(ps, cond)
        .writeStream.outputMode("append")
        .foreachBatch(lambda bdf, _id: rows.extend(bdf.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.cu, r.cts, r.pts, r.amount) for r in rows}
    # matches: u0 c@0-p@5, u0 c@7-p@12, u1 c@0-p@8, u1 c@7-p@8, u3 c@30-p@31
    assert got == batch and len(batch) == 5
