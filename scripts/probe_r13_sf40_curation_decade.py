"""Round-13 decade-up probe (VERDICT r12 #4): the composed curation
pipeline one order of magnitude past the r12 sf10 run — 2M documents
(4x the r12 corpus by doc count, 10x the replica pressure: embeddings
repeat mod 200k, so semantic replica clusters are ~10 members vs r12's
~2.5) — with the FULL r13 maintenance configuration:

  - compact_every=2 pair-store compaction (both lanes),
  - representatives-only ingest join (both lanes),
  - authorized media cap policy at the drain.

Records per-epoch: appended pair rows (the reps-join flatness claim at
this scale), store rows/MB, epoch seconds, compaction stats; then the
ordered drain with the cap decision row.  Corpus: documents from
/tmp/sf40 (make_scaled_sf x400), embeddings from /tmp/sf10 (200k
vectors), same fixture construction as the r11/r12 sf10 probes so the
numbers are one-decade-comparable.

Writes JSON lines to /tmp/probe_r13_sf40_curation_decade.log.
"""

import json
import os
import shutil
import sys
import threading
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

LOG = open("/tmp/probe_r13_sf40_curation_decade.log", "a", buffering=1)
T0 = time.time()
ROOT = "/tmp/probe_r13_decade"


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


_min_free = [shutil.disk_usage("/tmp").free]
_stop = threading.Event()


def _disk_sampler():
    while not _stop.wait(10):
        free = shutil.disk_usage("/tmp").free
        if free < _min_free[0]:
            _min_free[0] = free


def _du(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


EPOCHS = 10
N_GRAM = 8
THRESHOLD = 0.35
C, ITERS, DIM = 512, 2, 64
SELECT_PCT = 0.75
BUDGET = 800_000
COMPACT_EVERY = 2


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.functions.text import word_array
    from dataengineering_spark.operators.similarity import (
        _spread_for_training,
        ivf_train_rows,
    )
    from dataengineering_spark.session import get_spark
    from dataengineering_spark.streaming.curation import (
        curation_finish,
        curation_pipeline_batch_fn,
    )

    DOCS_DIR = "/tmp/sf40"
    EMB_DIR = "/tmp/sf10"
    spark = get_spark("r13-sf40-curation-decade", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    os.makedirs(ROOT)
    dirs = {
        name: os.path.join(ROOT, name)
        for name in (
            "quarantine", "clean", "pairs", "index", "dsir",
            "media_index", "media_pairs", "reps_index", "media_reps_index",
        )
    }

    docs = read_table(spark, "documents", DOCS_DIR)
    n_docs = docs.count()
    emb = read_table(spark, "embeddings", EMB_DIR).select(
        F.col("vec_id").alias("_eid"), "embedding"
    )
    n_emb = emb.count()
    rec(phase="corpus", docs=n_docs, embeddings=n_emb,
        replication=round(n_docs / n_emb, 1))
    joined = docs.withColumn("_eid", F.col("doc_id") % n_emb).join(
        emb, "_eid"
    ).drop("_eid")

    def _with_payload(frame):
        import pandas as pd

        from dataengineering_spark.functions.multimodal import make_diag_png

        def gen(batches):
            for pdf in batches:
                payloads = []
                for doc_id in pdf["doc_id"]:
                    doc_id = int(doc_id)
                    grp = doc_id // 3
                    payloads.append(
                        make_diag_png(
                            72 + grp % 31 + (1 if doc_id % 3 == 2 else 0),
                            12 + grp % 7,
                            (grp * 97) % 251,
                            1 + (grp * 7) % 113,
                            (grp * 13) % 251,
                        )
                    )
                pdf = pdf.copy()
                pdf["payload"] = pd.Series(payloads, index=pdf.index)
                yield pdf

        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in frame.schema
        ) + ", payload binary"
        return frame.mapInPandas(gen, schema)

    benchmark = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("item_id"),
        F.concat_ws(" ", F.slice(word_array("text"), 6, 15)).alias("text"),
    ).persist()
    n_bench = benchmark.count()

    t0 = time.time()
    e = _spread_for_training(
        emb.select(
            F.col("_eid").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    cent_rows = ivf_train_rows(e, C, ITERS, DIM)
    rec(phase="freeze_quantizer", sec=round(time.time() - t0, 1),
        cells=C, benchmark_items=n_bench)

    batch_fn = curation_pipeline_batch_fn(
        benchmark,
        cent_rows,
        quarantine_dir=dirs["quarantine"],
        clean_dir=dirs["clean"],
        pairs_dir=dirs["pairs"],
        index_dir=dirs["index"],
        dsir_partials_dir=dirs["dsir"],
        n=N_GRAM,
        threshold=THRESHOLD,
        media_payload_col="payload",
        media_index_dir=dirs["media_index"],
        media_pairs_dir=dirs["media_pairs"],
        compact_every=COMPACT_EVERY,
        reps_index_dir=dirs["reps_index"],
        media_reps_index_dir=dirs["media_reps_index"],
    )

    prev = {"pairs": 0, "media_pairs": 0}
    for ep in range(EPOCHS):
        t0 = time.time()
        epoch_df = _with_payload(
            joined.filter(F.col("doc_id") % EPOCHS == ep)
        )
        batch_fn(epoch_df, ep)
        sec = round(time.time() - t0, 1)
        rows, appended = {}, {}
        for name in ("pairs", "media_pairs", "index", "reps_index",
                     "media_reps_index"):
            try:
                rows[name] = spark.read.parquet(dirs[name]).count()
            except Exception:  # noqa: BLE001 — dir may not exist yet
                rows[name] = 0
        for k in ("pairs", "media_pairs"):
            appended[k] = rows[k] - prev[k]
            prev[k] = rows[k]
        sizes = {name: round(_du(d) / 2**20, 1) for name, d in dirs.items()}
        rec(phase="epoch", epoch=ep, sec=sec, appended=appended,
            state_rows=rows, state_mb=sizes,
            min_free_gb=round(_min_free[0] / 2**30, 1))

    t0 = time.time()
    decision = {}
    shards = curation_finish(
        spark,
        cent_rows,
        clean_dir=dirs["clean"],
        pairs_dir=dirs["pairs"],
        index_dir=dirs["index"],
        dsir_partials_dir=dirs["dsir"],
        select_pct=SELECT_PCT,
        budget=BUDGET,
        ordered=True,
        media_pairs_dir=dirs["media_pairs"],
        media_index_dir=dirs["media_index"],
        media_cap_policy=([4000, 2000, 1000], 8_000_000_000),
        media_policy_out=decision,
    )
    n_out = shards.count()
    n_seq = shards.select("seq_id").distinct().count()
    decision.pop("priced", None)
    rec(phase="ordered_drain", sec=round(time.time() - t0, 1),
        selected_docs=n_out, sequences=n_seq, cap_decision=decision,
        min_free_gb=round(_min_free[0] / 2**30, 1))
    release_tracked()
    benchmark.unpersist()
    rec(event="done", total_sec=round(time.time() - T0, 1),
        total_state_mb=round(_du(ROOT) / 2**20, 1),
        min_free_gb=round(_min_free[0] / 2**30, 1))


if __name__ == "__main__":
    threading.Thread(target=_disk_sampler, daemon=True).start()
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {str(ex)[:300]}",
            min_free_gb=round(_min_free[0] / 2**30, 1))
        traceback.print_exc()
    finally:
        _stop.set()
