"""Round-12 rerun of the sf10 composed curation pipeline probe WITH
pair-store maintenance (VERDICT r11 #4/#5): the r11 run measured the
two accumulated pair stores growing super-linearly on the
250x-replica corpus (semantic pairs 12.9M rows by epoch 10) while
every drain-time consumer reads them only through connected
components.  This rerun:

  - compacts BOTH pair stores to their spanning forest after every
    epoch (``compact_pairs_to_forest`` — CC-equivalent by
    construction, O(|V|) rows), recording rows/MB before and after,
    so the bounded-state claim is measured, not argued;
  - drains under an AUTHORIZED media cap policy
    (``media_cap_policy=(caps, budget)`` -> price -> authorize ->
    re-pair -> CC as a library call), recording the decision row.

Same corpus, fixtures, quantizer, and epoch split as the r11 probe,
so per-epoch rows/MB are directly comparable to SCALE.md r11.

Writes JSON lines to /tmp/probe_r12_sf10_curation_compacted.log.
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

LOG = open("/tmp/probe_r12_sf10_curation_compacted.log", "a", buffering=1)
T0 = time.time()
ROOT = "/tmp/probe_r12_curation"


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
BUDGET = 200_000


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
        compact_pairs_to_forest,
        curation_finish,
        curation_pipeline_batch_fn,
    )

    SF10 = "/tmp/sf10"
    spark = get_spark("r12-sf10-curation-compacted", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(ROOT):
        shutil.rmtree(ROOT)
    os.makedirs(ROOT)
    dirs = {
        name: os.path.join(ROOT, name)
        for name in (
            "quarantine", "clean", "pairs", "index", "dsir",
            "media_index", "media_pairs",
        )
    }

    docs = read_table(spark, "documents", SF10)
    emb = read_table(spark, "embeddings", SF10).select(
        F.col("vec_id").alias("_eid"), "embedding"
    )
    joined = docs.withColumn("_eid", F.col("doc_id") % 200_000).join(
        emb, "_eid"
    ).drop("_eid")

    def _with_payload(frame):
        import pandas as pd

        from dataengineering_spark.functions.multimodal import make_diag_png

        # the _image_dhash_frame parameterization: per-group diagonal
        # slopes keep hash entropy scaling with the corpus (a flat
        # gradient family collapses to a handful of dHash values — the
        # first run of this probe measured 461M accumulated media pairs
        # by epoch 1 from exactly that degenerate fixture, the
        # low-entropy hazard the hot-bucket cap exists for)
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
    )

    for ep in range(EPOCHS):
        t0 = time.time()
        epoch_df = _with_payload(
            joined.filter(F.col("doc_id") % EPOCHS == ep)
        )
        batch_fn(epoch_df, ep)
        sizes = {name: round(_du(d) / 2**20, 1) for name, d in dirs.items()}
        rows = {}
        for name in ("pairs", "media_pairs", "index", "media_index", "dsir"):
            try:
                rows[name] = spark.read.parquet(dirs[name]).count()
            except Exception:  # noqa: BLE001 — dir may not exist yet
                rows[name] = 0
        rec(phase="epoch", epoch=ep, sec=round(time.time() - t0, 1),
            state_mb=sizes, state_rows=rows,
            min_free_gb=round(_min_free[0] / 2**30, 1))
        t0 = time.time()
        c_sem = compact_pairs_to_forest(spark, dirs["pairs"])
        c_med = compact_pairs_to_forest(
            spark, dirs["media_pairs"], a_col="doc_a", b_col="doc_b"
        )
        rec(phase="compact", epoch=ep, sec=round(time.time() - t0, 1),
            semantic=c_sem, media=c_med,
            pairs_mb=round(_du(dirs["pairs"]) / 2**20, 1),
            media_pairs_mb=round(_du(dirs["media_pairs"]) / 2**20, 1))

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
        media_cap_policy=([4000, 2000, 1000], 2_000_000_000),
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
