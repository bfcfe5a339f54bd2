"""Round-11 probe: star-engine fixpoint-detection A/B (VERDICT r10
task #6). r10's _star_rounds ran TWO extra jobs per round — a count
plus an exceptAll().isEmpty() set-difference whenever counts matched —
to detect the fixpoint. r11 replaces them with ONE aggregate per round
(count + Σ xxhash64 over the distinct canonical edge set). This probe
reruns the exact r10 measurement harnesses so the wall-clock deltas
and fixpoints are comparable against the recorded r10 rows:

  - sf10: the image near-dup pair graph (54M pairs / 453k nodes),
    star engine, driver gate + broadcast forced off — r10: 120.2 s.
  - sf100: the semantic T=0.35 graph (~1e9 pairs / 1.55M nodes),
    broadcast AND driver gate forced off — r10: 2273.9 s,
    1,548,000 labeled / 1330 components.

Identical fixpoints are REQUIRED; wall-clock at or under the r10
numbers means the single-aggregate detection carries no regression (a
noise-level result is an acceptable recorded outcome — the sure win
is the removed set-difference shuffle at fixpoint).

Writes JSON lines to /tmp/probe_r11_cc_fixpoint_ab.log.
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

LOG = open("/tmp/probe_r11_cc_fixpoint_ab.log", "a", buffering=1)
T0 = time.time()


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


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.dedup import (
        connected_components,
        semantic_candidate_pairs,
        semantic_cells,
        simhash_neardup_pairs,
    )
    from dataengineering_spark.operators.similarity import dot
    from dataengineering_spark.session import get_spark

    spark = get_spark("r11-cc-fixpoint-ab", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    from dataengineering_spark.catalog import read_table

    # ---- sf10 arm: the image pair graph (r10: 120.2 s) ------------
    # SKIP_SF10=1 runs the sf100 arm alone in a FRESH session — the
    # first r11 run measured the sf100 arm after the sf10 arm had
    # already churned the same JVM (r10's number came from a fresh
    # session), so the A/B needed a same-harness rerun.
    if not os.environ.get("SKIP_SF10"):
        from dataengineering_spark.plans.queries_llm import _image_dhash_frame

        t0 = time.time()
        fp = _image_dhash_frame(spark, "/tmp/sf10").persist()
        n_fp = fp.count()
        rec(phase="sf10_fingerprint", sec=round(time.time() - t0, 1), docs=n_fp)
        pairs10 = simhash_neardup_pairs(
            fp, max_distance=3, sim_col="dhash", bits=64
        ).select("doc_a", "doc_b")
        t0 = time.time()
        comp10 = connected_components(
            pairs10, id_a="doc_a", id_b="doc_b",
            driver_threshold=0, broadcast_nodes_max=0,
        )
        lab10 = comp10.count()
        c10 = comp10.select("component").distinct().count()
        rec(phase="sf10_cc_star", sec=round(time.time() - t0, 1),
            labeled=lab10, components=c10, r10_sec=120.2,
            min_free_gb=round(_min_free[0] / 2**30, 1))
        fp.unpersist()

    # ---- sf100 arm: the semantic T=0.35 graph (r10: 2273.9 s) -----
    CAP, T, TRAIN_CAP, ITERS, DIM = 4000, 0.35, 40_000, 2, 64
    emb = read_table(spark, "embeddings", "/tmp/sf100").select(
        "vec_id", "embedding"
    )
    t0 = time.time()
    cells_raw, _ = semantic_cells(
        emb, n_iters=ITERS, dim=DIM, train_rows_cap=TRAIN_CAP,
        two_level=(32, 32),
    )
    cells = cells_raw.withColumn("dd", dot(F.col("v"), F.col("v"))).persist()
    cell_n = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("_n"))
    capped = cells.join(cell_n, "cid").filter(F.col("_n") <= CAP).drop("_n")
    rec(phase="sf100_train_assign", sec=round(time.time() - t0, 1))

    pairs100 = semantic_candidate_pairs(capped, threshold=T).select(
        "vec_a", "vec_b"
    )
    t0 = time.time()
    comp = connected_components(
        pairs100, id_a="vec_a", id_b="vec_b", distinct_edges=False,
        driver_threshold=0, broadcast_nodes_max=0,
    )
    n_labeled = comp.count()
    n_comp = comp.select("component").distinct().count()
    rec(phase="sf100_cc_star", sec=round(time.time() - t0, 1),
        labeled=n_labeled, components=n_comp,
        r10_sec=2273.9, r10_labeled=1_548_000, r10_components=1330,
        min_free_gb=round(_min_free[0] / 2**30, 1))
    cells.unpersist()
    rec(event="done", total_sec=round(time.time() - T0, 1),
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
