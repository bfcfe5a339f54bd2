"""Round-10 sf100 probe: connected components at the adversarial
T=0.35 density with the broadcast gate FORCED OFF
(broadcast_nodes_max=0) — the unbroadcastable regime (VERDICT r9 #5).

Round 9 proved completion by broadcasting node-sized label frames
under a counted 4M-node gate. This probe measures the regime ABOVE
that gate on the same corpus/config that used to disk-die: the r10
path contracts each partition's edges to its spanning forest (one
vectorized union-find scan, zero joins), re-contracts geometrically,
and finishes with alternating large-star/small-star rounds whose
per-round shuffle is bounded by the forest-sized frame — no broadcast
anywhere. driver_threshold=0 additionally forces the star rounds to
run distributed (no driver endgame), so the measurement covers the
full scale path.

Writes JSON lines to /tmp/probe_r10_sf100_cc_star.log.
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

LOG = open("/tmp/probe_r10_sf100_cc_star.log", "a", buffering=1)
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
        semantic_cells,
        semantic_candidate_pairs,
    )
    from dataengineering_spark.operators.similarity import dot
    from dataengineering_spark.session import get_spark

    spark = get_spark("r10-sf100-cc-star-probe", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    SF100 = "/tmp/sf100"
    CAP, T, TRAIN_CAP, ITERS, DIM = 4000, 0.35, 40_000, 2, 64

    from dataengineering_spark.catalog import read_table

    emb = read_table(spark, "embeddings", SF100).select("vec_id", "embedding")
    rec(event="start", n_vecs=emb.count(),
        free_gb=round(shutil.disk_usage("/tmp").free / 2**30, 1))

    t0 = time.time()
    cells_raw, _ = semantic_cells(
        emb, n_iters=ITERS, dim=DIM, train_rows_cap=TRAIN_CAP,
        two_level=(32, 32),
    )
    cells = cells_raw.withColumn("dd", dot(F.col("v"), F.col("v"))).persist()
    cell_n = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("_n"))
    capped = cells.join(cell_n, "cid").filter(F.col("_n") <= CAP).drop("_n")
    rec(phase="train_assign", sec=round(time.time() - t0, 1))

    pairs = semantic_candidate_pairs(capped, threshold=T).select(
        "vec_a", "vec_b"
    )

    t0 = time.time()
    comp = connected_components(
        pairs, id_a="vec_a", id_b="vec_b", distinct_edges=False,
        driver_threshold=0, broadcast_nodes_max=0,
    )
    n_labeled = comp.count()
    n_comp = comp.select("component").distinct().count()
    rec(
        phase="cc_star_complete", sec=round(time.time() - t0, 1),
        labeled=n_labeled, components=n_comp,
        min_free_gb=round(_min_free[0] / 2**30, 1),
    )
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
