"""Round-9 sf100 probe: connected components TO COMPLETION at the
adversarial T=0.35 pair density (the round-8 open scale question).

Round 8's attempt disk-died: labels (2M rows) exceed the 10 MB
autobroadcast threshold, so every min-label round SortMergeJoined the
multi-hundred-million-row edge frame — two O(|E|) shuffle writes per
round, retained for lineage, filled the ~53 GB scratch. Round 9's
connected_components broadcasts the node-sized label/jump frames when
the node count is bounded (counted gate), skips the O(|E|) distinct
on distinct-by-construction pair frames, and force-reaps shuffle
files between checkpointed rounds. This probe measures the fixed loop
end-to-end at the exact configuration that died, sampling disk
high-water alongside.

Writes JSON lines to /tmp/probe_r9_sf100.log.
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

LOG = open("/tmp/probe_r9_sf100.log", "a", buffering=1)


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


T0 = time.time()
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
    )
    from dataengineering_spark.operators.similarity import dot
    from dataengineering_spark.session import get_spark

    spark = get_spark("r9-sf100-cc-probe", shuffle_partitions=128)
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

    # pairs are NOT persisted: caching ~10^8-10^9 (a,b) rows costs more
    # scratch than recomputing the fold once inside the edges persist
    pairs = semantic_candidate_pairs(capped, threshold=T).select(
        "vec_a", "vec_b"
    )

    t0 = time.time()
    comp = connected_components(
        pairs, id_a="vec_a", id_b="vec_b", distinct_edges=False
    )
    n_labeled = comp.count()
    n_comp = comp.select("component").distinct().count()
    rec(
        phase="cc_complete", sec=round(time.time() - t0, 1),
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
