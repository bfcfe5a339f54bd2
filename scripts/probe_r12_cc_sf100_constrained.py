"""Round-12 sf100 CC probe under a CONSTRAINED local-dir quota
(VERDICT r11 #6): the one-pass star engine's executor-memory/disk
contract has only ever run with ~60+ GB of slack (r11 recorded
min-free 66.2 GB on the root volume). This run points
``spark.local.dir`` at a dedicated small volume (launcher mounts a
12 GiB tmpfs at /tmp/spark_local_q) and drops driver memory 64g -> 16g,
so shuffle files, spills, and localCheckpoint blocks must all fit the
quota — either the engine completes with a measured high-water, or it
dies ENOSPC and we record the refusal shape. Also records the r12
convergence telemetry (edge trajectories, rounds to fixpoint) per
VERDICT r11 #7.

Launcher:
    mkdir -p /tmp/spark_local_q
    mount -t tmpfs -o size=12g tmpfs /tmp/spark_local_q
    python scripts/probe_r12_cc_sf100_constrained.py

Writes JSON lines to /tmp/probe_r12_cc_sf100_constrained.log.
"""

import json
import os
import shutil
import sys
import threading
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"

QUOTA_DIR = "/tmp/spark_local_q"
LOG = open("/tmp/probe_r12_cc_sf100_constrained.log", "a", buffering=1)
T0 = time.time()


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


_min_free_quota = [shutil.disk_usage(QUOTA_DIR).free]
_min_free_tmp = [shutil.disk_usage("/tmp").free]
_stop = threading.Event()


def _disk_sampler():
    while not _stop.wait(5):
        q = shutil.disk_usage(QUOTA_DIR).free
        t = shutil.disk_usage("/tmp").free
        if q < _min_free_quota[0]:
            _min_free_quota[0] = q
        if t < _min_free_tmp[0]:
            _min_free_tmp[0] = t


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.dedup import (
        connected_components,
        semantic_candidate_pairs,
        semantic_cells,
    )
    from dataengineering_spark.operators.similarity import dot
    from dataengineering_spark.session import get_spark

    quota_total = shutil.disk_usage(QUOTA_DIR).total
    spark = get_spark(
        "r12-cc-sf100-constrained",
        shuffle_partitions=128,
        extra_conf={"spark.local.dir": QUOTA_DIR},
    )
    spark.sparkContext.setLogLevel("ERROR")
    SF100 = "/tmp/sf100"
    CAP, T, TRAIN_CAP, ITERS, DIM = 4000, 0.35, 40_000, 2, 64

    emb = read_table(spark, "embeddings", SF100).select("vec_id", "embedding")
    rec(event="start", n_vecs=emb.count(),
        quota_gb=round(quota_total / 2**30, 1),
        driver_mem=os.environ["SPARK_GRAFT_DRIVER_MEM"])

    t0 = time.time()
    cells_raw, _ = semantic_cells(
        emb, n_iters=ITERS, dim=DIM, train_rows_cap=TRAIN_CAP,
        two_level=(32, 32),
    )
    cells = cells_raw.withColumn("dd", dot(F.col("v"), F.col("v"))).persist()
    cell_n = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("_n"))
    capped = cells.join(cell_n, "cid").filter(F.col("_n") <= CAP).drop("_n")
    rec(phase="train_assign", sec=round(time.time() - t0, 1),
        quota_min_free_gb=round(_min_free_quota[0] / 2**30, 2))

    pairs = semantic_candidate_pairs(capped, threshold=T).select(
        "vec_a", "vec_b"
    )

    t0 = time.time()
    telemetry = {}
    comp = connected_components(
        pairs, id_a="vec_a", id_b="vec_b", distinct_edges=False,
        driver_threshold=0, broadcast_nodes_max=0, telemetry=telemetry,
    )
    n_labeled = comp.count()
    n_comp = comp.select("component").distinct().count()
    rec(
        phase="cc_star_complete", sec=round(time.time() - t0, 1),
        labeled=n_labeled, components=n_comp,
        quota_min_free_gb=round(_min_free_quota[0] / 2**30, 2),
        quota_high_water_gb=round(
            (quota_total - _min_free_quota[0]) / 2**30, 2
        ),
        telemetry=telemetry,
    )
    cells.unpersist()
    rec(event="done", total_sec=round(time.time() - T0, 1),
        quota_min_free_gb=round(_min_free_quota[0] / 2**30, 2),
        tmp_min_free_gb=round(_min_free_tmp[0] / 2**30, 1))


if __name__ == "__main__":
    threading.Thread(target=_disk_sampler, daemon=True).start()
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {str(ex)[:300]}",
            quota_min_free_gb=round(_min_free_quota[0] / 2**30, 2))
        traceback.print_exc()
    finally:
        _stop.set()
