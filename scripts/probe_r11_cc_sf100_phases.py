"""Round-11 sf100 CC phase decomposition: the fresh-session rerun read
2747.7 s vs r10's 2273.9 s (identical fixpoint) while the sf10
like-for-like got FASTER (107.8 vs 120.2 s) — so attribute the sf100
delta by timing the star path's phases separately. The heavy phases
(pair-frame evaluation via the labels node scan and the contraction
scan) are byte-identical code in r10 and r11; only the star-rounds
loop changed (fixpoint via one (count, Σ xxhash64) aggregate instead
of count + exceptAll). If the delta lives in the unchanged phases the
cause is environmental (single-run 45-min measurements); if it lives
in the rounds, the r11 detection is implicated.

Writes JSON lines to /tmp/probe_r11_cc_sf100_phases.log.
"""

import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

LOG = open("/tmp/probe_r11_cc_sf100_phases.log", "a", buffering=1)
T0 = time.time()


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.dedup import (
        _partition_forest,
        _star_rounds,
        semantic_candidate_pairs,
        semantic_cells,
    )
    from dataengineering_spark.operators.similarity import dot
    from dataengineering_spark.session import get_spark
    from dataengineering_spark.catalog import read_table

    spark = get_spark("r11-cc-sf100-phases", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
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
    rec(phase="train_assign", sec=round(time.time() - t0, 1))

    pairs = semantic_candidate_pairs(capped, threshold=T).select(
        "vec_a", "vec_b"
    )

    # phase 1: labels node scan — first full evaluation of the lazy
    # pair frame (identical code r10/r11)
    t0 = time.time()
    edges = pairs.select(
        F.col("vec_a").cast("long").alias("src"),
        F.col("vec_b").cast("long").alias("dst"),
    )
    labels = (
        pairs.select(F.col("vec_a").cast("long").alias("doc_id"))
        .unionByName(pairs.select(F.col("vec_b").cast("long").alias("doc_id")))
        .distinct()
        .persist()
    )
    n_nodes = labels.count()
    rec(phase="labels_node_scan", sec=round(time.time() - t0, 1),
        n_nodes=n_nodes)

    # phase 2: contraction scan — second full evaluation (identical)
    t0 = time.time()
    forest = _partition_forest(edges).persist()
    m_edges = forest.count()
    rec(phase="contraction_scan", sec=round(time.time() - t0, 1),
        forest_edges=m_edges)

    # phase 3: geometric re-contraction (identical)
    t0 = time.time()
    shrink_target = 4 * n_nodes
    passes = 0
    for _ in range(4):
        if m_edges <= shrink_target:
            break
        parts = max(1, int(m_edges // 4_000_000) + 1)
        rec2 = _partition_forest(forest.repartition(parts)).persist()
        m2 = rec2.count()
        forest.unpersist()
        forest = rec2
        passes += 1
        if m2 >= m_edges:
            m_edges = m2
            break
        m_edges = m2
    rec(phase="recontraction", sec=round(time.time() - t0, 1),
        passes=passes, forest_edges=m_edges)

    # phase 4: star rounds — THE ONLY PHASE r11 CHANGED
    t0 = time.time()
    core = _star_rounds(forest, max_iterations=50, checkpoint_every=2)
    n_core = core.count()
    rec(phase="star_rounds", sec=round(time.time() - t0, 1),
        labeled_core=n_core)
    forest.unpersist()

    # phase 5: singleton re-attach + materialize (r11 adds the
    # localCheckpoint; measure it explicitly)
    t0 = time.time()
    singles = labels.join(
        core.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("component"))
    out = core.unionByName(singles).localCheckpoint(eager=True)
    n_all = out.count()
    comps = out.select("component").distinct().count()
    rec(phase="singletons_materialize", sec=round(time.time() - t0, 1),
        labeled=n_all, components=comps,
        free_gb=round(shutil.disk_usage("/tmp").free / 2**30, 1))
    labels.unpersist()
    cells.unpersist()
    rec(event="done", total_sec=round(time.time() - T0, 1))


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()
