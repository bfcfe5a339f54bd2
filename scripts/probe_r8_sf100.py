"""Round-8 sf100 probes (run via nohup/background, writes JSON lines
to /tmp/probe_r8_sf100.log):

1. SemDeDup end-to-end A/B at C≈1000 on 2M vectors: flat C=1024
   literal assignment vs the two-level 32×32 hierarchy — the regime
   where r7's measured C=256 loss is predicted to flip (flat per-row
   assignment work is 16× the hierarchy's here). Both arms share the
   training-sample cap, threshold, and the max_cell_size=6000 drop
   policy, so the only variable is the quantizer shape.
2. kcore_peel and bpe_train_merges at sf100 — the two bounded-
   superstep driver loops' third-decade datapoints (predicted ~linear
   from sf1/sf10).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
# local[32] = driver IS the executor: the adversarial 2M-vector pair
# volume OOMed a 28g heap (AGGREGATE_OUT_OF_MEMORY in the pair/CC
# aggregates); 64g + 128 shuffle partitions keeps per-task aggregate
# state inside a memory page budget
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

LOG = open("/tmp/probe_r8_sf100.log", "a", buffering=1)


def rec(**kw):
    LOG.write(json.dumps(kw) + "\n")


def phase_guard(fn):
    try:
        fn()
    except Exception as ex:  # noqa: BLE001 — record and move on
        rec(event="phase_error", err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()


def main():
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.dedup import (
        semantic_cells,
        semantic_dedup_members,
    )
    from dataengineering_spark.plans.queries import QUERIES
    from dataengineering_spark.session import get_spark

    spark = get_spark("r8-sf100-probe", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    SF100 = "/tmp/sf100"
    CAP, T, TRAIN_CAP, ITERS, DIM = 4000, 0.35, 40_000, 2, 64

    emb = read_table(spark, "embeddings", SF100)
    rec(event="start", n_vecs=emb.count())

    # ---- kcore_peel + bpe_train_merges third-decade rows (cheap,
    # run first so one heavy-arm failure can't starve them) ----
    def superstep_rows():
        for name in ("kcore_peel", "bpe_train_merges"):
            t0 = time.time()
            n = QUERIES[name].fn(spark, SF100).count()
            rec(query=name, sf="sf100", sec=round(time.time() - t0, 1), rows=n)
            release_tracked()

    phase_guard(superstep_rows)

    # ---- arm: two-level 32x32 (1024 effective cells) ----
    def arm_two_level():
        t0 = time.time()
        cells, cent_rows = semantic_cells(
            emb, n_iters=ITERS, dim=DIM, train_rows_cap=TRAIN_CAP,
            two_level=(32, 32),
        )
        rec(arm="two_level_32x32", phase="train", sec=round(time.time() - t0, 1))
        t0 = time.time()
        sizes = [r["count"] for r in cells.groupBy("cid").count().collect()]
        rec(
            arm="two_level_32x32", phase="assign_sizes",
            sec=round(time.time() - t0, 1), cells=len(sizes),
            max_cell=max(sizes), over_cap=sum(1 for n in sizes if n > CAP),
            dropped_vecs=sum(n for n in sizes if n > CAP),
        )
        t0 = time.time()
        m = semantic_dedup_members(
            emb, n_iters=ITERS, dim=DIM, threshold=T, train_rows_cap=TRAIN_CAP,
            max_cell_size=CAP, cent_rows=cent_rows, two_level=(32, 32),
        ).persist()
        cnt = m.count()
        rec(
            arm="two_level_32x32", phase="members_end_to_end",
            sec=round(time.time() - t0, 1), members=cnt,
            clusters=m.select("component").distinct().count(),
        )
        m.unpersist()
        release_tracked()

    phase_guard(arm_two_level)

    # ---- arm: flat C=1024 literal assignment ----
    def arm_flat():
        t0 = time.time()
        _cells_f, cent_f = semantic_cells(
            emb, n_centroids=1024, n_iters=ITERS, dim=DIM,
            train_rows_cap=TRAIN_CAP,
        )
        rec(arm="flat_1024", phase="train", sec=round(time.time() - t0, 1))
        t0 = time.time()
        m = semantic_dedup_members(
            emb, n_centroids=1024, n_iters=ITERS, dim=DIM, threshold=T,
            train_rows_cap=TRAIN_CAP, max_cell_size=CAP, cent_rows=cent_f,
        ).persist()
        cnt = m.count()
        stats = m.groupBy("cid").count().collect()
        sizes_f = [r["count"] for r in stats]
        rec(
            arm="flat_1024", phase="members_end_to_end",
            sec=round(time.time() - t0, 1), members=cnt,
            clusters=m.select("component").distinct().count(),
            observed_cells=len(sizes_f),
            max_observed_cell=max(sizes_f) if sizes_f else 0,
        )
        m.unpersist()
        release_tracked()

    phase_guard(arm_flat)
    rec(event="done")


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {ex}")
        raise
