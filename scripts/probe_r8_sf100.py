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
    # T=0.6 for the A/B arms: at T=0.35 the adversarial replica corpus
    # passes O(100M) pairs whose CC shuffle chain exceeds this box's
    # ~53 GB scratch (measured disk-death, attempt 2). The quantizer
    # A/B cost lives in train + assign + the candidate FOLDS — all
    # threshold-independent — so the higher threshold changes none of
    # the compared work, only the surviving-pair volume.
    CAP, T, TRAIN_CAP, ITERS, DIM = 4000, 0.6, 40_000, 2, 64

    emb = read_table(spark, "embeddings", SF100)
    rec(event="start", n_vecs=emb.count())

    # ---- kcore_peel + bpe_train_merges third-decade rows (recorded
    # in the attempt-2 log; re-enable by flipping RUN_SUPERSTEPS) ----
    RUN_SUPERSTEPS = os.environ.get("PROBE_SUPERSTEPS", "0") == "1"

    def superstep_rows():
        for name in ("kcore_peel", "bpe_train_merges"):
            t0 = time.time()
            n = QUERIES[name].fn(spark, SF100).count()
            rec(query=name, sf="sf100", sec=round(time.time() - t0, 1), rows=n)
            release_tracked()

    if RUN_SUPERSTEPS:
        phase_guard(superstep_rows)

    # The A/B measures train + assign + the capped within-cell
    # candidate-fold pass — every phase the quantizer SHAPE affects
    # (the CC/keeper phases consume the identical pair frame in both
    # arms, and at this replica corpus's ~99M exact-copy true pairs
    # their multi-round shuffle retention exceeds the box's ~53 GB
    # scratch regardless of threshold — measured disk-death; CC cost
    # is characterized at sf10 in the round-7 A/B instead). The fold
    # pass replicates semantic_dedup_members' pre-CC pipeline:
    # dd column + cap filter + semantic_candidate_pairs, counted.
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.dedup import semantic_candidate_pairs
    from dataengineering_spark.operators.similarity import dot

    def run_arm(arm_name, **cell_kwargs):
        t0 = time.time()
        cells_raw, cent_rows = semantic_cells(
            emb, n_iters=ITERS, dim=DIM, train_rows_cap=TRAIN_CAP,
            **cell_kwargs,
        )
        rec(arm=arm_name, phase="train", sec=round(time.time() - t0, 1))
        # persist the assigned cells ONCE (the members operator's own
        # discipline — sizes agg + both pair sides ride one assign
        # pass), so the assign phase is timed exactly once per arm
        t0 = time.time()
        cells = cells_raw.withColumn("dd", dot(F.col("v"), F.col("v"))).persist()
        sizes = [r["count"] for r in cells.groupBy("cid").count().collect()]
        rec(
            arm=arm_name, phase="assign_sizes",
            sec=round(time.time() - t0, 1), cells=len(sizes),
            max_cell=max(sizes), over_cap=sum(1 for n in sizes if n > CAP),
            dropped_vecs=sum(n for n in sizes if n > CAP),
        )
        t0 = time.time()
        cell_n = cells.groupBy("cid").agg(F.count(F.lit(1)).alias("_n"))
        capped = cells.join(cell_n, "cid").filter(F.col("_n") <= CAP).drop("_n")
        n_pairs = semantic_candidate_pairs(capped, threshold=T).count()
        rec(
            arm=arm_name, phase="capped_pair_folds",
            sec=round(time.time() - t0, 1), pairs=n_pairs,
        )
        cells.unpersist()
        release_tracked()

    phase_guard(lambda: run_arm("two_level_32x32", two_level=(32, 32)))
    phase_guard(lambda: run_arm("flat_1024", n_centroids=1024))
    rec(event="done")


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {ex}")
        raise
