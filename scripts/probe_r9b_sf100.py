"""Round-9 sf100 probe, part 2:

1. Balance-aware two-level quantizer A/B (VERDICT r8 #4): at equal
   effective C (1024) and cap, measure capped-out vector volume for
   the uniform 32x32 tree vs the hot-split tree, and vs flat C=1024
   (r8 measured flat dropping 301k vs uniform two-level's 452k).
   Done-criterion: balanced two-level capped-out volume <= 1.1x flat.
2. bpe_train_merges after the incremental-rounds rewrite (VERDICT r8
   #7): r8 measured 325.6 s; done-criterion < 200 s with oracles
   unchanged.

Writes JSON lines to /tmp/probe_r9b_sf100.log.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

LOG = open("/tmp/probe_r9b_sf100.log", "a", buffering=1)
T0 = time.time()


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


def phase_guard(fn):
    try:
        fn()
    except Exception as ex:  # noqa: BLE001 — record and move on
        rec(event="phase_error", err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import (
        _spread_for_training,
        two_level_assign,
        two_level_train_rows,
    )
    from dataengineering_spark.operators.sampling import sample_hash
    from dataengineering_spark.plans.queries import QUERIES
    from dataengineering_spark.session import get_spark

    spark = get_spark("r9b-sf100-probe", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    SF100 = "/tmp/sf100"
    CAP, TRAIN_CAP, ITERS, DIM = 4000, 40_000, 2, 64

    emb = read_table(spark, "embeddings", SF100).select("vec_id", "embedding")
    n_corpus = emb.count()
    rec(event="start", n_vecs=n_corpus)

    e = _spread_for_training(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    train_e = e.orderBy(
        sample_hash(F.col("vec_id"), "semdedup-train"), F.col("vec_id")
    ).limit(TRAIN_CAP)

    def run_arm(arm, hot_split):
        t0 = time.time()
        sup, subs = two_level_train_rows(
            train_e, 32, 32, ITERS, DIM, hot_split=hot_split
        )
        train_s = round(time.time() - t0, 1)
        t0 = time.time()
        cells = two_level_assign(e, sup, subs, 32)
        sizes = [
            r["n"]
            for r in cells.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        rec(
            arm=arm, phase="train_assign",
            train_sec=train_s, assign_sec=round(time.time() - t0, 1),
            cells=len(sizes), max_cell=max(sizes),
            n_subs_max=max(len(v) for v in subs.values()),
            over_cap=sum(1 for n in sizes if n > CAP),
            capped_out_vecs=sum(n for n in sizes if n > CAP),
        )
        release_tracked()

    phase_guard(lambda: run_arm("uniform_32x32", None))
    phase_guard(lambda: run_arm("hot_split_32x32", (CAP, n_corpus)))

    def bpe_row():
        t0 = time.time()
        n = QUERIES["bpe_train_merges"].fn(spark, SF100).count()
        rec(query="bpe_train_merges", sf="sf100",
            sec=round(time.time() - t0, 1), rows=n)
        release_tracked()

    phase_guard(bpe_row)
    rec(event="done", total_sec=round(time.time() - T0, 1))


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {ex}")
        raise
