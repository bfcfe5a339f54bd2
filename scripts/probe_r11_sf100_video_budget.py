"""Round-11 sf100 probe: the VIDEO fourth-decade arm re-run under the
materialization-aware pair budget (VERDICT r10 task #3).

Round 10's policy priced PRE-VERIFY candidate volume and found no cap
in the table under the 2B budget (cap 1000 still keeps 3.08B
candidates) — the probe "fell back to the smallest cap and said so",
even though the run completed in 35.6 s because candidates stream
through the codegen hamming verify (Catalyst folds the predicate into
the join — pinned in tests/test_pair_budget.py) and only survivors
materialize.

This probe runs the corrected policy end to end:
  1. fingerprint 5M synthesized videos once (frame-hash frame),
  2. bucket histogram over the join's own key (slot, chunk, value),
  3. per cap, EXACT capped candidate volume (candidate_volume) and a
     MEASURED verify pass rate on a 1-in-k whole-bucket sample
     (sample_verify_rate), largest caps first,
  4. require_survivor_budget authorizes the largest cap whose
     predicted survivor volume fits the 2B budget (a compute guard
     additionally bounds the probe's own wall-clock),
  5. run the authorized capped pair join and record what actually
     materialized vs the prediction.

Writes JSON lines to /tmp/probe_r11_sf100_video_budget.log.
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

LOG = open("/tmp/probe_r11_sf100_video_budget.log", "a", buffering=1)
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


CAPS = (32_000, 16_000, 8_000, 4_000, 2_000, 1_000)  # largest first
BUDGET = 2_000_000_000  # survivor rows entering the dedup distinct
COMPUTE_CAP = 25_000_000_000  # probe-only wall-clock guard on streamed candidates
SAMPLE_TARGET = 50_000_000  # aim the rate sample at ~50M occurrences


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.dedup import (
        candidate_volume,
        require_survivor_budget,
        sample_verify_rate,
        video_neardup_pairs,
    )
    from dataengineering_spark.plans.queries_llm import _video_fh_frame
    from dataengineering_spark.session import get_spark

    SF100 = "/tmp/sf100"
    spark = get_spark("r11-sf100-video-budget", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    fh = _video_fh_frame(spark, SF100).persist()
    n = fh.count()
    rec(phase="video_fingerprint", sec=round(time.time() - t0, 1), frame_rows=n)

    t0 = time.time()
    buckets = (
        fh.select(
            "slot",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
            F.col("dhash"),
        )
        .select("slot", "c", F.expr("shiftright(dhash, 16 * c) & 65535").alias("cv"))
        .groupBy("slot", "c", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    total = candidate_volume(buckets)
    rec(phase="histogram", sec=round(time.time() - t0, 1),
        buckets=buckets.count(), uncapped_candidates=total)

    chosen = None
    for cap in CAPS:
        t0 = time.time()
        cand = candidate_volume(buckets, max_bucket_size=cap)
        if cand > COMPUTE_CAP:
            rec(phase="price", cap=cap, candidates=cand,
                skipped="over probe compute guard", sec=round(time.time() - t0, 1))
            continue
        k = max(64, cand // SAMPLE_TARGET or 1)
        rate, s_cand, s_surv = sample_verify_rate(
            fh, max_distance=3, id_col="doc_id", sim_col="dhash", bits=64,
            slot_col="slot", max_bucket_size=cap, bucket_sample=int(k),
        )
        try:
            p_cand, p_surv = require_survivor_budget(
                buckets, BUDGET, rate, max_bucket_size=cap
            )
            rec(phase="price", cap=cap, candidates=p_cand, rate=rate,
                sampled=(s_cand, s_surv), predicted_survivors=p_surv,
                verdict="authorized", sec=round(time.time() - t0, 1))
            chosen = (cap, p_cand, rate, p_surv)
            break
        except ValueError as ex:
            rec(phase="price", cap=cap, candidates=cand, rate=rate,
                sampled=(s_cand, s_surv), verdict="refused",
                err=str(ex)[:200], sec=round(time.time() - t0, 1))

    if chosen is None:
        rec(event="done", result="every cap refused under survivor pricing",
            total_sec=round(time.time() - T0, 1))
        return

    cap, p_cand, rate, p_surv = chosen
    t0 = time.time()
    n_pairs = video_neardup_pairs(
        fh, max_distance=3, min_matching=3, max_bucket_size=cap
    ).count()
    rec(phase="video_capped_pairs", sec=round(time.time() - t0, 1),
        cap=cap, pairs=n_pairs, predicted_survivors=p_surv,
        candidates_streamed=p_cand,
        min_free_gb=round(_min_free[0] / 2**30, 1))
    fh.unpersist()
    buckets.unpersist()
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
