"""Round-10 sf100 probe, part 2: audio + video fourth decade (5M
docs) under the same price-then-cap workflow as the image run
(probe_r10_sf100_media_capped.py) — completing the modality × decade
matrix. Per modality: fingerprint once, derive the bucket-size
histogram (video keys on (slot, chunk, value)), compute exact kept-
candidate volume per candidate cap, pick the largest cap within the
2B budget, run the capped pair join.

Writes JSON lines to /tmp/probe_r10_sf100_media_av.log.
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

LOG = open("/tmp/probe_r10_sf100_media_av.log", "a", buffering=1)
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


CAPS = (1_000, 2_000, 4_000, 8_000, 16_000, 32_000)
BUDGET = 2_000_000_000


def _price(buckets_df, label):
    from pyspark.sql import functions as F

    hist = {
        int(r["n"]): int(r["cnt"])
        for r in buckets_df.groupBy("n")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(cnt * n * (n - 1) // 2 for n, cnt in hist.items())
    kept = {
        cap: sum(cnt * n * (n - 1) // 2 for n, cnt in hist.items() if n <= cap)
        for cap in CAPS
    }
    cap = max((c for c in CAPS if kept[c] <= BUDGET), default=CAPS[0])
    rec(phase=f"{label}_price", buckets=sum(hist.values()),
        max_bucket=max(hist), uncapped_candidates=total,
        kept_by_cap={str(c): kept[c] for c in CAPS}, chosen_cap=cap)
    return cap


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.caching import persist_tracked
    from dataengineering_spark.operators.dedup import (
        simhash_neardup_pairs,
        video_neardup_pairs,
    )
    from dataengineering_spark.plans.queries_llm import (
        _audio_fp_frame,
        _video_fh_frame,
    )
    from dataengineering_spark.session import get_spark

    SF100 = "/tmp/sf100"
    spark = get_spark("r10-sf100-media-av", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- audio ---------------------------------------------------
    t0 = time.time()
    afp = _audio_fp_frame(spark, SF100)
    n = afp.count()
    rec(phase="audio_fingerprint", sec=round(time.time() - t0, 1), docs=n)
    t0 = time.time()
    ab = (
        afp.select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
            F.col("afp"),
        )
        .select("c", F.expr("shiftright(afp, 16 * c) & 65535").alias("cv"))
        .groupBy("c", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cap = _price(ab, "audio")
    t0 = time.time()
    n_pairs = simhash_neardup_pairs(
        afp, max_distance=3, sim_col="afp", bits=64, max_bucket_size=cap
    ).count()
    rec(phase="audio_capped_pairs", sec=round(time.time() - t0, 1),
        cap=cap, pairs=n_pairs, min_free_gb=round(_min_free[0] / 2**30, 1))
    afp.unpersist()

    # ---- video ---------------------------------------------------
    t0 = time.time()
    fh = _video_fh_frame(spark, SF100)
    n = fh.count()
    rec(phase="video_fingerprint", sec=round(time.time() - t0, 1),
        frame_rows=n)
    vb = (
        fh.select(
            "slot",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
            F.col("dhash"),
        )
        .select(
            "slot", "c",
            F.expr("shiftright(dhash, 16 * c) & 65535").alias("cv"),
        )
        .groupBy("slot", "c", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vcap = _price(vb, "video")
    t0 = time.time()
    n_vpairs = video_neardup_pairs(
        fh, max_distance=3, min_matching=3, max_bucket_size=vcap
    ).count()
    rec(phase="video_capped_pairs", sec=round(time.time() - t0, 1),
        cap=vcap, pairs=n_vpairs,
        min_free_gb=round(_min_free[0] / 2**30, 1))
    fh.unpersist()

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
