"""Round-10 sf100 media probe: the FOURTH decade (5M docs), where the
fixture's saturated hash entropy makes the uncapped pigeonhole join
infeasible by construction — exactly the regime the r10 cap +
accounting exist for. Workflow under test is the production shape:

1. fingerprint the corpus once (Arrow-batched dHash lane);
2. PRICE the join from the bucket-size histogram (O(#distinct sizes)
   driver state — the pigeonhole_bucket_stats aggregate, folded to a
   histogram): exact candidate volume at every candidate cap, pick
   the largest cap whose kept-candidate volume fits a 2B budget;
3. run the CAPPED pair join at that cap;
4. run capped pairs -> connected components (star engine) -> survivor
   count — the media-dedup pipeline end at 5M objects.

Writes JSON lines to /tmp/probe_r10_sf100_media.log.
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

LOG = open("/tmp/probe_r10_sf100_media.log", "a", buffering=1)
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


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.caching import persist_tracked
    from dataengineering_spark.operators.dedup import (
        connected_components,
        simhash_neardup_pairs,
    )
    from dataengineering_spark.plans.queries_llm import _image_dhash_frame
    from dataengineering_spark.session import get_spark

    SF100 = "/tmp/sf100"
    spark = get_spark("r10-sf100-media-capped", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    dh = persist_tracked(_image_dhash_frame(spark, SF100))
    n_docs = dh.count()
    rec(phase="fingerprint", sec=round(time.time() - t0, 1), docs=n_docs)

    # bucket-size histogram: (bucket size n) -> (#buckets of that size)
    t0 = time.time()
    chunks = dh.select(
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
        F.col("dhash"),
    ).select("c", F.expr("shiftright(dhash, 16 * c) & 65535").alias("cv"))
    hist = {
        int(r["n"]): int(r["cnt"])
        for r in chunks.groupBy("c", "cv")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(cnt * n * (n - 1) // 2 for n, cnt in hist.items())
    max_bucket = max(hist)
    kept = {
        cap: sum(cnt * n * (n - 1) // 2 for n, cnt in hist.items() if n <= cap)
        for cap in CAPS
    }
    cap = max((c for c in CAPS if kept[c] <= BUDGET), default=CAPS[0])
    rec(phase="price", sec=round(time.time() - t0, 1),
        buckets=sum(hist.values()), max_bucket=max_bucket,
        uncapped_candidates=total,
        kept_by_cap={str(c): kept[c] for c in CAPS},
        chosen_cap=cap)

    t0 = time.time()
    pairs = simhash_neardup_pairs(
        dh, max_distance=3, sim_col="dhash", bits=64, max_bucket_size=cap
    ).persist()
    n_pairs = pairs.count()
    rec(phase="capped_pairs", sec=round(time.time() - t0, 1),
        cap=cap, pairs=n_pairs,
        min_free_gb=round(_min_free[0] / 2**30, 1))

    t0 = time.time()
    comp = connected_components(
        pairs.select("doc_a", "doc_b"), distinct_edges=False
    )
    n_labeled = comp.count()
    n_comp = comp.select("component").distinct().count()
    survivors = n_docs - (n_labeled - n_comp)
    rec(phase="capped_survivors", sec=round(time.time() - t0, 1),
        labeled=n_labeled, components=n_comp, survivors=survivors,
        min_free_gb=round(_min_free[0] / 2**30, 1))
    pairs.unpersist()
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
