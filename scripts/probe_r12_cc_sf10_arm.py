"""Round-12 sf10 CC single-arm re-measure (VERDICT r11 #3 tail): the
minlabel legacy arm read 296.9-304.6 s across r11 runs vs 221.2 s in
r10 with byte-identical engine code; the r12 controlled bench A/B
showed the whole host runs ~1.3-1.5x slower per query than the r10
era, so re-measure BOTH arms under the controlled protocol — idle
machine, ONE ARM PER PROCESS (the r11 lesson: arms sharing a JVM
contaminate later arms), r10 harness (pair frame persisted + counted
before timing).  Ratios between arms measured the same hour are the
evidence; absolute seconds are era-bound.

Usage: python scripts/probe_r12_cc_sf10_arm.py {star|minlabel}
Appends JSON lines to /tmp/probe_r12_cc_sf10_arm.log.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

ARM = sys.argv[1] if len(sys.argv) > 1 else "star"
LOG = open("/tmp/probe_r12_cc_sf10_arm.log", "a", buffering=1)
T0 = time.time()


def rec(**kw):
    kw["t"] = round(time.time() - T0, 1)
    LOG.write(json.dumps(kw) + "\n")


def main():
    from dataengineering_spark.operators.dedup import (
        connected_components,
        simhash_neardup_pairs,
    )
    from dataengineering_spark.plans.queries_llm import _image_dhash_frame
    from dataengineering_spark.session import get_spark

    spark = get_spark(f"r12-cc-sf10-{ARM}", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    fp = _image_dhash_frame(spark, "/tmp/sf10").persist()
    pairs = (
        simhash_neardup_pairs(fp, max_distance=3, sim_col="dhash", bits=64)
        .select("doc_a", "doc_b")
        .persist()
    )
    rec(arm=ARM, pairs=pairs.count())
    kw = (
        dict(driver_threshold=0, strategy="minlabel")
        if ARM == "minlabel"
        else dict(driver_threshold=0, broadcast_nodes_max=0)
    )
    t0 = time.time()
    telemetry: dict = {}
    comp = connected_components(
        pairs, id_a="doc_a", id_b="doc_b", distinct_edges=False,
        telemetry=telemetry, **kw,
    )
    labeled = comp.count()
    comps = comp.select("component").distinct().count()
    rec(arm=ARM, sec=round(time.time() - t0, 1),
        labeled=labeled, components=comps, telemetry=telemetry)
    pairs.unpersist()
    fp.unpersist()
    rec(event="done", arm=ARM, total_sec=round(time.time() - T0, 1))


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", arm=ARM, err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()
