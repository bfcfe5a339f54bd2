"""Round-11 sf10 CC A/B, harness-corrected: the r10 A/B persisted and
counted the 54M-pair image graph BEFORE timing the engines (its log
prints {"pairs": 54023605} first), so its 120.2 s star arm excluded
pair-frame evaluation. The first r11 rerun fed the LAZY join, so the
timed phase evaluated the un-cached pair join twice (labels node scan
+ contraction scan ≈ +140 s) and read 264 s — a harness artifact, not
an engine regression. This probe reproduces the r10 harness exactly
(persist + count first), isolating the r11 fixpoint-detection change.

Writes JSON lines to /tmp/probe_r11_cc_sf10_persisted.log.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"

LOG = open("/tmp/probe_r11_cc_sf10_persisted.log", "a", buffering=1)
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

    spark = get_spark("r11-cc-sf10-persisted", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")

    fp = _image_dhash_frame(spark, "/tmp/sf10").persist()
    pairs = (
        simhash_neardup_pairs(fp, max_distance=3, sim_col="dhash", bits=64)
        .select("doc_a", "doc_b")
        .persist()
    )
    rec(pairs=pairs.count())
    for arm, kw in [
        ("broadcast_minlabel", dict(driver_threshold=0, strategy="minlabel")),
        ("contract_star", dict(driver_threshold=0, broadcast_nodes_max=0)),
    ]:
        t0 = time.time()
        comp = connected_components(
            pairs, id_a="doc_a", id_b="doc_b", distinct_edges=False, **kw
        )
        labeled = comp.count()
        comps = comp.select("component").distinct().count()
        rec(arm=arm, sec=round(time.time() - t0, 1),
            labeled=labeled, components=comps)
    pairs.unpersist()
    fp.unpersist()
    rec(event="done", total_sec=round(time.time() - T0, 1))


if __name__ == "__main__":
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()
