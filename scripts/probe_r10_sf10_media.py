"""Round-10 sf10 probe: the perceptual media-dedup tier's third
decade datapoint (VERDICT r9 #7).

image_neardup + image_dedup_survivors at /tmp/sf10 (500k docs) with
the diversified diagonal-gradient fixture, plus the pigeonhole-join
work accounting the lsh_bucket_accounting pattern prescribes: the
banded join's candidate volume is sum over (chunk, value) buckets of
n*(n-1)/2, so the probe records the bucket-size distribution and the
exact predicted candidate count alongside wall time — if a chunk
value goes degenerate at 10x corpus, it shows up HERE as a super-
linear candidate count long before it shows up as a dead executor.

Also: audio_neardup (63-bit two-band) and video_neardup at sf10 for
the same shape check.

Writes JSON lines to /tmp/probe_r10_sf10_media.log.
"""

import json
import os
import shutil
import sys
import threading
import time
import traceback

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "48g"

LOG = open("/tmp/probe_r10_sf10_media.log", "a", buffering=1)
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


def main():
    from pyspark.sql import functions as F

    from dataengineering_spark.session import get_spark

    SF10 = "/tmp/sf10"
    spark = get_spark("r10-sf10-media-probe", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    from dataengineering_spark.plans.queries import QUERIES

    rec(event="start", free_gb=round(shutil.disk_usage("/tmp").free / 2**30, 1))

    for name in (
        "image_neardup",
        "audio_neardup",
        "video_neardup",
        "image_dedup_survivors",
    ):
        t0 = time.time()
        try:
            n = QUERIES[name].fn(spark, SF10).count()
            rec(query=name, rows=n, sec=round(time.time() - t0, 1),
                min_free_gb=round(_min_free[0] / 2**30, 1))
        except Exception as ex:  # noqa: BLE001
            rec(query=name, err=f"{type(ex).__name__}: {str(ex)[:300]}",
                sec=round(time.time() - t0, 1))
            traceback.print_exc()

    # pigeonhole work accounting: bucket-size distribution + exact
    # predicted candidate volume of the image dHash chunk join
    t0 = time.time()
    import pandas as pd
    from collections.abc import Iterator

    from dataengineering_spark.functions.multimodal import (
        dhash_images,
        make_diag_png,
    )
    from dataengineering_spark.catalog import read_table

    docs = read_table(spark, "documents", SF10).select("doc_id")

    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                grp = doc_id // 3
                w = 72 + grp % 31 + (1 if doc_id % 3 == 2 else 0)
                h = 12 + grp % 7
                rows.append(
                    (doc_id, make_diag_png(
                        w, h, (grp * 97) % 251,
                        1 + (grp * 7) % 113, (grp * 13) % 251,
                    ))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    synth = docs.mapInPandas(_synth, schema="doc_id long, payload binary")
    dh = dhash_images(synth)
    n_chunks, chunk_bits = 4, 16
    mask = (1 << chunk_bits) - 1
    chunks = dh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
        F.col("dhash"),
    ).select(
        "c", F.expr(f"shiftright(dhash, {chunk_bits} * c) & {mask}").alias("cv")
    )
    buckets = chunks.groupBy("c", "cv").agg(F.count(F.lit(1)).alias("n"))
    stats = buckets.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("candidates"),
        F.sum(F.when(F.col("n") > 10_000, 1).otherwise(0)).alias("hot_10k"),
    ).collect()[0]
    rec(phase="image_bucket_accounting", sec=round(time.time() - t0, 1),
        buckets=int(stats["buckets"]), max_bucket=int(stats["max_bucket"]),
        predicted_candidates=int(stats["candidates"]),
        hot_buckets_over_10k=int(stats["hot_10k"]))

    rec(event="done", total_sec=round(time.time() - T0, 1),
        min_free_gb=round(_min_free[0] / 2**30, 1))


if __name__ == "__main__":
    threading.Thread(target=_disk_sampler, daemon=True).start()
    try:
        main()
    except Exception as ex:  # noqa: BLE001
        rec(event="error", err=f"{type(ex).__name__}: {str(ex)[:300]}")
        traceback.print_exc()
    finally:
        _stop.set()
