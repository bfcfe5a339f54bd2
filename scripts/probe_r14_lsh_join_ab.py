"""r14 A/B: minhash_lsh_pairs band-frame persist vs ReusedExchange
self-join (guide §2.4 — two operations keyed the same way share one
exchange).  Variants, all producing the IDENTICAL pair set:

  persist   — current shape: band frame persisted, join reads the cache
  reuse     — no persist, SMJ (merge hint) on (band_id, band_sig): both
              children are byte-identical plans ending in the same
              exchange, so ReuseExchange evaluates the signature
              pipeline ONCE; no cache write, no O(corpus) memory
  reuse_shj — no persist, SHUFFLE_HASH hint (no sort, same reuse)

Each timed with the bench methodology (noop sink on the distinct pair
frame, clearCache between samples).  Pair-set equality asserted once.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def variant_pairs(spark, sf_dir, mode):
    from dataengineering_spark.operators.dedup import (
        lsh_bands,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from dataengineering_spark.plans.queries_llm import _dedup_corpus, _docs

    corpus = _dedup_corpus(_docs(spark, sf_dir))
    if mode == "persist":
        return minhash_lsh_pairs(corpus)  # lazy; noop sink materializes
    b = lsh_bands(minhash_signatures(corpus))
    left = b.alias("a")
    right = b.alias("b")
    if mode == "reuse":
        right = right.hint("merge")
        left = left.hint("merge")
    elif mode == "reuse_shj":
        right = right.hint("shuffle_hash")
        left = left.hint("shuffle_hash")
    return (
        left.join(
            right,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_sig") == F.col("b.band_sig"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataengineering_spark.session import get_spark

    spark = get_spark(
        "lsh-join-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # pair-set equality first (exactAnswer both ways)
    base = {(r[0], r[1]) for r in variant_pairs(spark, sf_dir, "persist").collect()}
    for mode in ("reuse", "reuse_shj"):
        got = {(r[0], r[1]) for r in variant_pairs(spark, sf_dir, mode).collect()}
        print(f"{mode}: pair set equal = {got == base} (n={len(got)})")
        spark.catalog.clearCache()

    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    samples: dict[str, list] = {m: [] for m in ("persist", "reuse", "reuse_shj")}
    for _ in range(rounds):
        for mode in samples:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"lsh-ab:{mode}")
            t0 = time.perf_counter()
            variant_pairs(spark, sf_dir, mode).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[mode].append(round(time.perf_counter() - t0, 3))
    for mode, s in samples.items():
        print(f"{mode:10s} median={statistics.median(s):6.3f}  {s}")
    # plan shape: exchange/reuse counts per variant
    for mode in samples:
        spark.catalog.clearCache()
        plan = (
            variant_pairs(spark, sf_dir, mode)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        n_inmem = plan.count("InMemoryTableScan")
        print(
            f"{mode:10s} plan: Exchange={n_ex} ReusedExchange={n_reuse} "
            f"InMemoryTableScan={n_inmem}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
