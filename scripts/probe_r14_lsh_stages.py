"""r14 stage profile of the MinHash-LSH pair build (guide §1): time each
pipeline stage in isolation with the bench methodology (noop sink,
clearCache between samples, median of N) so the optimization targets the
measured cost, not the assumed one.

Stages (cumulative prefixes of minhash_lsh_pairs):
  corpus     — _dedup_corpus scan + perturbed union
  shingles   — + exploded_shingles (explode, codegen)
  basehash   — + md5/substring/conv per shingle row
  signatures — + groupBy(doc).agg(16 permutation mins)
  bands      — + lsh_bands (4 md5 band sigs per doc)
  pairs      — full minhash_lsh_pairs (self-join + distinct)

Usage: python scripts/probe_r14_lsh_stages.py [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from dataengineering_spark.operators.dedup import (
        _base_hash,
        exploded_shingles,
        lsh_bands,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from dataengineering_spark.plans.queries_llm import _dedup_corpus, _docs
    from dataengineering_spark.session import get_spark

    spark = get_spark(
        "lsh-stage-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    corpus = lambda: _dedup_corpus(_docs(spark, sf_dir))  # noqa: E731
    stages = {
        "corpus": lambda: corpus(),
        "shingles": lambda: exploded_shingles(corpus()),
        "basehash": lambda: exploded_shingles(corpus()).select(
            "doc_id", _base_hash(F.col("shingle")).alias("v")
        ),
        "signatures": lambda: minhash_signatures(corpus()),
        "bands": lambda: lsh_bands(minhash_signatures(corpus())),
        "pairs": lambda: minhash_lsh_pairs(corpus(), materialize=True),
    }
    for name, fn in stages.items():
        samples = []
        for _ in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"lsh-stage:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name:11s} median={statistics.median(samples):6.3f}  {samples}",
            flush=True,
        )
    # volume facts the analysis needs
    n_sh = exploded_shingles(corpus()).count()
    n_docs = corpus().count()
    print(f"docs={n_docs} shingle_rows={n_sh} rows/doc={n_sh / n_docs:.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
