"""r14 A/B for the vocab_growth regression (VERDICT r13 #4): the r13
rewrite (spread + persist of per-doc distinct-token arrays) regressed
1.13 -> 1.30 at the driver and reads 1.59 in the r14 baseline.
Variants, identical output by construction (same decomposition, same
math — only the spread/persist plumbing differs):

  current        — spread_for_compute + persist(staged)
  no_spread      — persist(staged) only (regex once, scan parallelism)
  no_persist     — spread only (regex runs twice, once per consumer)
  plain          — neither (r12-adjacent: regex twice at scan parallelism)
  onepass        — posexplode carries n_toks on pos==0 rows: ONE
                   pipeline feeds both aggregates from a single spread
                   + explode, no persist (b_tok from the pos-0 rows)

Timed with the bench methodology; output equality asserted vs current.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

_BUCKET = 50


def variant(spark, sf_dir, mode):
    from dataengineering_spark.caching import persist_tracked
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.functions.text import normalize_text
    from dataengineering_spark.operators.robust import global_cumsum
    from dataengineering_spark.operators.topology import spread_for_compute

    if mode == "current":
        from dataengineering_spark.plans.queries_lifecycle import q_vocab_growth

        return q_vocab_growth(spark, sf_dir)

    docs = read_table(spark, "documents", sf_dir)
    cleaned = F.array_remove(F.split(normalize_text("text"), " "), "")
    src = spread_for_compute(docs) if mode in ("no_persist", "onepass") else docs
    staged = src.select("doc_id", cleaned.alias("_ws")).select(
        "doc_id",
        F.size("_ws").alias("_n_toks"),
        F.array_distinct("_ws").alias("_dws"),
    )
    if mode == "no_spread":
        staged = persist_tracked(staged)

    if mode == "onepass":
        ex = staged.select(
            "doc_id",
            "_n_toks",
            F.posexplode_outer("_dws").alias("_pos", "tok"),
        )
        fo = (
            ex.filter(F.col("tok").isNotNull())
            .groupBy("tok")
            .agg(F.min("doc_id").alias("first_doc"))
        )
        b_tok = (
            ex.filter(F.col("_pos").isNull() | (F.col("_pos") == 0))
            .groupBy(F.expr(f"doc_id div {_BUCKET}").alias("bucket"))
            .agg(F.sum("_n_toks").alias("n_toks"))
        )
    else:
        fo = (
            staged.select("doc_id", F.explode("_dws").alias("tok"))
            .groupBy("tok")
            .agg(F.min("doc_id").alias("first_doc"))
        )
        b_tok = staged.groupBy(
            F.expr(f"doc_id div {_BUCKET}").alias("bucket")
        ).agg(F.sum("_n_toks").alias("n_toks"))

    b_new = fo.groupBy(
        F.expr(f"first_doc div {_BUCKET}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    b_docs = docs.groupBy(
        F.expr(f"doc_id div {_BUCKET}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    j = (
        b_docs.join(b_tok, "bucket", "left")
        .join(b_new, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce(F.col("n_toks"), F.lit(0)).alias("n_toks"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
    )
    return global_cumsum(j, order=("bucket",), cols=("n_toks", "n_new")).select(
        "bucket",
        "n_docs",
        F.col("cum_n_toks").alias("tokens_cum"),
        F.col("cum_n_new").alias("vocab_cum"),
    )


MODES = ("current", "no_spread", "no_persist", "plain", "onepass")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.session import get_spark

    spark = get_spark(
        "vocab-ab", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = sorted(map(tuple, variant(spark, sf_dir, "current").collect()))
    release_tracked()
    spark.catalog.clearCache()
    for mode in MODES[1:]:
        got = sorted(map(tuple, variant(spark, sf_dir, mode).collect()))
        print(f"{mode}: output equal = {got == base} (n={len(got)})")
        release_tracked()
        spark.catalog.clearCache()

    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    samples: dict[str, list] = {m: [] for m in MODES}
    for _ in range(rounds):
        for mode in MODES:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"vocab-ab:{mode}")
            t0 = time.perf_counter()
            variant(spark, sf_dir, mode).write.format("noop").mode(
                "overwrite"
            ).save()
            samples[mode].append(round(time.perf_counter() - t0, 3))
            release_tracked()
    for mode, s in samples.items():
        print(f"{mode:10s} median={statistics.median(s):6.3f}  {s}")
    spark.stop()


if __name__ == "__main__":
    main()
