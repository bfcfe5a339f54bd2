"""Benchmark-contamination detection — the pretraining-hygiene pass
that flags training documents containing verbatim n-grams from an
evaluation benchmark (the GPT-3 appendix-C / PaLM "data contamination"
check, done corpus-side).

Semantics: a document is contaminated iff it shares at least one word
n-gram with any benchmark item.  Output is per-document: how many
distinct n-grams overlap and how many distinct benchmark items are
hit.

Scale shape (100 TB corpus, fixed benchmark): every real benchmark
suite is tiny next to the corpus — thousands of items, at most a few
million n-grams — so the benchmark n-gram set is a BROADCAST relation.
The corpus's exploded n-gram stream is filtered by the broadcast hash
join map-side, BEFORE any exchange: only matching (doc, ngram, item)
rows — a vanishing fraction — ever shuffle into the per-document
aggregate.  The corpus itself is scanned once and never repartitioned.

N-grams are built with the aligned-slices + arrays_zip + explode shape
(all codegen); interpreted HOF lambdas (transform/filter) cost ~0.2
ms/eval and are banned from this hot path — see
plans/queries_llm.q_repetition_metrics history for the measured 20-58x
difference.

Reference parity: the reference has no contamination operator; this is
part of the LLM-pipeline layer the brief asks for beyond
merklescience/dataengineering's own surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineering_spark.functions.text import word_array


def exploded_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, ngram) — one row per word n-gram occurrence, built entirely
    in codegen: n aligned slices of the word array are zipped and
    exploded, then joined with concat_ws.  Documents with fewer than
    ``n`` words contribute no rows (the slice length clamps to 0)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = word_array(text_col)
    base = df.select(F.col(id_col), w.alias("_ws"))
    n_ng = F.greatest(F.size("_ws") - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice("_ws", i + 1, n_ng).alias(f"w{i}") for i in range(n)]
    )
    return base.select(id_col, F.explode(zipped).alias("_z")).select(
        id_col,
        F.concat_ws(" ", *[F.col(f"_z.w{i}") for i in range(n)]).alias("ngram"),
    )


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "item_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns (id_col, hit_ngrams, bench_items): distinct overlapping
    n-grams and distinct benchmark items hit, for documents with at
    least one overlap.  Documents with zero overlap are absent — at
    corpus scale the clean set is the overwhelming majority and
    materializing it is the caller's (cheap) anti-join if needed.

    The benchmark side is deduplicated to distinct (item, ngram) and
    broadcast; the corpus n-gram stream meets it in a map-side hash
    join, so the only shuffle carries matched rows.
    """
    corpus_ngrams = exploded_ngrams(corpus, id_col, text_col, n)
    bench_ngrams = exploded_ngrams(
        benchmark, bench_id_col, bench_text_col, n
    ).dropDuplicates([bench_id_col, "ngram"])
    hits = corpus_ngrams.join(F.broadcast(bench_ngrams), "ngram")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count_distinct("ngram").alias("hit_ngrams"),
            F.count_distinct(bench_id_col).alias("bench_items"),
        )
    )
