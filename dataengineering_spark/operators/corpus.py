"""Corpus-level document statistics — the two-pass shape of a
CCNet-style quality filter: pass 1 aggregates a corpus-wide vocabulary
statistic, pass 2 scores every document against it.

A real perplexity filter scores documents with an external language
model; the corpus-internal analogue — how RARE a document's tokens are
within the corpus itself — has the same pipeline shape and is what
this operator computes, deliberately in RATIONAL arithmetic only
(counts and count ratios, no log/exp): transcendental libm calls
differ by ulps across engines, while BIGINT/BIGINT double division is
bit-identical everywhere (see functions/text.py notes).

Scale shape (100 TB): the token frequency table is Zipf-bounded —
vocabulary grows ~O(corpus^0.5), not linearly — so pass 2 joins the
corpus's exploded tokens against a BROADCAST vocab, never shuffling
the token stream a second time. Pass 1's groupBy(token) is map-side
combined: each task emits its distinct tokens, so the shuffle is
bounded by partitions × per-partition vocabulary, not token count.
For corpora whose full vocabulary outgrows the broadcast limit, pass
``broadcast_vocab=False`` to fall back to a shuffle join (exact, one
extra token-stream exchange) — pruned-top-V-plus-default-frequency is
the usual lossy middle ground and is intentionally NOT silently
applied here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineering_spark.functions.text import normalize_text


def corpus_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) — normalized whitespace tokens, empty-text docs
    contribute no rows (blank text splits into one empty token, which
    both Spark and DuckDB produce and both sides filter out)."""
    return docs.select(
        id_col,
        F.explode(F.split(normalize_text(text_col), " ")).alias("token"),
    ).filter(F.length("token") > 0)


def token_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, freq) over the whole corpus."""
    return (
        corpus_tokens(docs, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def doc_rarity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 2,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document corpus-rarity profile: every input id with

    - ``n_tokens``        total tokens (0 for blank docs),
    - ``n_distinct``      distinct tokens,
    - ``sum_token_freq``  sum of each token's corpus frequency,
    - ``mean_token_freq`` sum/count (NULL for blank docs) — low means
      the document is made of corpus-rare tokens,
    - ``rare_ratio``      fraction of tokens with corpus frequency ≤
      ``rare_threshold`` (hapax/doubleton mass),
    - ``distinct_ratio``  type-token ratio.

    All ratios are BIGINT/BIGINT double divisions — deterministic and
    engine-portable, unlike log-prob scores.
    """
    toks = corpus_tokens(docs, id_col, text_col)
    vocab = (
        toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    per_doc = (
        toks.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("token").alias("n_distinct"),
            F.sum("freq").alias("sum_token_freq"),
            F.count(F.when(F.col("freq") <= rare_threshold, 1)).alias(
                "_n_rare"
            ),
        )
    )
    n = F.col("n_tokens")
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(n, F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            F.coalesce(F.col("sum_token_freq"), F.lit(0)).alias(
                "sum_token_freq"
            ),
            (F.col("sum_token_freq") / n).alias("mean_token_freq"),
            (F.col("_n_rare") / n).alias("rare_ratio"),
            (F.col("n_distinct") / n).alias("distinct_ratio"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-``k`` salient terms per document by a rational tf-idf.

    Standard tf-idf weighs a term by tf·log(N/df); the log is a libm
    call whose ulps differ across engines, so the score here is the
    rational member of the same family — ``tf / df`` (idf = 1/df, the
    N factor is constant per corpus and cancels in per-doc ranking).
    BIGINT/BIGINT double division is bit-identical everywhere, so the
    ranking — score desc, tf desc, term asc — replays exactly.

    Scale shape: tf is one map-side-combined groupBy over the exploded
    token stream; df aggregates the (already tiny, Zipf-bounded) tf
    frame; the score join broadcasts the vocab (``broadcast_vocab=
    False`` falls back to a shuffle join); the final top-k windows on
    ``id_col`` — per-document state only, never a global sort.
    """
    from pyspark.sql import Window

    toks = corpus_tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_vocab:
        df_counts = F.broadcast(df_counts)
    scored = tf.join(df_counts, "token").select(
        id_col,
        F.col("token").alias("term"),
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "df", "score", "rk")
    )


def bigram_lm_stats(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Language-model corpus statistics: the top-``k`` bigrams by
    count, each with its Kneser-Ney continuation counts — distinct
    left contexts of w2 (how many different words precede it: the KN
    numerator) and distinct right continuations of w1. The counting
    pass a KenLM-style n-gram model trains from.

    Scale shape: bigrams come from a narrow in-row zip (no self-join,
    no per-doc window shuffle); one hash agg per (w1,w2), then the two
    context counts are row-counts over that already-aggregated bigram
    table (|distinct bigrams| rows, not |tokens|). Top-k is
    TakeOrderedAndProject. Ties break lexicographically.
    """
    pairs = F.expr(
        "CASE WHEN size(_w) >= 2 THEN "
        "transform(sequence(1, size(_w) - 1),"
        " i -> struct(_w[i-1] AS w1, _w[i] AS w2)) "
        "ELSE array() END"
    )
    bi = (
        docs.select(F.split(F.col(text_col), " ").alias("_w"))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    right = bi.groupBy("w1").agg(
        F.count(F.lit(1)).alias("n_right_continuations")
    )
    left = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left_contexts"))
    top = bi.orderBy(
        F.col("cnt").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    return top.join(right, "w1").join(left, "w2").select(
        "w1", "w2", "cnt", "n_left_contexts", "n_right_continuations"
    )
