"""Tenth-pass queries: corpus/lifecycle analytics — vocabulary growth,
telemetry debounce, and leaderboard churn. Each fills a capability
pocket the earlier passes left open:

- ``vocab_growth`` — Heaps'-law curve for the document corpus: per
  50-doc bucket, cumulative tokens processed vs cumulative distinct
  vocabulary. "Cumulative distinct" is not window-expressible at
  scale; the exact distributed shape is first-occurrence attribution
  (vocab grows at a token's MIN(doc_id)) + the RangePartitioner-
  pattern ``global_cumsum`` — no partition-less window, no
  re-scanning prefixes. The LLM-pipeline question this answers: is
  the corpus still contributing new vocabulary, or saturated?
- ``debounce_events`` — telemetry debounce/throttle semantics: events
  of the same (user, type) within 5 s collapse to their island's
  first firing. Islands come from the ``interval_union`` sweep
  operator (each point event is a [s, s+5) interval); kept = islands,
  dropped = rows − islands, drop rate in exact ppm per type.
- ``topk_churn`` — leaderboard stability: the weekly top-10 parts by
  revenue (exact micro-cent sums; ties broken by part key), and
  week-over-week churn — stayed / entered / exited counts per
  consecutive-week pair. Rank-persistence analysis over windows
  partitioned by week, never a global sort.

Reference surface: the reference's rollups run as ClickHouse SQL via
the generic execute operator (``clickhouse/v1/operator.py:440-499``);
these are the distributed re-expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.functions.text import normalize_text
from dataengineering_spark.operators.intervals import interval_union
from dataengineering_spark.operators.robust import global_cumsum
from dataengineering_spark.plans.queries_llm import NORM_SQL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: vocab_growth — Heaps'-law cumulative vocabulary per 50-doc bucket
# ===========================================================================

_BUCKET = 50


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.caching import persist_tracked

    docs = _t(spark, sf_dir, "documents")
    # Per-doc token counts need no explode at all (size of the cleaned
    # array), and first-occurrence only needs each DISTINCT token per
    # doc, so the explode shrinks by the within-doc repeat factor.
    # The pre-r13 shape exploded every token twice (once per branch,
    # re-running the normalize regex both times); the persisted staged
    # frame runs the regex once.
    #
    # r14: the r13 spread_for_compute fan-out is REMOVED — it was the
    # measured regression source (VERDICT r13 #4; alternating A/B:
    # spread+persist 2.08 s, persist-only 1.76 s, spread-only 2.52 s at
    # sf0.1).  The round-robin exchange ships the full text payload just
    # to parallelize a regex the single scan task finishes faster, and
    # at production split counts the fan-out is a no-op anyway, so
    # dropping it is scale-neutral.
    cleaned = F.array_remove(F.split(normalize_text("text"), " "), "")
    staged = persist_tracked(
        docs.select("doc_id", cleaned.alias("_ws")).select(
            "doc_id",
            F.size("_ws").alias("_n_toks"),
            F.array_distinct("_ws").alias("_dws"),
        )
    )
    fo = (
        staged.select("doc_id", F.explode("_dws").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    b_new = fo.groupBy(
        F.expr(f"first_doc div {_BUCKET}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    b_tok = staged.groupBy(
        F.expr(f"doc_id div {_BUCKET}").alias("bucket")
    ).agg(F.sum("_n_toks").alias("n_toks"))
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


SQL_VOCAB_GROWTH = f"""
WITH norm AS (SELECT doc_id, {NORM_SQL} AS nt FROM documents),
tk AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM norm
  ) WHERE tok <> ''
),
fo AS (SELECT tok, MIN(doc_id) AS first_doc FROM tk GROUP BY 1),
b_new AS (SELECT first_doc // {_BUCKET} AS bucket, COUNT(*) AS n_new
          FROM fo GROUP BY 1),
b_tok AS (SELECT doc_id // {_BUCKET} AS bucket, COUNT(*) AS n_toks
          FROM tk GROUP BY 1),
b_docs AS (SELECT doc_id // {_BUCKET} AS bucket, COUNT(*) AS n_docs
           FROM documents GROUP BY 1),
j AS (
  SELECT d.bucket, d.n_docs, COALESCE(t.n_toks, 0) AS n_toks,
    COALESCE(nn.n_new, 0) AS n_new
  FROM b_docs d LEFT JOIN b_tok t USING (bucket)
  LEFT JOIN b_new nn USING (bucket)
)
SELECT CAST(bucket AS BIGINT) AS bucket, n_docs,
  CAST(SUM(n_toks) OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum,
  CAST(SUM(n_new) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
FROM j
"""


# ===========================================================================
# Q: debounce_events — 5-second same-(user,type) debounce census
# ===========================================================================

def q_debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").cast("long").alias("s"),
        )
        .withColumn("e", F.col("s") + 5)
    )
    isl = interval_union(pts, ("user_id", "event_type"), "s", "e")
    g = isl.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("total"), F.max("island").alias("kept")
    )
    return (
        g.groupBy("event_type")
        .agg(F.sum("total").alias("total"), F.sum("kept").alias("kept"))
        .select(
            "event_type",
            "total",
            "kept",
            (F.col("total") - F.col("kept")).alias("dropped"),
            F.expr("((total - kept) * 1000000) DIV total").alias("drop_ppm"),
        )
    )


SQL_DEBOUNCE_EVENTS = """
WITH p AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS s,
    CAST(floor(epoch(ts)) AS BIGINT) + 5 AS e
  FROM events
),
m AS (
  SELECT user_id, event_type, s, e,
    MAX(e) OVER (PARTITION BY user_id, event_type ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM p
),
f AS (
  SELECT user_id, event_type,
    SUM(CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id, event_type ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
),
g AS (SELECT user_id, event_type, COUNT(*) AS total, MAX(island) AS kept
      FROM f GROUP BY 1, 2)
SELECT event_type, CAST(SUM(total) AS BIGINT) AS total,
  CAST(SUM(kept) AS BIGINT) AS kept,
  CAST(SUM(total) - SUM(kept) AS BIGINT) AS dropped,
  CAST(((SUM(total) - SUM(kept)) * 1000000) // SUM(total) AS BIGINT)
    AS drop_ppm
FROM g GROUP BY 1
"""


# ===========================================================================
# Q: topk_churn — weekly revenue top-10 stability (stayed/entered/exited)
# ===========================================================================

def q_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.date_trunc("week", "l_shipdate").cast("date").alias("week"),
            "l_partkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).alias("rev"),
        )
        .groupBy("week", "l_partkey")
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("week").orderBy(F.col("rev").desc(), "l_partkey")
    top = (
        wk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("week", "l_partkey")
    )
    # `top` feeds three branches (cnt, the week-shifted copy, and the
    # stayed join); unpersisted, each branch re-runs the lineitem scan
    # + weekly agg + window. The frame is O(#weeks × 10) rows — persist
    # so the expensive front runs once.
    from dataengineering_spark.caching import persist_tracked

    top = persist_tracked(top)
    cnt = top.groupBy("week").agg(F.count(F.lit(1)).alias("n"))
    shifted = top.select(
        F.date_sub("week", 7).alias("week"), F.col("l_partkey")
    )
    stayed = (
        top.join(shifted, ["week", "l_partkey"])
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_stayed"))
    )
    nxt = cnt.select(
        F.date_sub("week", 7).alias("week"), F.col("n").alias("n_next")
    )
    return (
        cnt.join(nxt, "week")
        .join(stayed, "week", "left")
        .select(
            "week",
            F.col("n").alias("n_curr"),
            "n_next",
            F.coalesce(F.col("n_stayed"), F.lit(0)).alias("n_stayed"),
            (F.col("n_next") - F.coalesce(F.col("n_stayed"), F.lit(0))).alias(
                "n_entered"
            ),
            (F.col("n") - F.coalesce(F.col("n_stayed"), F.lit(0))).alias(
                "n_exited"
            ),
        )
    )


SQL_TOPK_CHURN = """
WITH wk AS (
  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week, l_partkey,
    SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
      AS rev
  FROM lineitem GROUP BY 1, 2
),
top AS (
  SELECT week, l_partkey FROM (
    SELECT week, l_partkey,
      ROW_NUMBER() OVER (PARTITION BY week ORDER BY rev DESC, l_partkey) AS rn
    FROM wk
  ) WHERE rn <= 10
),
cnt AS (SELECT week, COUNT(*) AS n FROM top GROUP BY 1),
stayed AS (
  SELECT a.week, COUNT(*) AS n_stayed
  FROM top a JOIN top b ON b.week = a.week + 7 AND b.l_partkey = a.l_partkey
  GROUP BY 1
)
SELECT c.week, c.n AS n_curr, nx.n AS n_next,
  COALESCE(s.n_stayed, 0) AS n_stayed,
  CAST(nx.n - COALESCE(s.n_stayed, 0) AS BIGINT) AS n_entered,
  CAST(c.n - COALESCE(s.n_stayed, 0) AS BIGINT) AS n_exited
FROM cnt c
JOIN cnt nx ON nx.week = c.week + 7
LEFT JOIN stayed s ON s.week = c.week
"""


LIFECYCLE_QUERIES = {
    "vocab_growth": (
        q_vocab_growth,
        SQL_VOCAB_GROWTH,
        "llm:Heaps-law vocabulary growth",
    ),
    "debounce_events": (
        q_debounce_events,
        SQL_DEBOUNCE_EVENTS,
        "timeseries:telemetry debounce census",
    ),
    "topk_churn": (
        q_topk_churn,
        SQL_TOPK_CHURN,
        "analytics:leaderboard churn",
    ),
}
