"""Fifth-pass queries: robust statistics, step-function time weighting,
corpus lexical entropy, label-aware negative mining, co-occurrence
lift. Each fills a capability pocket the earlier passes didn't cover:

- ``winsorized_stats`` / ``anomaly_mad`` — robust aggregation (clamp
  to discrete percentiles; median/MAD outlier flags) built on the
  distributed rank-offset percentile machinery (no per-group Window,
  see q_value_percentiles), so they hold at any group skew.
- ``twap_daily`` — a step-function time-weighted average (each value
  holds until the next observation; the day's tail closes at
  midnight). The whole pipeline is integer-exact: centi-unit values ×
  microsecond durations summed wide, then one integer division to
  micro-units — no float ever crosses the engine boundary.
- ``token_entropy`` — per-document lexical entropy + type-token
  ratio, the document-level quality signal next to user_diversity's
  behavioral one. Emitted in integer micro-nats / ppm (the
  user_diversity precedent) so cross-engine log ulps can't surface.
- ``hard_negatives`` — ANN mining restricted to a *different* label
  than the query vector: the batch shape of contrastive-training
  hard-negative selection. Query side broadcast, corpus never
  shuffled (cosine_topk's contract).
- ``cooccurrence_pairs`` — market-basket support + lift over
  (user, event_type) with lift in exact ppm.

All oracle-exact; numeric outputs are either corpus doubles compared
bit-for-bit or integers derived by exact arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.functions.scalars import _dec_to_double
from dataengineering_spark.operators.robust import discrete_pcts as _discrete_pcts
from dataengineering_spark.operators.robust import step_twap
from dataengineering_spark.operators.similarity import cosine, topk_per_query
from dataengineering_spark.plans.queries import davg_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: winsorized_stats — clamp to [p05, p95], then exact mean
# ===========================================================================

def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    th = _discrete_pcts(ev, "event_type", "value", "event_id", (0.05, 0.95), ("p05", "p95"))
    clamped = ev.join(F.broadcast(th), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("wv"),
    )
    return clamped.groupBy("event_type").agg(
        F.min("p05").alias("p05"),
        F.min("p95").alias("p95"),
        (_dec_to_double(F.sum(F.col("wv").cast("decimal(18,6)"))) / F.count(F.lit(1))).alias(
            "wmean"
        ),
        F.count(F.lit(1)).alias("n"),
    )


SQL_WINSORIZED_STATS = f"""
WITH ranked AS (
  SELECT event_type, value, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
th AS (
  SELECT event_type,
    MAX(CASE WHEN rn = floor(0.05 * (n - 1)) + 1 THEN value END) AS p05,
    MAX(CASE WHEN rn = floor(0.95 * (n - 1)) + 1 THEN value END) AS p95
  FROM ranked GROUP BY event_type
),
c AS (
  SELECT e.event_type, th.p05, th.p95,
    LEAST(GREATEST(e.value, th.p05), th.p95) AS wv
  FROM events e JOIN th USING (event_type)
)
SELECT event_type, MIN(p05) AS p05, MIN(p95) AS p95,
  {davg_sql('wv')} AS wmean, COUNT(*) AS n
FROM c GROUP BY event_type
"""


# ===========================================================================
# Q: anomaly_mad — median/MAD robust outlier flags per group
# ===========================================================================

def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    med = _discrete_pcts(ev, "event_type", "value", "event_id", (0.5,), ("med",))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = _discrete_pcts(dev, "event_type", "dev", "event_id", (0.5,), ("mad",))
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("dev") > F.lit(3.0) * F.col("mad"), F.lit(1)).otherwise(0)
        ).alias("n_outliers"),
    )


SQL_ANOMALY_MAD = """
WITH r1 AS (
  SELECT event_type, value, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
    MAX(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN value END) AS med
  FROM r1 GROUP BY event_type
),
d AS (
  SELECT e.event_type, e.event_id, med.med, ABS(e.value - med.med) AS dev
  FROM events e JOIN med USING (event_type)
),
r2 AS (
  SELECT event_type, dev,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type,
    MAX(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN dev END) AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_type, MIN(d.med) AS med, MIN(mad.mad) AS mad,
  COUNT(*) AS n,
  CAST(SUM(CASE WHEN d.dev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN mad ON d.event_type = mad.event_type
GROUP BY d.event_type
"""


# ===========================================================================
# Q: twap_daily — step-function time-weighted average, integer-exact
# ===========================================================================
#
# Each observation holds from its ts until the next one in the same
# (event_type, day); the last holds until midnight. value is
# centi-exact in the corpus (2 decimals — asserted by the parity gate
# itself: a 3-decimal regeneration would shift twap_micro), so
# centi-units × microsecond durations stay inside exact integer
# arithmetic end-to-end; one integer division emits micro-units.

def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value", "event_id")
    return step_twap(ev, key="event_type", ts="ts", val="value", tie="event_id")


SQL_TWAP_DAILY = """
WITH seg AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
    COALESCE(
      LEAD(ts) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                     ORDER BY ts, event_id),
      CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS nxt,
    ts
  FROM events
),
d AS (
  SELECT event_type, day,
    CAST(floor(value * 100 + 0.5) AS HUGEINT) AS wv,
    epoch_us(nxt) - epoch_us(ts) AS dur_us
  FROM seg
),
agg AS (
  SELECT event_type, day, SUM(wv * dur_us) AS s1,
    CAST(SUM(dur_us) AS BIGINT) AS dur_total_us, COUNT(*) AS n
  FROM d GROUP BY event_type, day
)
SELECT event_type, day, n, dur_total_us,
  CAST((s1 * 10000) // dur_total_us AS BIGINT) AS twap_micro
FROM agg
"""


# ===========================================================================
# Q: token_entropy — per-document lexical entropy / type-token ratio
# ===========================================================================

def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    tc = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            (F.col("c").cast("double") * F.log(F.col("c").cast("double"))).cast(
                "decimal(28,12)"
            )
        ).alias("clnc"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("(1000000 * n_distinct) DIV n_tokens").alias("ttr_ppm"),
        F.floor(
            (
                F.log(F.col("n_tokens").cast("double"))
                - _dec_to_double(F.col("clnc")) / F.col("n_tokens")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).alias("entropy_unats"),
    )


SQL_TOKEN_ENTROPY = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
  FROM documents
),
tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
per AS (
  SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS n_tokens,
    COUNT(*) AS n_distinct,
    SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12))) AS clnc
  FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct,
  (1000000 * n_distinct) // n_tokens AS ttr_ppm,
  CAST(FLOOR((ln(CAST(n_tokens AS DOUBLE))
      - CAST(CAST(clnc AS VARCHAR) AS DOUBLE) / n_tokens) * 1000000.0 + 0.5)
    AS BIGINT) AS entropy_unats
FROM per
"""


# ===========================================================================
# Q: hard_negatives — top-k cosine neighbors with a DIFFERENT label
# ===========================================================================

def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
        F.col("label").alias("nlabel"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("nlabel") != F.col("qlabel"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    return topk_per_query(scored, 3)


SQL_HARD_NEGATIVES = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(qv, e.v)
      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cos_sim
  FROM e CROSS JOIN q
  WHERE e.label != q.qlabel
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= 3
"""


# ===========================================================================
# Q: cooccurrence_pairs — event-type pair support + lift (exact ppm)
# ===========================================================================

def q_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.select("user_id", "event_type").distinct()
    per_type = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("nt"))
    total = d.select("user_id").distinct().agg(F.count(F.lit(1)).alias("n_total"))
    a = d.select("user_id", F.col("event_type").alias("et_a"))
    b = d.select("user_id", F.col("event_type").alias("et_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    joined = (
        pairs.join(
            F.broadcast(per_type.select(F.col("event_type").alias("et_a"), F.col("nt").alias("n_a"))),
            "et_a",
        )
        .join(
            F.broadcast(per_type.select(F.col("event_type").alias("et_b"), F.col("nt").alias("n_b"))),
            "et_b",
        )
        .crossJoin(F.broadcast(total))
    )
    return joined.select(
        "et_a",
        "et_b",
        "n_users",
        F.expr("(n_users * n_total * 1000000) DIV (n_a * n_b)").alias("lift_ppm"),
    )


SQL_COOCCURRENCE_PAIRS = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
per_type AS (SELECT event_type, COUNT(*) AS nt FROM d GROUP BY event_type),
total AS (SELECT COUNT(DISTINCT user_id) AS n_total FROM d),
pairs AS (
  SELECT a.event_type AS et_a, b.event_type AS et_b, COUNT(*) AS n_users
  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT et_a, et_b, n_users,
  CAST((n_users * n_total * 1000000) // (na.nt * nb.nt) AS BIGINT) AS lift_ppm
FROM pairs, total
JOIN per_type na ON na.event_type = et_a
JOIN per_type nb ON nb.event_type = et_b
"""


# ===========================================================================
# Q: cep_pattern — regex complex-event-processing over daily sequences
# ===========================================================================
#
# Per (user, day) the ordered event-initial string (c/e/p/s/v) is
# assembled with LISTAGG ... WITHIN GROUP (deterministic full order
# by ts, event_id — no slot cap), then daily pattern counts are regex
# matches over the sequence: the MATCH_RECOGNIZE-shaped queries
# (funnel-with-gaps, immediate repetition, anchored prefix) that
# sessionized CEP engines run. String length is bounded by
# events-per-user-per-day — the same envelope any sessionized
# operator carries.

def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        "ts",
        "event_id",
    )
    seqs = ev.groupBy("day", "user_id").agg(
        F.expr("listagg(c, '') WITHIN GROUP (ORDER BY ts, event_id)").alias("seq")
    )
    flag = lambda pat: F.sum(  # noqa: E731
        F.when(F.col("seq").rlike(pat), F.lit(1)).otherwise(0)
    )
    return seqs.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_users"),
        flag("s.*v.*p").alias("n_funnel"),
        flag("vv").alias("n_repeat_view"),
        flag("^p").alias("n_first_purchase"),
        flag("e$").alias("n_last_error"),
    )


SQL_CEP_PATTERN = """
WITH seqs AS (
  SELECT CAST(ts AS DATE) AS day, user_id,
    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY 1, 2
)
SELECT day, COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN regexp_matches(seq, 's.*v.*p') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_funnel,
  CAST(SUM(CASE WHEN regexp_matches(seq, 'vv') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_repeat_view,
  CAST(SUM(CASE WHEN regexp_matches(seq, '^p') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_first_purchase,
  CAST(SUM(CASE WHEN regexp_matches(seq, 'e$') THEN 1 ELSE 0 END) AS BIGINT)
    AS n_last_error
FROM seqs GROUP BY day
"""


# ===========================================================================
# Q: delta_join_ivm — incremental view maintenance for a JOIN aggregate
# ===========================================================================
#
# incremental_agg proves partial-aggregate merge for one table; this
# proves the JOIN delta algebra: with O = Ob ∪ ΔO and L = Lb ∪ ΔL
# (insert-only deltas), the maintained aggregate is the merge of four
# partial aggregates — base ⋈ base (the "precomputed view") plus the
# three delta terms Ob⋈ΔL, ΔO⋈Lb, ΔO⋈ΔL. Each term aggregates to
# per-priority DECIMAL partials first (the state an IVM system would
# store), and the final merge sums partials — exact because decimal
# addition is associative. The oracle recomputes the full join from
# scratch; equality IS the maintenance-correctness proof.
# Deltas split on independent predicates (o_orderkey % 7,
# l_linenumber >= 4) so all four terms are non-empty.

def q_delta_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    )
    ob = orders.filter(F.col("o_orderkey") % 7 != 0)
    do = orders.filter(F.col("o_orderkey") % 7 == 0)
    lb = li.filter(F.col("l_linenumber") < 4)
    dl = li.filter(F.col("l_linenumber") >= 4)

    def part(o: DataFrame, l: DataFrame) -> DataFrame:  # noqa: E741
        return (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.sum(F.col("rev").cast("decimal(18,6)")).alias("rev_d"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    parts = (
        part(ob, lb)
        .unionAll(part(ob, dl))
        .unionAll(part(do, lb))
        .unionAll(part(do, dl))
    )
    return parts.groupBy("o_orderpriority").agg(
        _dec_to_double(F.sum("rev_d")).alias("revenue"),
        F.sum("n").alias("n_lines"),
    )


SQL_DELTA_JOIN_IVM = """
SELECT o_orderpriority,
  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6)))
       AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


ROBUST_QUERIES = {
    "winsorized_stats": (
        q_winsorized_stats,
        SQL_WINSORIZED_STATS,
        "analytics:winsorized robust mean",
    ),
    "anomaly_mad": (q_anomaly_mad, SQL_ANOMALY_MAD, "analytics:median/MAD outliers"),
    "twap_daily": (q_twap_daily, SQL_TWAP_DAILY, "timeseries:step-function TWAP"),
    "token_entropy": (
        q_token_entropy,
        SQL_TOKEN_ENTROPY,
        "llm:lexical entropy / TTR",
    ),
    "hard_negatives": (
        q_hard_negatives,
        SQL_HARD_NEGATIVES,
        "llm:contrastive hard-negative mining",
    ),
    "cooccurrence_pairs": (
        q_cooccurrence_pairs,
        SQL_COOCCURRENCE_PAIRS,
        "analytics:co-occurrence lift",
    ),
    "cep_pattern": (q_cep_pattern, SQL_CEP_PATTERN, "analytics:regex CEP"),
    "delta_join_ivm": (
        q_delta_join_ivm,
        SQL_DELTA_JOIN_IVM,
        "ivm:join delta algebra",
    ),
}
