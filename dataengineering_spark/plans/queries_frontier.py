"""Seventh-pass queries: skyline, sequence mining, privacy audit,
set-similarity, exact weighted order statistics, and interval union.
Each fills a capability pocket the earlier passes left open:

- ``pareto_front`` — 2-D skyline per nation: customers not strictly
  dominated on (order count, account balance). The scale shape is the
  cumulative-max window trick, NOT an all-pairs self-join: sort each
  nation by count DESC, and a row is on the frontier iff the max
  balance over rows with STRICTLY greater count (a RANGE frame ending
  at -1 PRECEDING) does not exceed its own. One keyed window shuffle;
  the oracle is the independent NOT EXISTS dominance formulation.
- ``path_topk`` — sequential pattern mining: the 10 most frequent
  3-step event-type paths over per-user timelines (two LEADs over a
  (ts, event_id)-ordered window, then a hash count). The deterministic
  tie-break is (count DESC, path ASC); (count, path) is unique by
  construction.
- ``k_anonymity`` — privacy audit: for k ∈ {2, 5, 10}, how many
  quasi-identifier groups (event_type, day, value-centile-bucket)
  have fewer than k members, and what fraction of rows they expose
  (exact ppm). One grouped count, a fanout-3 explode (no cross join
  — the per-k totals ride the same aggregation), one 3-row result.
- ``jaccard_matrix`` — pairwise Jaccard similarity of the user sets
  behind each event type, in exact ppm. |A∩B| comes from the user_id
  equi-join on the distinct (type, user) frame — fanout bounded by
  |types|² per user, never a cross join; |A∪B| = n1 + n2 − |A∩B|.
- ``weighted_median`` — exact weighted median (quantity-weighted
  extended price in cents) per return flag: pre-aggregate weight per
  distinct value, one cumulative-weight window over the shrunken
  frame, median = MIN value with 2·cumw ≥ totw. All integer; both
  window frames share one sort-shuffle.
- ``interval_union`` — total covered seconds per user after merging
  overlapping 5-minute event intervals: the classic sweep — island
  starts where start > cummax(previous ends), islands labelled by a
  running sum, coverage = Σ (island max-end − island min-start).
  Complements ``concurrency_peak`` (max overlap) and
  ``session_bounds`` (gap sessions) with the measure-of-union shape.

Reference surface: the reference runs audience-overlap / dedup-audit
rollups as ClickHouse SQL through the generic execute operator
(``clickhouse/v1/operator.py:440-499``); these re-express the same
analyses as first-class distributed plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.intervals import interval_coverage, skyline_2d


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: pareto_front — per-nation skyline on (order count, account balance)
# ===========================================================================
#
# Strict dominance: a customer is OFF the frontier iff some same-nation
# customer has BOTH more orders AND a higher balance. With the window
# ordered count DESC, a RANGE frame ending at -1 PRECEDING contains
# exactly the rows with count ≥ mine+1, so one cummax replaces the
# quadratic dominance test. Customers with no orders participate with
# count 0 (left join).

def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    oc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    base = (
        c.join(oc, c["c_custkey"] == oc["o_custkey"], "left")
        .drop("o_custkey")
        .na.fill({"order_cnt": 0})
    )
    return skyline_2d(
        base, partition_by="c_nationkey", x="order_cnt", y="c_acctbal"
    ).select(
        "c_custkey",
        "c_nationkey",
        "order_cnt",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).alias("bal_cents"),
    )


SQL_PARETO_FRONT = """
WITH oc AS (SELECT o_custkey, COUNT(*) AS order_cnt FROM orders GROUP BY 1),
base AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
    COALESCE(order_cnt, 0) AS order_cnt
  FROM customer LEFT JOIN oc ON c_custkey = o_custkey
)
SELECT b.c_custkey, b.c_nationkey, CAST(b.order_cnt AS BIGINT) AS order_cnt,
  CAST(floor(b.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
FROM base b
WHERE NOT EXISTS (
  SELECT 1 FROM base o
  WHERE o.c_nationkey = b.c_nationkey
    AND o.order_cnt > b.order_cnt AND o.c_acctbal > b.c_acctbal
)
"""


# ===========================================================================
# Q: path_topk — top-10 3-step event-type paths across user timelines
# ===========================================================================

def q_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
    )
    return (
        s.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("path"))
        .limit(10)
    )


SQL_PATH_TOPK = """
WITH s AS (
  SELECT event_type,
    lead(event_type, 1) OVER w AS e2,
    lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS cnt
FROM s WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10
"""


# ===========================================================================
# Q: k_anonymity — quasi-identifier group-size audit at k ∈ {2,5,10}
# ===========================================================================
#
# The fanout-3 explode replicates each GROUP (not each row) to the
# three k thresholds, so the per-k totals (violating groups, exposed
# rows, total rows) all come out of one aggregation — no cross join,
# no second scan.

def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") / 100).cast("long").alias("value_bucket"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    x = g.select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k"),
        "cnt",
    )
    return (
        x.groupBy("k")
        .agg(
            F.count(F.when(F.col("cnt") < F.col("k"), 1)).alias("violating_groups"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") < F.col("k"), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("exposed_rows"),
            F.sum("cnt").alias("total_rows"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            "violating_groups",
            "exposed_rows",
            F.expr("(exposed_rows * 1000000) DIV total_rows").alias("exposed_ppm"),
        )
    )


SQL_K_ANONYMITY = """
WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(floor(value / 100) AS BIGINT) AS value_bucket,
    COUNT(*) AS cnt
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(k AS BIGINT) AS k,
  COUNT(*) FILTER (WHERE cnt < k) AS violating_groups,
  CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt < k), 0) AS BIGINT) AS exposed_rows,
  CAST((CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt < k), 0) AS BIGINT) * 1000000)
       // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS exposed_ppm
FROM g, UNNEST([2, 5, 10]) AS t(k)
GROUP BY 1
"""


# ===========================================================================
# Q: jaccard_matrix — pairwise Jaccard of per-event-type user sets (ppm)
# ===========================================================================

def q_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        _t(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    n = du.groupBy("event_type").agg(F.count("*").alias("n"))
    a = du.select(F.col("event_type").alias("et1"), "user_id")
    b = du.select(F.col("event_type").alias("et2"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("et1") < F.col("et2"))
        .groupBy("et1", "et2")
        .agg(F.count("*").alias("inter_n"))
    )
    n1 = n.select(F.col("event_type").alias("et1"), F.col("n").alias("n1"))
    n2 = n.select(F.col("event_type").alias("et2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(n1), "et1")
        .join(F.broadcast(n2), "et2")
        .withColumn("union_n", F.col("n1") + F.col("n2") - F.col("inter_n"))
        .select(
            "et1",
            "et2",
            "inter_n",
            "union_n",
            F.expr("(inter_n * 1000000) DIV union_n").alias("jaccard_ppm"),
        )
    )


SQL_JACCARD_MATRIX = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
n AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY 1),
inter AS (
  SELECT a.event_type AS et1, b.event_type AS et2, COUNT(*) AS inter_n
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT et1, et2, CAST(inter_n AS BIGINT) AS inter_n,
  CAST(n1.n + n2.n - inter_n AS BIGINT) AS union_n,
  CAST((inter_n * 1000000) // (n1.n + n2.n - inter_n) AS BIGINT) AS jaccard_ppm
FROM inter
JOIN n n1 ON n1.event_type = et1
JOIN n n2 ON n2.event_type = et2
"""


# ===========================================================================
# Q: weighted_median — exact quantity-weighted median price per flag
# ===========================================================================

def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("cents"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).alias("w"),
    )
    g = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    # The cumulative window sorts the per-flag DISTINCT-value frame —
    # value-domain-bounded (≤ |price domain| rows per flag at any
    # corpus scale), not row-bounded; the group total rides a 3-row
    # broadcast instead of a second full-frame window pass.
    tot = g.groupBy("l_returnflag").agg(F.sum("w").alias("totw"))
    wc = Window.partitionBy("l_returnflag").orderBy("cents")
    c = g.withColumn("cum", F.sum("w").over(wc)).join(
        F.broadcast(tot), "l_returnflag"
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").alias("median_cents"),
            F.min("totw").alias("total_weight"),
        )
    )


SQL_WEIGHTED_MEDIAN = """
WITH li AS (
  SELECT l_returnflag,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
  FROM lineitem
),
g AS (SELECT l_returnflag, cents, SUM(w) AS w FROM li GROUP BY 1, 2),
c AS (
  SELECT l_returnflag, cents,
    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
    SUM(w) OVER (PARTITION BY l_returnflag) AS totw
  FROM g
)
SELECT l_returnflag, CAST(MIN(cents) AS BIGINT) AS median_cents,
  CAST(MIN(totw) AS BIGINT) AS total_weight
FROM c WHERE 2 * cum >= totw GROUP BY 1
"""


# ===========================================================================
# Q: interval_union — merged 5-minute interval coverage per user
# ===========================================================================

def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("s"),
        )
        .withColumn("e", F.col("s") + 300)
    )
    return interval_coverage(
        iv, partition_by="user_id", start="s", end="e"
    ).withColumnRenamed("covered", "covered_sec")


SQL_INTERVAL_UNION = """
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
    CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
  FROM iv
),
f AS (
  SELECT user_id, s, e,
    SUM(CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
),
isl AS (SELECT user_id, island, MIN(s) AS lo, MAX(e) AS hi FROM f GROUP BY 1, 2)
SELECT user_id, CAST(SUM(hi - lo) AS BIGINT) AS covered_sec,
  CAST(COUNT(*) AS BIGINT) AS n_intervals
FROM isl GROUP BY 1
"""


FRONTIER_QUERIES = {
    "pareto_front": (
        q_pareto_front,
        SQL_PARETO_FRONT,
        "analytics:2-D skyline via cummax window",
    ),
    "path_topk": (
        q_path_topk,
        SQL_PATH_TOPK,
        "analytics:sequential path mining",
    ),
    "k_anonymity": (
        q_k_anonymity,
        SQL_K_ANONYMITY,
        "privacy:k-anonymity group-size audit",
    ),
    "jaccard_matrix": (
        q_jaccard_matrix,
        SQL_JACCARD_MATRIX,
        "similarity:pairwise user-set Jaccard",
    ),
    "weighted_median": (
        q_weighted_median,
        SQL_WEIGHTED_MEDIAN,
        "robust:exact weighted median",
    ),
    "interval_union": (
        q_interval_union,
        SQL_INTERVAL_UNION,
        "timeseries:merged-interval coverage",
    ),
}
