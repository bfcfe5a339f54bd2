"""Sixth-pass queries: exact allocation, sequence islands, trend
fitting, attribution, and graph traversal. Each fills a capability
pocket the earlier passes left open:

- ``proration`` — largest-remainder integer allocation: split each
  order's total (in cents) across its lineitems proportionally to
  extended price so the allocated cents sum EXACTLY to the order
  total. The financial-engineering kernel behind invoice splitting /
  revenue recognition; float proration can't satisfy the invariant,
  integer largest-remainder can. All windows partition by order key
  (bounded group: ≤7 lines/order at any scale), one shuffle total.
- ``activity_streaks`` — gaps-and-islands: per-user runs of
  consecutive active days via the classic ``day − row_number``
  grouping-key trick; emits streak counts plus the longest streak
  and its start date through an integer sort-key encoding
  (``len·1e5 + (99999 − start)``) so the argmax is a plain MAX —
  deterministic on both engines, no order-sensitive ``max_by``.
- ``regression_trend`` — per-group OLS (value vs. hours-since-epoch)
  from exact integer moments: Σx, Σy, Σxy, Σx² accumulate as longs,
  the normal-equation numerator/denominator form in DECIMAL(38,0) /
  HUGEINT, and the only float ops are one division and one
  multiply-subtract performed identically on both engines — so the
  doubles are bit-equal. Partial-aggregate shape: one map-side
  combine, a 5-row result, no window, no second pass.
- ``last_touch_attribution`` — marketing attribution: each purchase
  credits the user's most recent preceding non-purchase event via
  ``LAST_VALUE(... IGNORE NULLS)`` over ``ROWS BETWEEN UNBOUNDED
  PRECEDING AND 1 PRECEDING``; purchases with no prior touch land in
  an explicit ``(none)`` bucket. Per-user window → one keyed shuffle.
- ``bfs_levels`` — single-source shortest hops over the user-session
  transition graph (node = event bucket, edge = consecutive events of
  one user). Spark runs frontier BFS: per hop, expand only the
  newly-discovered frontier through the edge equi-join and anti-join
  against the visited set — |V|-bounded state, no path enumeration.
  The oracle is a recursive CTE whose UNION-dedup + MIN(d) computes
  the same fixpoint. 4 hops reach 996 of 1000 buckets at sf0.01.

Second batch in the same pass:

- ``cusum_changepoint`` — mean-shift detection: the day maximizing
  |n·prefix_k − k·S| per series. Multiplying the classic CUSUM
  statistic through by n removes its division, so both engines rank
  identical int64s; the per-series window runs over the ~days-sized
  daily aggregate, never the raw events.
- ``retract_ivm`` — IVM with retractions: updates arrive as
  (retract old, insert new) and the maintained aggregate is
  base + inserts − retractions, exact because DECIMAL sums and
  COUNTs form an abelian group. The recompute-from-scratch oracle is
  the maintenance proof (the retraction face of delta_join_ivm).
- ``seasonality_dow`` — weekday seasonal index
  ⌊1e6·(sum_dow·n_total)/(n_dow·sum_total)⌋ with cross products in
  DECIMAL(38,0)/HUGEINT; pure two-level partial aggregation.

Reference surface: the reference runs allocation/attribution-style
rollups as ClickHouse SQL through the generic execute operator
(``clickhouse/v1/operator.py:440-499``) and defers graph traversal to
TigerGraph (``tigergraph/operator.py``); these give both first-class
distributed plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.functions.scalars import _dec_to_double
from dataengineering_spark.operators.allocation import fifo_match, largest_remainder
from dataengineering_spark.operators.graph_analytics import bfs_hops
from dataengineering_spark.operators.robust import cusum_changepoint as _cusum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: proration — largest-remainder cent allocation across lineitems
# ===========================================================================
#
# T = order total in cents, w_i = lineitem weight in cents.
# base_i = ⌊T·w_i / Σw⌋, and the R = T − Σbase leftover cents go to
# the R largest remainders (ties → lowest linenumber, then weight —
# the corpus duplicates (orderkey, linenumber)). Everything is
# int64: T ≤ 5e7, w ≤ 1e7 ⇒ T·w ≤ 5e14.

def q_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).alias("w"),
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).alias("t_cents"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).drop("o_orderkey")
    return largest_remainder(
        j,
        group="l_orderkey",
        weight="w",
        total="t_cents",
        tie="l_linenumber",
        out="alloc_cents",
    ).select("l_orderkey", "l_linenumber", "alloc_cents")


SQL_PRORATION = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS w
  FROM lineitem
),
o AS (
  SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS t_cents
  FROM orders
),
j AS (
  SELECT l_orderkey, l_linenumber, w, t_cents,
    SUM(w) OVER (PARTITION BY l_orderkey) AS tot_w
  FROM li JOIN o ON l_orderkey = o_orderkey
),
b AS (
  SELECT *, (t_cents * w) // tot_w AS base,
    (t_cents * w) % tot_w AS rem
  FROM j
),
r AS (
  SELECT *,
    SUM(base) OVER (PARTITION BY l_orderkey) AS base_sum,
    ROW_NUMBER() OVER (PARTITION BY l_orderkey
                       ORDER BY rem DESC, l_linenumber, w) AS rk
  FROM b
)
SELECT l_orderkey, l_linenumber,
  CAST(base + CASE WHEN rk <= t_cents - base_sum THEN 1 ELSE 0 END AS BIGINT)
    AS alloc_cents
FROM r
"""


# ===========================================================================
# Q: activity_streaks — per-user consecutive-day islands
# ===========================================================================

def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    by_day = Window.partitionBy("user_id").orderBy("day")
    r = d.select(
        "user_id",
        F.datediff("day", F.lit("1970-01-01")).alias("d_epoch"),
        (
            F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(by_day)
        ).alias("grp"),
    )
    isl = r.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d_epoch").alias("start_d")
    )
    # sort key packs (len, earliest start) into one integer so the
    # argmax is a deterministic MAX on both engines
    sk = F.col("len") * 100000 + (F.lit(99999) - F.col("start_d"))
    return isl.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("max_streak"),
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            (F.lit(99999) - F.max(sk) % 100000).cast("int"),
        ).alias("longest_start"),
    )


SQL_ACTIVITY_STREAKS = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id,
    day - DATE '1970-01-01' AS d_epoch,
    (day - DATE '1970-01-01')
      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
),
isl AS (
  SELECT user_id, grp, COUNT(*) AS len, MIN(d_epoch) AS start_d
  FROM r GROUP BY 1, 2
)
SELECT user_id,
  CAST(SUM(len) AS BIGINT) AS n_active_days,
  COUNT(*) AS n_streaks,
  CAST(MAX(len) AS BIGINT) AS max_streak,
  CAST(DATE '1970-01-01'
    + CAST(99999 - MAX(len * 100000 + (99999 - start_d)) % 100000 AS INT)
    AS DATE) AS longest_start
FROM isl GROUP BY user_id
"""


# ===========================================================================
# Q: regression_trend — per-group OLS from exact integer moments
# ===========================================================================

def q_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _t(spark, sf_dir, "events").select(
        "event_type",
        (
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")) * 24 + F.hour("ts")
        ).cast("long").alias("x"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d38("n") * d38("sxy") - d38("sx") * d38("sy")
    den = d38("n") * d38("sxx") - d38("sx") * d38("sx")
    slope = _dec_to_double(num) / _dec_to_double(den)
    return m.select(
        "event_type",
        "n",
        slope.alias("slope_centi"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n")
        ).alias("intercept_centi"),
    )


SQL_REGRESSION_TREND = """
WITH pts AS (
  SELECT event_type,
    CAST((CAST(ts AS DATE) - DATE '2024-01-01') * 24 + hour(ts) AS BIGINT) AS x,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type, COUNT(*) AS n,
    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
    CAST(SUM(x * y) AS HUGEINT) AS sxy, CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM pts GROUP BY event_type
),
s AS (
  SELECT event_type, n, sx, sy,
    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
      / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS slope_centi
  FROM m
)
SELECT event_type, n, slope_centi,
  (CAST(sy AS DOUBLE) - slope_centi * CAST(sx AS DOUBLE)) / n AS intercept_centi
FROM s
"""


# ===========================================================================
# Q: last_touch_attribution — credit purchases to the latest prior touch
# ===========================================================================

def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    before = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(before)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.coalesce("touch", F.lit("(none)")).alias("touch_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


SQL_LAST_TOUCH_ATTRIBUTION = """
WITH t AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT day, COALESCE(touch, '(none)') AS touch_type, COUNT(*) AS n_purchases
FROM t WHERE event_type = 'purchase'
GROUP BY 1, 2
"""


# ===========================================================================
# Q: bfs_levels — single-source shortest hops over the transition graph
# ===========================================================================

BFS_MAX_HOPS = 4
BFS_SOURCE = 0


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", (F.col("event_id") % 1000).alias("node")
    )
    by_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("node").over(by_ts))
    adj = (
        seq.filter(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("node")))
        .select(F.col("node").alias("a"), F.col("nxt").alias("b"))
        .distinct()
    )
    return bfs_hops(adj, BFS_SOURCE, BFS_MAX_HOPS)


SQL_BFS_LEVELS = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id % 1000 AS node,
    LEAD(event_id % 1000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
adj AS (
  SELECT DISTINCT node AS a, nxt AS b FROM seq
  WHERE nxt IS NOT NULL AND nxt <> node
),
walk(node, d) AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT adj.b AS node, walk.d + 1 AS d
  FROM walk JOIN adj ON adj.a = walk.node WHERE walk.d < 4
)
SELECT node, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY node
"""


# ===========================================================================
# Q: cusum_changepoint — integer-exact CUSUM changepoint per series
# ===========================================================================
#
# Classic mean-shift detection: the k maximizing |Σ_{i≤k} y_i − k·μ|.
# Multiplying through by n removes the only division — the statistic
# n·prefix_k − k·S is exact int64 (|S| ≤ 6e10 centi at sf0.1, n ≤ 31),
# so both engines rank identical integers. Daily pre-aggregation
# shrinks the series before any window runs; the per-series window
# then touches ~days rows, not events.

def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).alias("y"))
    )
    return _cusum(daily, key="event_type", order_col="day", val="y").select(
        "event_type",
        F.col("day").alias("cp_day"),
        "abs_stat",
        F.col("n").alias("n_days"),
    )


SQL_CUSUM_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, day,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS k,
    SUM(y) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
    SUM(y) OVER (PARTITION BY event_type) AS s_total,
    COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
),
r AS (
  SELECT event_type, day, n_days,
    ABS(n_days * prefix - k * s_total) AS stat,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ABS(n_days * prefix - k * s_total) DESC, k) AS rk
  FROM c
)
SELECT event_type, day AS cp_day, CAST(stat AS BIGINT) AS abs_stat,
  CAST(n_days AS BIGINT) AS n_days
FROM r WHERE rk = 1
"""


# ===========================================================================
# Q: retract_ivm — incremental view maintenance with RETRACTIONS
# ===========================================================================
#
# delta_join_ivm proves the insert-only join-delta algebra; this
# proves the retraction face: an update arrives as (retract old row,
# insert new row), and the maintained aggregate is
# agg(base) + agg(inserts) − agg(retractions) — exact because
# DECIMAL sums and COUNTs form an abelian group. Updates touch orders
# with o_orderkey % 7 = 0 (price bumped by 10). The oracle recomputes
# the final state from scratch; equality is the maintenance proof.

def q_retract_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    touched = F.col("o_orderkey") % 7 == 0

    def agg(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            (F.lit(sign) * F.sum(F.col("price").cast("decimal(18,6)"))).alias("rev_d"),
            (F.lit(sign) * F.count(F.lit(1))).alias("n"),
        )

    base = agg(o.select("o_orderpriority", F.col("o_totalprice").alias("price")), 1)
    inserts = agg(
        o.filter(touched).select(
            "o_orderpriority", (F.col("o_totalprice") + F.lit(10.0)).alias("price")
        ),
        1,
    )
    retractions = agg(
        o.filter(touched).select("o_orderpriority", F.col("o_totalprice").alias("price")),
        -1,
    )
    merged = base.unionAll(inserts).unionAll(retractions)
    return merged.groupBy("o_orderpriority").agg(
        _dec_to_double(F.sum("rev_d")).alias("revenue"),
        F.sum("n").alias("n_orders"),
    )


SQL_RETRACT_IVM = """
SELECT o_orderpriority,
  CAST(CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                          THEN o_totalprice + 10.0
                          ELSE o_totalprice END AS DECIMAL(18,6)))
       AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# ===========================================================================
# Q: seasonality_dow — day-of-week seasonal index in exact ppm
# ===========================================================================
#
# index = (mean of the weekday) / (overall mean), emitted as
# ⌊1e6 · (sum_dow · n_total) / (n_dow · sum_total)⌋. The cross
# products exceed int64 at scale, so they form in DECIMAL(38,0) /
# HUGEINT; one integer division emits ppm. Pure two-level partial
# aggregation — no window, no second scan.

def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("weekday(to_date(ts)) + 1").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).alias("y"),
    )
    per_dow = ev.groupBy("event_type", "dow").agg(
        F.sum("y").alias("s_dow"), F.count(F.lit(1)).alias("n_dow")
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum("y").alias("s_total"), F.count(F.lit(1)).alias("n_total")
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    j = per_dow.join(F.broadcast(per_type), "event_type")
    return j.select(
        "event_type",
        "dow",
        F.col("n_dow").alias("n"),
        (d38("s_dow") * d38("n_total") * F.lit(1000000).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_num"),
        (d38("n_dow") * d38("s_total")).cast("decimal(38,0)").alias("_den"),
    ).select(
        "event_type",
        "dow",
        "n",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("index_ppm"),
    )


SQL_SEASONALITY_DOW = """
WITH ev AS (
  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
),
per_dow AS (
  SELECT event_type, dow, CAST(SUM(y) AS HUGEINT) AS s_dow, COUNT(*) AS n_dow
  FROM ev GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, CAST(SUM(y) AS HUGEINT) AS s_total, COUNT(*) AS n_total
  FROM ev GROUP BY 1
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, n_dow AS n,
  CAST((s_dow * n_total * 1000000) // (n_dow * s_total) AS BIGINT) AS index_ppm
FROM per_dow JOIN per_type USING (event_type)
"""


# ===========================================================================
# Q: fifo_match — FIFO inventory matching via cumulative-interval overlap
# ===========================================================================
#
# The classic cost-accounting kernel: issues consume receipts in FIFO
# order. Expressed set-at-a-time (no per-row loop): each receipt/issue
# owns the half-open interval [cum − qty, cum) of its part's running
# total, and a receipt funds an issue iff their intervals overlap —
# matched qty = min(ends) − max(starts). The join is an equi-join on
# partkey with interval predicates; per-part streams are bounded
# (lineitems per part), so the pairing stays local to a hash
# partition. All integer arithmetic (TPC-H quantities are integral).

def q_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        (F.col("l_orderkey") % 2 == 0).alias("is_receipt"),
    )
    # the synthetic corpus duplicates (l_orderkey, l_linenumber) up to
    # 3x; adding qty to the order makes remaining ties interchangeable
    # (only qty feeds the cumulative interval), so cend is engine-stable
    m = fifo_match(
        base,
        group="l_partkey",
        qty="qty",
        order=("l_orderkey", "l_linenumber", "qty"),
        receipt_flag="is_receipt",
    )
    return m.select(
        F.col("l_partkey").alias("partkey"),
        F.col("r_l_orderkey").alias("r_order"),
        F.col("r_l_linenumber").alias("r_line"),
        F.col("i_l_orderkey").alias("i_order"),
        F.col("i_l_linenumber").alias("i_line"),
        "qty_matched",
    )


SQL_FIFO_MATCH = """
WITH base AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
    CAST(l_quantity AS BIGINT) AS qty,
    l_orderkey % 2 = 0 AS is_receipt
  FROM lineitem
),
r AS (
  SELECT l_partkey, l_orderkey, l_linenumber, qty,
    SUM(qty) OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber, qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend
  FROM base WHERE is_receipt
),
i AS (
  SELECT l_partkey, l_orderkey, l_linenumber, qty,
    SUM(qty) OVER (PARTITION BY l_partkey ORDER BY l_orderkey, l_linenumber, qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cend
  FROM base WHERE NOT is_receipt
)
SELECT r.l_partkey AS partkey,
  r.l_orderkey AS r_order, r.l_linenumber AS r_line,
  i.l_orderkey AS i_order, i.l_linenumber AS i_line,
  CAST(LEAST(r.cend, i.cend) - GREATEST(r.cend - r.qty, i.cend - i.qty) AS BIGINT)
    AS qty_matched
FROM r JOIN i ON r.l_partkey = i.l_partkey
  AND r.cend - r.qty < i.cend AND i.cend - i.qty < r.cend
"""


# ===========================================================================
# Q: rolling_active_users — trailing-7-day distinct users (WAU) per day
# ===========================================================================
#
# Distinct-count over a sliding window can't ride a running-sum
# window (distinct doesn't decompose); the scale shape is the
# bounded-fanout EXPLODE: each (day, user) pair contributes itself to
# the 7 target days it is visible from (sequence explode, fanout
# exactly 7), then one hash aggregation counts distincts per target
# day. No range join, no per-day rescan; stickiness = DAU/WAU in
# exact ppm.

def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct().withColumnRenamed("day", "target_day")
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("target_day"),
        "user_id",
    )
    wau = (
        contrib.join(F.broadcast(days), "target_day")
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("target_day", "day")
    )
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.expr("(dau * 1000000) DIV wau").alias("stickiness_ppm"),
    )


SQL_ROLLING_ACTIVE_USERS = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT du.day + CAST(x AS INTEGER) AS target_day, du.user_id
  FROM du, UNNEST(range(0, 7)) AS t(x)
),
wau AS (
  SELECT c.target_day AS day, COUNT(DISTINCT c.user_id) AS wau
  FROM contrib c JOIN days d ON c.target_day = d.day
  GROUP BY 1
),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1)
SELECT day, dau, wau, CAST((dau * 1000000) // wau AS BIGINT) AS stickiness_ppm
FROM dau JOIN wau USING (day)
"""


# ===========================================================================
# Q: typo_pairs — edit-distance≤1 similarity join via deletion variants
# ===========================================================================
#
# The FastSS trick: dist(a,b) ≤ 1 ⇔ their deletion neighborhoods
# {w} ∪ {w minus one char} intersect, so the all-pairs fuzzy match
# becomes an EQUI-join on the variant string with bounded fanout
# (len+1 variants per string) — never a cross join, never a
# per-pair distance matrix. The native levenshtein() filter then
# certifies candidates exactly (identical unit-cost definition on
# both engines). Same-variant collisions can generate a candidate
# pair twice (repeated characters), hence the DISTINCT before the
# certificate. Record-linkage shape: customer keys differing in one
# character.

def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        _t(spark, sf_dir, "customer")
        .select(F.lower("c_name").alias("word"))
        .distinct()
    )
    v = w.select(
        "word",
        F.explode(
            F.concat(
                F.array(F.col("word")),
                F.expr(
                    "transform(sequence(0, length(word) - 1), i -> "
                    "concat(substring(word, 1, i), substring(word, i + 2, 100000)))"
                ),
            )
        ).alias("var"),
    )
    a = v.select(F.col("word").alias("w1"), "var")
    b = v.select(F.col("word").alias("w2"), "var")
    cand = (
        a.join(b, "var")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("w1", "w2")).filter(
        F.col("dist") <= 1
    )


SQL_TYPO_PAIRS = """
WITH w AS (SELECT DISTINCT lower(c_name) AS word FROM customer),
v AS (
  SELECT word, unnest(list_prepend(word,
    list_transform(range(0, length(word)), i ->
      substr(word, 1, i) || substr(word, i + 2)))) AS var
  FROM w
),
cand AS (
  SELECT DISTINCT a.word AS w1, b.word AS w2
  FROM v a JOIN v b ON a.var = b.var AND a.word < b.word
)
SELECT w1, w2, CAST(levenshtein(w1, w2) AS INTEGER) AS dist
FROM cand WHERE levenshtein(w1, w2) <= 1
"""


PATTERN_QUERIES = {
    "proration": (
        q_proration,
        SQL_PRORATION,
        "finance:largest-remainder allocation",
    ),
    "activity_streaks": (
        q_activity_streaks,
        SQL_ACTIVITY_STREAKS,
        "analytics:gaps-and-islands streaks",
    ),
    "regression_trend": (
        q_regression_trend,
        SQL_REGRESSION_TREND,
        "analytics:per-group OLS trend",
    ),
    "last_touch_attribution": (
        q_last_touch_attribution,
        SQL_LAST_TOUCH_ATTRIBUTION,
        "analytics:last-touch attribution",
    ),
    "bfs_levels": (q_bfs_levels, SQL_BFS_LEVELS, "graph:SSSP hop levels"),
    "cusum_changepoint": (
        q_cusum_changepoint,
        SQL_CUSUM_CHANGEPOINT,
        "timeseries:CUSUM mean-shift detection",
    ),
    "retract_ivm": (
        q_retract_ivm,
        SQL_RETRACT_IVM,
        "ivm:retraction algebra",
    ),
    "seasonality_dow": (
        q_seasonality_dow,
        SQL_SEASONALITY_DOW,
        "timeseries:day-of-week seasonal index",
    ),
    "fifo_match": (
        q_fifo_match,
        SQL_FIFO_MATCH,
        "finance:FIFO inventory matching",
    ),
    "rolling_active_users": (
        q_rolling_active_users,
        SQL_ROLLING_ACTIVE_USERS,
        "analytics:rolling WAU / stickiness",
    ),
    "typo_pairs": (
        q_typo_pairs,
        SQL_TYPO_PAIRS,
        "linkage:deletion-neighborhood fuzzy join",
    ),
}
