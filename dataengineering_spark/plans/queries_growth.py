"""Eleventh-pass queries: growth/revenue accounting. Each fills a
capability pocket the earlier passes left open:

- ``growth_accounting`` — the canonical weekly growth ledger: each
  week's active users decompose into new (first-ever week), retained
  (also active the previous week), and resurrected (active before,
  inactive last week); churned counts last week's actives who went
  silent. Pure distinct-frame equi/anti-joins on (user, week) — no
  windows, no sequential state; the invariant active = new +
  retained + resurrected is checked by the oracle hash.
- ``ltv_cohorts`` — cohort lifetime-value matrix: revenue (micro
  units, exact) per signup-cohort week × age-in-weeks, with the
  running cumulative LTV along each cohort row. The cumulative window
  partitions by cohort over the cohort×age aggregate — a
  domain-bounded frame (weeks², not rows).
- ``lorenz_8020`` — revenue concentration (the "80/20" audit): parts
  ranked by revenue descending, the Lorenz-curve points at the top
  1/5/20/50% part-count thresholds, each as exact ppm of total
  revenue. Global revenue CDF via the RangePartitioner-pattern
  ``global_cumsum``; thresholds via ceil-division on integers.

Reference surface: the reference ships these as ClickHouse SQL rollups
through the generic execute operator
(``clickhouse/v1/operator.py:440-499``); re-expressed as distributed
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.robust import global_cumsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: growth_accounting — weekly new / retained / resurrected / churned
# ===========================================================================

def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.caching import persist_tracked

    # Every per-(user, week) flag is a fact about the USER's week set:
    # new = first week, retained = week-7 also active, resurrected =
    # the rest. So collect each user's distinct weeks ONCE (map-side
    # partial collect_set dedups before the exchange — the separate
    # distinct() pass the pre-r13 shape paid is folded into the same
    # shuffle) and derive all three flags from the array. This replaces
    # the old 5-exchange shape (distinct on (user, week), groupBy(user)
    # for first_week, a user-keyed join, a (week, user)-keyed left join
    # against the shifted copy, then groupBy(week)) with exactly TWO
    # exchanges: hash(user_id), then hash(week) over per-week partials.
    # The weeks-per-user array is calendar-bounded (one element per
    # active week), never data-bounded.
    per_user = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("week"),
        )
        .groupBy("user_id")
        .agg(
            F.collect_set("week").alias("_weeks"),
            # collect_set drops NULLs; the old distinct() kept AT MOST
            # ONE (user, NULL) row per null-week user — a 0/1 flag, not
            # an event count. The explode below re-materializes it (the
            # all-zero-flag NULL week group, same as before).
            F.max(F.col("week").isNull()).cast("long").alias("_n_null"),
        )
    )
    # array_min in its own projection BELOW the explode (generator
    # staging: scalars in the same select re-evaluate per exploded row)
    staged = per_user.select(
        F.array_min("_weeks").alias("_first_week"),
        # membership tests read the CLEAN set (array_contains over a
        # null-bearing array yields NULL for misses, not false)
        F.col("_weeks"),
        F.concat(
            F.col("_weeks"),
            F.array_repeat(
                F.lit(None).cast("date"), F.col("_n_null").cast("int")
            ),
        ).alias("_padded"),
    )
    flags = staged.select(
        "_first_week",
        "_weeks",
        F.explode("_padded").alias("week"),
    ).select(
        "week",
        F.when(F.col("week") == F.col("_first_week"), 1)
        .otherwise(0)
        .alias("is_new"),
        F.when(
            (F.col("week") != F.col("_first_week"))
            & F.array_contains(F.col("_weeks"), F.date_sub("week", 7)),
            1,
        )
        .otherwise(0)
        .alias("is_retained"),
        F.when(
            (F.col("week") != F.col("_first_week"))
            & ~F.array_contains(F.col("_weeks"), F.date_sub("week", 7)),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
    )
    # persist the ~#weeks-row result so the churned self-join below
    # reads it instead of re-running the whole events pipeline (the
    # broadcast side cannot reuse the shuffle exchange)
    flagged = persist_tracked(
        flags.groupBy("week").agg(
            F.count(F.lit(1)).alias("active"),
            F.sum("is_new").alias("new_users"),
            F.sum("is_retained").alias("retained"),
            F.sum("is_resurrected").alias("resurrected"),
        )
    )
    # churned(w) = active(w-7) − retained(w): last week's actives who
    # did not return
    prev_active = flagged.select(
        F.date_add("week", 7).alias("week"),
        F.col("active").alias("_prev_active"),
    )
    return (
        flagged.join(F.broadcast(prev_active), "week", "left")
        .select(
            "week",
            "active",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce(F.col("_prev_active") - F.col("retained"), F.lit(0))
            .cast("long")
            .alias("churned"),
        )
    )


SQL_GROWTH_ACCOUNTING = """
WITH aw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
first AS (SELECT user_id, MIN(week) AS first_week FROM aw GROUP BY 1),
flagged AS (
  SELECT a.week,
    CASE WHEN a.week = f.first_week THEN 1 ELSE 0 END AS is_new,
    CASE WHEN a.week <> f.first_week AND p.user_id IS NOT NULL
         THEN 1 ELSE 0 END AS is_retained,
    CASE WHEN a.week <> f.first_week AND p.user_id IS NULL
         THEN 1 ELSE 0 END AS is_resurrected
  FROM aw a
  JOIN first f ON a.user_id = f.user_id
  LEFT JOIN aw p ON p.user_id = a.user_id AND p.week + 7 = a.week
),
g AS (
  SELECT week, COUNT(*) AS active, SUM(is_new) AS new_users,
    SUM(is_retained) AS retained, SUM(is_resurrected) AS resurrected
  FROM flagged GROUP BY 1
)
SELECT g.week, CAST(g.active AS BIGINT) AS active,
  CAST(g.new_users AS BIGINT) AS new_users,
  CAST(g.retained AS BIGINT) AS retained,
  CAST(g.resurrected AS BIGINT) AS resurrected,
  CAST(COALESCE(pg.active - g.retained, 0) AS BIGINT) AS churned
FROM g LEFT JOIN g pg ON pg.week + 7 = g.week
"""


# ===========================================================================
# Q: ltv_cohorts — cohort-week × age-week revenue matrix with running LTV
# ===========================================================================

def q_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cohort = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort"))
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("week"),
            F.floor(F.col("value") * 1e6 + F.lit(0.5)).alias("v"),
        )
        .join(cohort, "user_id")
        .select(
            "cohort",
            F.expr("datediff(week, cohort) div 7").alias("age_weeks"),
            "v",
        )
        .groupBy("cohort", "age_weeks")
        .agg(F.sum("v").alias("rev_micro"))
    )
    w = Window.partitionBy("cohort").orderBy("age_weeks")
    return rev.select(
        "cohort",
        "age_weeks",
        "rev_micro",
        F.sum("rev_micro").over(w).alias("ltv_micro"),
    )


SQL_LTV_COHORTS = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY 1
),
rev AS (
  SELECT c.cohort,
    (CAST(date_trunc('week', e.ts) AS DATE) - c.cohort) // 7 AS age_weeks,
    CAST(SUM(CAST(floor(e.value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rev_micro
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT cohort, CAST(age_weeks AS BIGINT) AS age_weeks, rev_micro,
  CAST(SUM(rev_micro) OVER (PARTITION BY cohort ORDER BY age_weeks)
       AS BIGINT) AS ltv_micro
FROM rev
"""


# ===========================================================================
# Q: lorenz_8020 — revenue concentration at part-count thresholds
# ===========================================================================

_LORENZ_PCT = (1, 5, 20, 50)


def q_lorenz_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).alias("r"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("r").alias("r"))
        # rank parts by revenue DESC; negate so the ascending-order
        # cumsum walks from the richest part down (ties by partkey)
        .select(F.col("l_partkey"), (-F.col("r")).alias("neg_r"), F.col("r"))
    )
    cum = global_cumsum(
        rev.withColumn("one", F.lit(1)),
        order=("neg_r", "l_partkey"),
        cols=("r", "one"),
    )
    # totals off the already-persisted CDF frame: 1-row bounded pull
    tot = cum.agg(
        F.max("cum_r").alias("total_r"), F.max("cum_one").alias("n_parts")
    ).collect()[0]
    if tot["n_parts"] is None or not tot["total_r"]:
        raise ValueError("lorenz_8020: empty revenue frame")
    total_r, n_parts = int(tot["total_r"]), int(tot["n_parts"])
    out = None
    for pct in _LORENZ_PCT:
        k = (n_parts * pct + 99) // 100  # ceil on positive ints only
        row = (
            cum.filter(F.col("cum_one") <= k)
            .agg(F.max("cum_r").alias("cr"))
            .select(
                F.lit(pct).cast("long").alias("top_pct"),
                F.lit(k).cast("long").alias("n_top_parts"),
                F.col("cr").alias("rev_cents"),
                F.expr(
                    f"CAST((cr * CAST(1000000 AS DECIMAL(38,0)))"
                    f" DIV CAST({total_r} AS DECIMAL(38,0)) AS BIGINT)"
                ).alias("rev_share_ppm"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


SQL_LORENZ_8020 = """
WITH rev AS (
  SELECT l_partkey,
    SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
      AS r
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT r,
    SUM(r) OVER (ORDER BY r DESC, l_partkey) AS cum_r,
    ROW_NUMBER() OVER (ORDER BY r DESC, l_partkey) AS rn
  FROM rev
),
t AS (SELECT CAST(SUM(r) AS HUGEINT) AS total_r, COUNT(*) AS n_parts FROM rev)
SELECT CAST(pct AS BIGINT) AS top_pct,
  CAST((n_parts * pct + 99) // 100 AS BIGINT) AS n_top_parts,
  CAST(MAX(cum_r) AS BIGINT) AS rev_cents,
  CAST((CAST(MAX(cum_r) AS HUGEINT) * 1000000) // total_r AS BIGINT)
    AS rev_share_ppm
FROM c, t, UNNEST([1, 5, 20, 50]) AS u(pct)
WHERE rn <= (n_parts * pct + 99) // 100
GROUP BY pct, n_parts, total_r
"""


GROWTH_QUERIES = {
    "growth_accounting": (
        q_growth_accounting,
        SQL_GROWTH_ACCOUNTING,
        "analytics:weekly growth ledger",
    ),
    "ltv_cohorts": (
        q_ltv_cohorts,
        SQL_LTV_COHORTS,
        "analytics:cohort LTV matrix",
    ),
    "lorenz_8020": (
        q_lorenz_8020,
        SQL_LORENZ_8020,
        "analytics:revenue concentration curve",
    ),
}
