"""Ninth-pass queries: distribution-drift and reliability analytics.
Each fills a capability pocket the earlier passes left open:

- ``benford_digits`` — fraud/quality screening: the first-significant-
  digit distribution of order totals vs Benford's law, with the
  chi-square contribution per digit in EXACT scaled integers. The
  digit comes from the cents value's decimal string (never from
  log10, which is not correctly-rounded and can flip at power-of-ten
  boundaries); the expected ppm weights are literals summing to
  exactly 1e6, so exp/obs cross products ride DECIMAL(38,0)/HUGEINT.
- ``ks_drift`` — two-sample Kolmogorov–Smirnov distance between the
  'view' and 'click' value distributions, cross-multiplied to the
  exact integer statistic max|c1·n2 − c2·n1|. The global CDFs come
  from the NEW ``operators/robust.global_cumsum`` (RangePartitioner
  pattern: ranged layout + driver prefix offsets over per-partition
  totals) — no partition-less Window anywhere.
- ``hazard_table`` — discrete-time survival: for the signup cohort
  fully observable over a 7-day horizon, the number at risk, failures
  (first 'error' after signup), and hazard in exact ppm per day
  since signup. The at-risk series needs a prefix sum over 7 rows —
  done with a fanout explode (each failure day decrements every
  LATER day's risk set), not a degenerate global window.
- ``interarrival_hist`` — inter-event gap distribution per log2
  bucket. The bucket is ``length(bin(gap))`` — the binary-string
  length is exactly floor(log2)+1 with pure integer semantics on
  both engines, dodging float log2 at power-of-two boundaries.

Reference surface: the reference runs its count-reconciliation and
price-sanity screens as ClickHouse SQL + pandas assertions
(``coinprice/pricing_checks.py``, ``clickhouse/v1/operator.py:440-499``);
these extend that validation tier with the statistical screens a
100 TB ingest actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.robust import global_cumsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


def _d38(c):
    return (c if not isinstance(c, str) else F.col(c)).cast("decimal(38,0)")


# ===========================================================================
# Q: benford_digits — first-digit law screening with exact chi² terms
# ===========================================================================

# floor(1e6 * log10(1 + 1/d) + 0.5) for d = 1..9; sums to exactly 1e6.
_BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = o.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    # total order count: bounded 1-row pull, inlined as a literal so no
    # 1-row join enters the plan
    n = _t(spark, sf_dir, "orders").count()
    arr = "array({})".format(", ".join(str(p) for p in _BENFORD_PPM))
    exp_micro = _d38(F.lit(n)) * _d38(F.expr(f"element_at({arr}, digit)"))
    diff = _d38("obs") * _d38(F.lit(1000000)) - exp_micro
    return obs.select(
        "digit",
        "obs",
        F.expr(f"element_at({arr}, digit)").cast("long").alias("exp_ppm"),
        (diff * diff)
        .cast("decimal(38,0)")
        .alias("_num"),
        exp_micro.alias("_den"),
    ).select(
        "digit",
        "obs",
        "exp_ppm",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("chi_contrib_micro"),
    )


SQL_BENFORD_DIGITS = """
WITH o AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
obs AS (SELECT digit, COUNT(*) AS obs FROM o GROUP BY 1),
t AS (SELECT COUNT(*) AS n FROM orders),
e AS (
  SELECT digit, obs,
    ([301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757])[digit]
      AS exp_ppm,
    CAST(n AS HUGEINT)
      * ([301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757])[digit]
      AS exp_micro
  FROM obs, t
)
SELECT digit, obs, CAST(exp_ppm AS BIGINT) AS exp_ppm,
  CAST((CAST(obs AS HUGEINT) * 1000000 - exp_micro)
       * (CAST(obs AS HUGEINT) * 1000000 - exp_micro)
       // exp_micro AS BIGINT) AS chi_contrib_micro
FROM e
"""


# ===========================================================================
# Q: ks_drift — exact two-sample KS distance between value distributions
# ===========================================================================

def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            F.floor(F.col("value") * 100).alias("v"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("d1"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("d2"),
        )
    )
    g = ev.groupBy("v").agg(F.sum("d1").alias("d1"), F.sum("d2").alias("d2"))
    cum = global_cumsum(g, order=("v",), cols=("d1", "d2"))
    # totals read the RANGED frame global_cumsum already persisted (cum
    # keeps the raw d1/d2 columns), not g — reading g here re-ran the
    # whole events scan + groupBy a second time just to count (r13)
    tot = cum.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2")).collect()[0]
    if not tot["n1"] or not tot["n2"]:
        raise ValueError(
            "ks_drift: both samples must be non-empty "
            f"(n1={tot['n1']}, n2={tot['n2']})"
        )
    n1, n2 = int(tot["n1"]), int(tot["n2"])
    stat = _d38(F.col("cum_d1")) * _d38(F.lit(n2)) - _d38(F.col("cum_d2")) * _d38(
        F.lit(n1)
    )
    return (
        cum.agg(F.max(F.abs(stat)).cast("decimal(38,0)").alias("_ks"))
        .select(
            F.lit(n1).cast("long").alias("n1"),
            F.lit(n2).cast("long").alias("n2"),
            F.expr("CAST(_ks AS BIGINT)").alias("ks_scaled"),
            F.expr(
                "CAST((_ks * 1000000) DIV"
                f" (CAST({n1} AS DECIMAL(38,0)) * CAST({n2} AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("ks_ppm"),
        )
    )


SQL_KS_DRIFT = """
WITH ev AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v,
    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS d1,
    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS d2
  FROM events WHERE event_type IN ('view', 'click')
),
g AS (SELECT v, SUM(d1) AS d1, SUM(d2) AS d2 FROM ev GROUP BY 1),
c AS (
  SELECT v,
    SUM(d1) OVER (ORDER BY v) AS cum1,
    SUM(d2) OVER (ORDER BY v) AS cum2
  FROM g
),
t AS (SELECT CAST(SUM(d1) AS HUGEINT) AS n1, CAST(SUM(d2) AS HUGEINT) AS n2
      FROM g)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
  CAST(MAX(ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1))
       AS BIGINT) AS ks_scaled,
  CAST(MAX(ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1))
       * 1000000 // (n1 * n2) AS BIGINT) AS ks_ppm
FROM c, t GROUP BY n1, n2
"""


# ===========================================================================
# Q: hazard_table — discrete 7-day hazard for the signup cohort
# ===========================================================================

_COHORT_CUTOFF = "2024-01-24 00:00:00"  # signup + full 7-day horizon ≤ corpus end
_HORIZON = 7


def q_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .filter(F.col("t0") <= F.lit(_COHORT_CUTOFF).cast("timestamp_ntz"))
    )
    fe = (
        ev.filter(F.col("event_type") == "error")
        .join(u, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tf"), F.min("t0").alias("t0"))
    )
    d = (
        fe.select(
            F.expr(
                "(CAST(CAST(tf AS TIMESTAMP) AS BIGINT)"
                " - CAST(CAST(t0 AS TIMESTAMP) AS BIGINT)) div 86400"
            ).alias("k")
        )
        .filter(F.col("k") < _HORIZON)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # cohort size: bounded 1-row pull inlined as a literal
    n_cohort = u.count()
    # at-risk prefix via fanout explode: a failure on day j leaves the
    # risk set of every LATER day — no global window over the 7-row frame
    removed = (
        d.filter(F.col("k") < _HORIZON - 1)
        .select(
            F.explode(
                F.sequence(F.col("k") + 1, F.lit(_HORIZON - 1))
            ).alias("k2"),
            "d",
        )
        .groupBy("k2")
        .agg(F.sum("d").alias("removed"))
    )
    spine = spark.range(_HORIZON).select(F.col("id").alias("k"))
    return (
        spine.join(F.broadcast(d), "k", "left")
        .join(
            F.broadcast(removed.withColumnRenamed("k2", "k")), "k", "left"
        )
        .select(
            "k",
            F.coalesce(F.col("d"), F.lit(0)).alias("failures"),
            (F.lit(n_cohort) - F.coalesce(F.col("removed"), F.lit(0))).alias(
                "n_at_risk"
            ),
        )
        .select(
            "k",
            "failures",
            "n_at_risk",
            F.when(
                F.col("n_at_risk") > 0,
                F.expr("(failures * 1000000) DIV n_at_risk"),
            )
            .otherwise(F.lit(0))
            .alias("hazard_ppm"),
        )
    )


SQL_HAZARD_TABLE = """
WITH u AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'signup'
  GROUP BY 1 HAVING MIN(ts) <= TIMESTAMP '2024-01-24 00:00:00'
),
fe AS (
  SELECT e.user_id, MIN(e.ts) AS tf, MIN(u.t0) AS t0
  FROM events e JOIN u ON e.user_id = u.user_id
  WHERE e.event_type = 'error' AND e.ts > u.t0
  GROUP BY 1
),
d AS (
  -- integer subtraction BEFORE the // : DuckDB's // on DOUBLE operands
  -- rounds (221521.0 // 86400 = 3), BIGINT // truncates like Spark's div
  SELECT (CAST(floor(epoch(tf)) AS BIGINT)
          - CAST(floor(epoch(t0)) AS BIGINT)) // 86400 AS k,
    COUNT(*) AS d
  FROM fe
  WHERE (CAST(floor(epoch(tf)) AS BIGINT)
         - CAST(floor(epoch(t0)) AS BIGINT)) // 86400 < 7
  GROUP BY 1
),
spine AS (SELECT CAST(x AS BIGINT) AS k FROM UNNEST(range(0, 7)) AS t(x)),
n AS (SELECT COUNT(*) AS n_cohort FROM u),
cum AS (
  SELECT s.k,
    COALESCE(d.d, 0) AS failures,
    COALESCE(SUM(COALESCE(d.d, 0)) OVER (ORDER BY s.k
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS removed
  FROM spine s LEFT JOIN d ON s.k = d.k
)
SELECT k, CAST(failures AS BIGINT) AS failures,
  CAST(n_cohort - removed AS BIGINT) AS n_at_risk,
  CAST(CASE WHEN n_cohort - removed > 0
       THEN (failures * 1000000) // (n_cohort - removed) ELSE 0 END AS BIGINT)
    AS hazard_ppm
FROM cum, n
"""


# ===========================================================================
# Q: interarrival_hist — inter-event gap distribution per log2 bucket
# ===========================================================================

def q_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn(
            "gap",
            F.col("ts").cast("timestamp").cast("long")
            - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        gaps.select(
            F.length(F.bin(F.col("gap"))).cast("long").alias("bucket"), "gap"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("gap").alias("min_gap"),
            F.max("gap").alias("max_gap"),
        )
    )


SQL_INTERARRIVAL_HIST = """
WITH g AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT)
       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT CAST(length(bin(gap)) AS BIGINT) AS bucket, COUNT(*) AS n,
  MIN(gap) AS min_gap, MAX(gap) AS max_gap
FROM g WHERE gap IS NOT NULL
GROUP BY 1
"""


DRIFT_QUERIES = {
    "benford_digits": (
        q_benford_digits,
        SQL_BENFORD_DIGITS,
        "quality:Benford first-digit screening",
    ),
    "ks_drift": (
        q_ks_drift,
        SQL_KS_DRIFT,
        "quality:two-sample KS drift",
    ),
    "hazard_table": (
        q_hazard_table,
        SQL_HAZARD_TABLE,
        "analytics:discrete-time hazard",
    ),
    "interarrival_hist": (
        q_interarrival_hist,
        SQL_INTERARRIVAL_HIST,
        "timeseries:inter-arrival log2 histogram",
    ),
}
