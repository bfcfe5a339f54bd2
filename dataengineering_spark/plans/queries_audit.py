"""Twelfth-pass queries: integrity and decision-audit analytics.
Each fills a capability pocket the earlier passes left open:

- ``referential_audit`` — one-query referential-integrity census
  across the star schema's five FK edges: child rows, orphans
  (child key with no parent), orphan rate in exact ppm. Dimension
  parents ride broadcast joins; the fact-fact edge
  (lineitem→orders) is a keyed shuffle join. The V-tier (quality/
  checks.py) validates counts per load; this is the whole-schema
  audit a lakehouse runs nightly.
- ``simpson_audit`` — stratification audit: conversion-rate
  difference between two user groups, pooled AND per weekday
  stratum, flagging strata whose direction REVERSES the pooled
  conclusion (Simpson's paradox). All comparisons are integer
  cross-multiplications — sign(p0·n1 − p1·n0) — so both engines
  rank identical int64s; pooled totals are a bounded 1-row pull
  inlined as literals.
- ``sla_percentiles`` — order-to-first-ship latency (days) discrete
  percentiles p50/p90/p99 per order priority via the wide
  rank-assembly percentile operator — the SLA-compliance shape that
  would otherwise be a skewed 5-partition window.

Reference surface: the reference's validation tier greps counts and
prices (``coinprice/pricing_checks.py``, ``clickhouse/v1/operator.py:
440-499``); these extend it to schema-wide and decision-audit checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.robust import discrete_pcts_counted


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: referential_audit — FK orphan census across the star schema
# ===========================================================================

_FK_EDGES = (
    # (label, child, fk, parent, pk, parent_is_dim)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", True),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", True),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", True),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", True),
)


def q_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for label, child, fk, parent, pk, is_dim in _FK_EDGES:
        c = _t(spark, sf_dir, child).select(fk)
        p = _t(spark, sf_dir, parent).select(pk).distinct()
        if is_dim:
            p = F.broadcast(p)
        row = (
            c.join(p, c[fk] == p[pk], "left")
            .agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.count(F.when(F.col(pk).isNull(), 1)).alias("orphans"),
            )
            .select(
                F.lit(label).alias("edge"),
                "child_rows",
                "orphans",
                # empty child table → 0 ppm, not a divide-by-zero
                F.coalesce(
                    F.expr(
                        "(orphans * 1000000) DIV nullif(child_rows, 0)"
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


SQL_REFERENTIAL_AUDIT = """
SELECT 'lineitem->orders' AS edge, COUNT(*) AS child_rows,
  COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS orphans,
  CAST(COALESCE((COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) * 1000000)
       // NULLIF(COUNT(*), 0), 0) AS BIGINT) AS orphan_ppm
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem->part', COUNT(*),
  COUNT(*) FILTER (WHERE p.p_partkey IS NULL),
  CAST(COALESCE((COUNT(*) FILTER (WHERE p.p_partkey IS NULL) * 1000000)
       // NULLIF(COUNT(*), 0), 0) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem->supplier', COUNT(*),
  COUNT(*) FILTER (WHERE s.s_suppkey IS NULL),
  CAST(COALESCE((COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) * 1000000)
       // NULLIF(COUNT(*), 0), 0) AS BIGINT)
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'orders->customer', COUNT(*),
  COUNT(*) FILTER (WHERE c.c_custkey IS NULL),
  CAST(COALESCE((COUNT(*) FILTER (WHERE c.c_custkey IS NULL) * 1000000)
       // NULLIF(COUNT(*), 0), 0) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer->nation', COUNT(*),
  COUNT(*) FILTER (WHERE n.n_nationkey IS NULL),
  CAST(COALESCE((COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) * 1000000)
       // NULLIF(COUNT(*), 0), 0) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# ===========================================================================
# Q: simpson_audit — pooled-vs-stratified rate-direction audit
# ===========================================================================

def q_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.expr("weekday(to_date(ts)) + 1").alias("stratum"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    per = ev.groupBy("stratum").agg(
        F.sum(F.when(F.col("grp") == 0, 1)).alias("n0"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv"))).alias("p0"),
        F.sum(F.when(F.col("grp") == 1, 1)).alias("n1"),
        F.sum(F.when(F.col("grp") == 1, F.col("conv"))).alias("p1"),
    )
    # pooled totals: bounded 1-row pull, inlined as literals
    tot = per.agg(
        F.sum("n0").alias("N0"),
        F.sum("p0").alias("P0"),
        F.sum("n1").alias("N1"),
        F.sum("p1").alias("P1"),
    ).collect()[0]
    if not tot["N0"] or not tot["N1"]:
        raise ValueError("simpson_audit: a group is empty")
    pooled_sign_val = (tot["P0"] or 0) * tot["N1"] - (tot["P1"] or 0) * tot["N0"]
    pooled_sign_val = (pooled_sign_val > 0) - (pooled_sign_val < 0)
    s_sign = F.signum(
        F.col("p0") * F.col("n1") - F.col("p1") * F.col("n0")
    ).cast("int")
    return per.select(
        "stratum",
        "n0",
        "p0",
        "n1",
        "p1",
        F.expr("(p0 * 1000000) DIV n0").alias("rate0_ppm"),
        F.expr("(p1 * 1000000) DIV n1").alias("rate1_ppm"),
        s_sign.alias("stratum_sign"),
        F.lit(pooled_sign_val).cast("int").alias("pooled_sign"),
        F.when(
            (s_sign != 0) & (s_sign != F.lit(pooled_sign_val)), 1
        )
        .otherwise(0)
        .alias("reversal"),
    )


SQL_SIMPSON_AUDIT = """
WITH ev AS (
  SELECT CAST(user_id % 2 AS INT) AS grp,
    isodow(CAST(ts AS DATE)) AS stratum,
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
  FROM events
),
per AS (
  SELECT stratum,
    SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0,
    SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS p0,
    SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1,
    SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS p1
  FROM ev GROUP BY 1
),
tot AS (SELECT SUM(n0) AS tn0, SUM(p0) AS tp0, SUM(n1) AS tn1, SUM(p1) AS tp1
        FROM per)
SELECT CAST(stratum AS BIGINT) AS stratum,
  CAST(n0 AS BIGINT) AS n0, CAST(p0 AS BIGINT) AS p0,
  CAST(n1 AS BIGINT) AS n1, CAST(p1 AS BIGINT) AS p1,
  CAST((p0 * 1000000) // n0 AS BIGINT) AS rate0_ppm,
  CAST((p1 * 1000000) // n1 AS BIGINT) AS rate1_ppm,
  CAST(sign(p0 * n1 - p1 * n0) AS INT) AS stratum_sign,
  CAST(sign(tp0 * tn1 - tp1 * tn0) AS INT) AS pooled_sign,
  CAST(CASE WHEN sign(p0 * n1 - p1 * n0) <> 0
         AND sign(p0 * n1 - p1 * n0) <> sign(tp0 * tn1 - tp1 * tn0)
       THEN 1 ELSE 0 END AS INT) AS reversal
FROM per, tot
"""


# ===========================================================================
# Q: sla_percentiles — order-to-first-ship latency percentiles by priority
# ===========================================================================

def q_sla_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_ship = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min("l_shipdate").alias("first_ship"))
    )
    lat = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("first_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("lat_days"),
            "o_orderkey",
        )
    )
    # lat_days is calendar-bounded (a few hundred distinct values at
    # ANY scale), so the counted-distribution percentile applies: one
    # exchange of (priority, lat_days) partial counts replaces the
    # ranked formulation's range exchange + two full-data window
    # passes. Identical percentile_disc values by construction (the
    # tie column only ordered rows, never changed the selected value).
    return discrete_pcts_counted(
        lat.select("o_orderpriority", "lat_days"),
        key="o_orderpriority",
        val="lat_days",
        pcts=(0.5, 0.9, 0.99),
        names=("p50", "p90", "p99"),
    )


SQL_SLA_PERCENTILES = """
WITH fs AS (
  SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem GROUP BY 1
),
lat AS (
  SELECT o.o_orderpriority, o.o_orderkey,
    CAST(CAST(fs.first_ship AS DATE) - CAST(o.o_orderdate AS DATE) AS BIGINT)
      AS lat_days
  FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
),
rk AS (
  SELECT o_orderpriority, lat_days,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY lat_days, o_orderkey) AS rn,
    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM lat
)
SELECT o_orderpriority,
  MAX(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN lat_days END) AS p50,
  MAX(CASE WHEN rn = floor(0.9 * (n - 1)) + 1 THEN lat_days END) AS p90,
  MAX(CASE WHEN rn = floor(0.99 * (n - 1)) + 1 THEN lat_days END) AS p99
FROM rk GROUP BY 1
"""


AUDIT_QUERIES = {
    "referential_audit": (
        q_referential_audit,
        SQL_REFERENTIAL_AUDIT,
        "quality:FK orphan census",
    ),
    "simpson_audit": (
        q_simpson_audit,
        SQL_SIMPSON_AUDIT,
        "quality:Simpson-paradox stratification audit",
    ),
    "sla_percentiles": (
        q_sla_percentiles,
        SQL_SLA_PERCENTILES,
        "analytics:order-to-ship SLA percentiles",
    ),
}
