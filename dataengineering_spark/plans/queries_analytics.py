"""Analytics queries beyond the reference's surface: pivots, rollups,
exact percentiles, per-group top-k, semi-joins — the query shapes a
team replacing the reference's ClickHouse-side SQL would reach for
next. All oracle-exact.

Determinism notes:
- percentiles are *discrete* (row-selected by integer index math,
  percentile_disc semantics) — interpolated percentiles differ in
  ulps across engines;
- set universes are emitted as sorted comma-joined strings, not
  arrays, so any value-hasher compares them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.functions.scalars import _dec_to_double, dsum
from dataengineering_spark.plans.queries import transfers_from_events, TRANSFERS_SQL
from dataengineering_spark.operators.windows import log_index

DSUM = "CAST(CAST(SUM(CAST({e} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, name, sf_dir)


# ===========================================================================
# Q: value_percentiles — exact discrete percentiles per event_type
# ===========================================================================

PCTS = (0.5, 0.9, 0.99)


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles without a per-group Window.

    The naive shape — ``Window.partitionBy(event_type)`` — shuffles
    every event into ~5 partitions, each a single task at scale.
    Instead, global ranks are computed distributed:

    1. per-group counts (tiny) → the target rank for each percentile;
    2. ``repartitionByRange`` over the sort key spreads each group
       across many ordered partitions; per-(partition, group) counts
       (tiny) prefix-summed give each partition's global rank offset;
    3. a Window partitioned by (partition-id, group) — cardinality
       partitions × groups, evenly spread — yields local ranks;
       global rank = offset + local rank;
    4. equi-select rows whose global rank hits a target, then a
       partial-combining groupBy folds them to one row per group.
    """
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    targets = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            *[
                (F.floor(F.lit(p) * (F.col("n") - 1)) + 1).alias(f"r{int(p * 100)}")
                for p in PCTS
            ],
        )
    )
    data = ev.repartitionByRange("event_type", "value", "event_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        data.groupBy("pid", "event_type")
        .agg(F.count(F.lit(1)).alias("pc"))
        .withColumn("off", F.coalesce(F.sum("pc").over(w_off), F.lit(0)))
        .select("pid", "event_type", "off")
    )
    w_local = Window.partitionBy("pid", "event_type").orderBy("value", "event_id")
    ranked = (
        data.withColumn("lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["pid", "event_type"])
        .withColumn("rn", F.col("off") + F.col("lrn"))
        .join(F.broadcast(targets), "event_type")
    )
    hits = ranked.filter(
        (F.col("rn") == F.col("r50"))
        | (F.col("rn") == F.col("r90"))
        | (F.col("rn") == F.col("r99"))
    )
    aggs = [
        F.max(
            F.when(F.col("rn") == F.col(f"r{int(p * 100)}"), F.col("value"))
        ).alias(f"p{int(p * 100)}")
        for p in PCTS
    ]
    return hits.groupBy("event_type").agg(*aggs)


SQL_VALUE_PERCENTILES = """
WITH ranked AS (
  SELECT event_type, value,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
  MAX(CASE WHEN rn = floor(0.5 * (n - 1)) + 1 THEN value END) AS p50,
  MAX(CASE WHEN rn = floor(0.9 * (n - 1)) + 1 THEN value END) AS p90,
  MAX(CASE WHEN rn = floor(0.99 * (n - 1)) + 1 THEN value END) AS p99
FROM ranked GROUP BY event_type
"""


# ===========================================================================
# Q: returns_rollup — ROLLUP grouping sets with grouping_id
# ===========================================================================

def q_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice", "sum_price"),
            F.grouping_id().alias("gid"),
        )
    )


SQL_RETURNS_ROLLUP = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  {DSUM.format(e='l_extendedprice')} AS sum_price,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ===========================================================================
# Q: user_event_pivot — wide pivot per user (A4 generalization)
# ===========================================================================

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(dsum("value"))
        .na.fill(0.0, list(EVENT_TYPES))
    )


SQL_USER_EVENT_PIVOT = (
    "SELECT user_id, "
    + ", ".join(
        "COALESCE(CAST(CAST(SUM(CASE WHEN event_type = '"
        + t
        + "' THEN CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE), 0.0) AS "
        + t
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


# ===========================================================================
# Q: topk_per_group — top-3 events by value per type (window top-k)
# ===========================================================================

def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
    )


SQL_TOPK_PER_GROUP = """
WITH r AS (
  SELECT event_type, event_id, value,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INT) AS rnk
  FROM events
)
SELECT event_type, rnk, event_id, value FROM r WHERE rnk <= 3
"""


# ===========================================================================
# Q: active_customers — left-semi join (EXISTS)
# ===========================================================================

def q_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000.0
    )
    return (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_mktsegment")
    )


SQL_ACTIVE_CUSTOMERS = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
"""


# ===========================================================================
# Q: log_index_desc — W1 with the {column: ascending} dict spec
# ===========================================================================

def q_log_index_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = transfers_from_events(_t(spark, sf_dir, "events"))
    out = log_index(
        tr,
        partition_by="transaction_id",
        sort_columns={"block_date_time": False, "transfer_id": True},
    )
    return out.select("transfer_id", "transaction_id", "log_index")


SQL_LOG_INDEX_DESC = f"""
WITH transfers AS ({TRANSFERS_SQL})
SELECT transfer_id, transaction_id,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY transaction_id
    ORDER BY block_date_time DESC, transfer_id ASC) AS INT) AS log_index
FROM transfers
"""


# ===========================================================================
# Q: user_type_universe — collect_set as deterministic sorted string
# ===========================================================================

def q_user_type_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "types"
        ),
        F.count_distinct("event_type").alias("n_types"),
    )


SQL_USER_TYPE_UNIVERSE = """
SELECT user_id,
  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
"""


# ===========================================================================
# Q: priority_line_counts — TPC-H Q12 shape: conditional counts over a
# fact⋈fact join (urgent/high vs other order priority per line status).
# ===========================================================================

def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_PRIORITY_LINE_COUNTS = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


# ===========================================================================
# Q: promo_revenue — TPC-H Q14 shape: conditional-revenue ratio. Both
# sums route through DECIMAL then divide in double, so the quotient is
# the same IEEE value on both engines.
# ===========================================================================

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo) / dsum(disc)).alias("promo_revenue_pct"),
            dsum(disc, "total_revenue"),
        )
    )


SQL_PROMO_REVENUE = f"""
SELECT
  100.0 * {DSUM.format(e="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
        / {DSUM.format(e='l_extendedprice * (1.0 - l_discount)')} AS promo_revenue_pct,
  {DSUM.format(e='l_extendedprice * (1.0 - l_discount)')} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
"""


# ===========================================================================
# Q: dormant_customers — TPC-H Q22 shape: scalar avg subquery (exact
# decimal-sum/count) + anti-join to orders + per-nation rollup. The
# scalar lands via a broadcast cross join, not a driver collect.
# ===========================================================================

def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    fulfilled = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        davg_scalar("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(fulfilled, customer.c_custkey == fulfilled.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


def davg_scalar(col: str) -> F.Column:
    return _dec_to_double(
        F.sum(F.col(col).cast("decimal(18,6)"))
    ) / F.count(col)


SQL_DORMANT_CUSTOMERS = f"""
SELECT c_nationkey, COUNT(*) AS numcust, {DSUM.format(e='c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(c_acctbal)
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_nationkey
"""


# ===========================================================================
# Q: kmv_distinct — engine-deterministic approximate distinct counts.
# Native HLLs (Spark approx_count_distinct vs DuckDB's) can never
# hash-match across engines; the KMV sketch is md5-derived so the
# ESTIMATE itself is oracle-exact, checked against the exact count.
# ===========================================================================

KMV_K = 32


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.sketches import kmv_distinct_by

    ev = _t(spark, sf_dir, "events")
    est = kmv_distinct_by(ev, ["event_type"], "user_id", k=KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "distinct_est", "exact_distinct"
    )


def _kmv_sql() -> str:
    from dataengineering_spark.operators.sketches import kmv_unit_hash_sql

    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {kmv_unit_hash_sql('user_id')} AS h FROM events
),
r AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
),
est AS (
  SELECT event_type,
    CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
         ELSE ({float(KMV_K - 1)!r}) / MAX(h) END AS distinct_est
  FROM r WHERE rn <= {KMV_K} GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT est.event_type, distinct_est, exact_distinct
FROM est JOIN ex USING (event_type)
"""


SQL_KMV_DISTINCT = _kmv_sql()


# ===========================================================================
# Q: kmv_merge — mergeable sketch STATE. Events are split into 4
# disjoint shards, each shard builds its own (event_type, kmins)
# sketch, the sketches union-merge per event_type, and the estimate
# from the MERGED state must equal the estimate computed directly over
# the whole table (KMV union-merge is lossless up to k: any global
# k-min hash is a k-min within its own shard). The oracle is the
# direct whole-table computation — the merge path exists only on the
# Spark side, which is exactly what makes the equality a real check.
# ===========================================================================


def q_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.sketches import (
        kmv_estimate_from_sketch,
        kmv_merge_sketches,
        kmv_sketch_by,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "shard", (F.col("event_id") % 4).cast("int")
    )
    shard_sketches = kmv_sketch_by(
        ev, ["event_type", "shard"], "user_id", k=KMV_K
    ).drop("shard")
    merged = kmv_merge_sketches(shard_sketches, ["event_type"], k=KMV_K)
    est = kmv_estimate_from_sketch(merged, k=KMV_K).select(
        "event_type", "distinct_est"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "distinct_est", "exact_distinct"
    )


SQL_KMV_MERGE = _kmv_sql()  # merged estimate must equal the direct one


# ===========================================================================
# Q: kmv_intersect — KMV set-INTERSECTION estimate (inclusion via the
# k-min union sketch: ρ = |union-k-mins ∩ A-sketch ∩ B-sketch| / k,
# |A∩B| ≈ ρ · est(|A∪B|)). Extends the sketch family beyond distinct
# counts to set overlap — the audience-overlap / join-selectivity
# estimator. Everything after the two distinct-hash scans is k-row
# frames (k=32): TakeOrderedAndProject k-mins, semi-join membership,
# and three 1-row scalar attaches (deliberate tiny BNLJ, allowlisted
# like important_parts). Estimator math replays in the oracle from the
# same md5 unit-hash grid; the exact intersection rides along.
# ===========================================================================


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.sketches import kmv_unit_hash

    ev = _t(spark, sf_dir, "events")
    k = KMV_K

    # two PARTIALLY overlapping id sets (the user sets per event_type
    # fully coincide in this corpus — a degenerate overlap): A = view
    # events, B = high-value events; |A∩B| ≈ |A|/2.
    sets = {
        "a": ev.filter(F.col("event_type") == "view"),
        "b": ev.filter(F.col("value") >= 0.5),
    }

    def hashes(s: str) -> DataFrame:
        return sets[s].select(kmv_unit_hash("event_id").alias("h")).distinct()

    def ids(s: str) -> DataFrame:
        return sets[s].select("event_id").distinct()

    ka = hashes("a").orderBy("h").limit(k)
    kb = hashes("b").orderBy("h").limit(k)
    ku = ka.union(kb).distinct().orderBy("h").limit(k)
    stats = ku.agg(F.count(F.lit(1)).alias("nu"), F.max("h").alias("hk"))
    rho = (
        ku.join(ka, "h", "left_semi")
        .join(kb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("rho"))
    )
    exact = (
        ids("a")
        .join(ids("b"), "event_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    union_est = (
        F.when(F.col("nu") < k, F.col("nu").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("hk"))
    )
    return (
        stats.crossJoin(rho)
        .crossJoin(exact)
        .select(
            (F.col("rho").cast("double") / k * union_est).alias("est_intersect"),
            "rho",
            union_est.alias("union_est"),
            "exact_intersect",
        )
    )


def _kmv_intersect_sql() -> str:
    from dataengineering_spark.operators.sketches import kmv_unit_hash_sql

    k = KMV_K
    h = kmv_unit_hash_sql("event_id")
    uest = f"CASE WHEN nu < {k} THEN CAST(nu AS DOUBLE) ELSE {float(k - 1)!r} / hk END"
    return f"""
WITH a AS (
  SELECT DISTINCT {h} AS h FROM events WHERE event_type = 'view'
), b AS (
  SELECT DISTINCT {h} AS h FROM events WHERE value >= 0.5
), ka AS (
  SELECT h FROM a ORDER BY h LIMIT {k}
), kb AS (
  SELECT h FROM b ORDER BY h LIMIT {k}
), ku AS (
  SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
  ORDER BY h LIMIT {k}
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu, MAX(h) AS hk FROM ku
), rho AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rho FROM ku
  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersect FROM (
    SELECT DISTINCT event_id FROM events WHERE event_type = 'view'
    INTERSECT
    SELECT DISTINCT event_id FROM events WHERE value >= 0.5)
)
SELECT CAST(rho AS DOUBLE) / {k} * ({uest}) AS est_intersect,
  rho, {uest} AS union_est, exact_intersect
FROM stats, rho, ex
"""


SQL_KMV_INTERSECT = _kmv_intersect_sql()


# ===========================================================================
# Q: hll_merge — Apache DataSketches HLL state (Spark's JVM-native
# hll_sketch_agg/hll_union_agg), the binary-register counterpart of
# kmv_merge. DuckDB cannot reproduce the DataSketches hash, so the
# cross-engine check asserts the PROPERTIES instead of the raw
# estimate: (a) the union of per-shard sketches estimates within 2%
# of the direct whole-table sketch (the union is lossless on register
# state, but a direct sketch answers with the stream-order HIP
# estimator, which the merge necessarily discards — estimates
# coincide exactly only in the sparse regime), and (b) the merged
# estimate lands within 5% of the exact distinct count (loose vs the
# ~1.6% relative-error bound at lgK=12) — alongside the exact count
# itself, which both engines must agree on.
# ===========================================================================


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.sketches import (
        hll_estimate_from_sketch,
        hll_merge_sketches,
        hll_sketch_by,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "shard", (F.col("event_id") % 4).cast("int")
    )
    shard_sketches = hll_sketch_by(ev, ["event_type", "shard"], "user_id").drop(
        "shard"
    )
    merged = hll_estimate_from_sketch(
        hll_merge_sketches(shard_sketches, ["event_type"])
    ).select("event_type", F.col("distinct_est").alias("est_merged"))
    direct = hll_estimate_from_sketch(
        hll_sketch_by(ev, ["event_type"], "user_id")
    ).select("event_type", F.col("distinct_est").alias("est_direct"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        merged.join(direct, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("est_merged") - F.col("est_direct"))
                <= 0.02 * F.col("est_direct")
            ).alias("merge_consistent"),
            (
                F.abs(F.col("est_merged") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_5pct"),
        )
    )


SQL_HLL_MERGE = """
SELECT event_type,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
  TRUE AS merge_consistent,
  TRUE AS within_5pct
FROM events
GROUP BY event_type
"""


# ===========================================================================
# Q: table_profile — single-pass multi-column statistics (one scan for
# N columns, unpivoted into rows engine-side). The oracle is N
# per-column aggregates UNION ALL'd — same numbers, N scans; the
# single-scan plan is the point of the Spark side.
# ===========================================================================

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.profiling import profile_columns

    return profile_columns(_t(spark, sf_dir, "lineitem"), PROFILE_COLS)


SQL_TABLE_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
  COUNT(*) FILTER ({c} IS NULL) AS n_null,
  COUNT(DISTINCT {c}) AS n_distinct,
  CAST(MIN({c}) AS DOUBLE) AS min_val,
  CAST(MAX({c}) AS DOUBLE) AS max_val,
  CAST(CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_val
FROM lineitem"""
    for c in PROFILE_COLS
)


# ===========================================================================
# Q: histogram_merge — mergeable equi-width histogram state: 4
# disjoint event shards each build their own histogram, the states
# merge bin-wise, and the result must equal the direct whole-table
# histogram the oracle computes (histogram merge is lossless — counts
# add). Out-of-range values clamp into the edge bins.
# ===========================================================================

HIST_LO, HIST_HI, HIST_BINS = 0.0, 400.0, 20


def q_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.profiling import (
        histogram_by,
        merge_histograms,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "shard", (F.col("event_id") % 4).cast("int")
    )
    shard_hists = histogram_by(
        ev, "value", HIST_LO, HIST_HI, HIST_BINS, group_cols=["shard"]
    )
    return merge_histograms(shard_hists)


SQL_HISTOGRAM_MERGE = f"""
SELECT CAST(LEAST({HIST_BINS - 1}, GREATEST(0,
    FLOOR((value - {HIST_LO}) * {HIST_BINS} / ({HIST_HI} - {HIST_LO}))
  )) AS BIGINT) AS bin_idx,
  COUNT(*) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY bin_idx
"""


# ===========================================================================
# Q: gapfill_hourly — dense time spine per group: every hour between a
# group's first and last event exists in the output, zero-filled where
# nothing happened (the resample/gap-fill primitive every time-series
# rollup needs). The spine is a per-group sequence() explode — narrow,
# no driver loop; the join back to sparse counts is on (group, hour).
# The oracle rebuilds the spine with UNNEST(range(...)) epoch math —
# DuckDB table functions can't lateral-join on columns.
# ===========================================================================


def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = (
        ev.groupBy("event_type", hour.alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = ev.groupBy("event_type").agg(
        F.min(hour).alias("_lo"), F.max(hour).alias("_hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    return (
        spine.join(counts, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("window_start"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


SQL_GAPFILL_HOURLY = """
WITH b AS (
  SELECT event_type,
         CAST(floor(epoch(min(date_trunc('hour', ts)))) AS BIGINT) AS lo,
         CAST(floor(epoch(max(date_trunc('hour', ts)))) AS BIGINT) AS hi
  FROM events GROUP BY event_type
), spine AS (
  SELECT event_type,
         to_timestamp(lo + 3600 * UNNEST(range((hi - lo) // 3600 + 1)))
           AS window_start
  FROM b
), c AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT spine.event_type, spine.window_start::TIMESTAMP AS window_start,
       COALESCE(c.n, 0) AS n
FROM spine LEFT JOIN c USING (event_type, window_start)
"""


# ===========================================================================
# Q: rolling_24h — event-time RANGE window per user: each event with
# the count/sum of that user's events in the trailing 24 hours.
# The sum routes through DECIMAL because windowed float aggregation
# is engine-specific (DuckDB uses segment trees, Spark accumulates in
# frame order — different summation orders drift in the last ulp).
# ===========================================================================


def q_rolling_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").withColumn(
        "_sec", F.col("ts").cast("timestamp").cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_sec")
        .rangeBetween(-86399, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        _dec_to_double(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        ).alias("sum_value_24h"),
    )


SQL_ROLLING_24H = """
SELECT event_id, user_id,
  COUNT(*) OVER w AS n_24h,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_value_24h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
"""


# ===========================================================================
# Q: rolling_24h_decomposed — the SAME trailing-24h semantics through
# the bucketed decomposition (operators/windows.trailing_range_agg):
# hourly partials + fixed 23-bucket explode + in-bucket running range
# window + edge-bucket equi-join. The sf100 A/B (SCALE.md round 7)
# measured the plain RANGE window FASTER at every tested density
# (frames 2 → 3300 rows: 24-42 s, essentially flat) — Spark 4's
# sliding-frame count/sum cost tracks rows, not rows x frame — so the
# plain window (rolling_24h) is the recommended production shape and
# this query exists as the oracle-checked equivalence proof of the
# decomposition operator. Oracle: identical SQL to rolling_24h — the
# decomposition must be indistinguishable from the window.
# ===========================================================================


def q_rolling_24h_decomposed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.windows import trailing_range_agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "_sec", F.col("ts").cast("timestamp").cast("long")
    )
    out = trailing_range_agg(
        ev,
        "user_id",
        "_sec",
        F.col("value").cast("decimal(18,6)"),
        id_cols=["event_id"],
        window_sec=86400,
        bucket_sec=3600,
        count_col="n_24h",
        sum_col="_sum24",
    )
    return out.select(
        "event_id",
        "user_id",
        "n_24h",
        _dec_to_double(F.col("_sum24")).alias("sum_value_24h"),
    )


# ===========================================================================
# Q: pagerank — iterative graph analytics over the supplier
# co-occurrence graph (edge weight = number of orders in which both
# suppliers appear; degrees vary with supplier activity, so ranks
# genuinely differentiate). Fixed 3 weighted supersteps in integer
# micro-units — contrib = (rank * w) DIV out_weight, next = base +
# (damping * Σcontrib) DIV 1e6 — so the run replays bit-for-bit as an
# unrolled CTE chain in any engine (the Lloyd-trainer recipe applied
# to Pregel-style iteration). Completes the graph story: sources/
# graph.py loads vertices/edges out; this computes over them in-engine.
# ===========================================================================

PR_ITERS = 3


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.graph_analytics import (
        pagerank_ranks,
    )

    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    a = pairs.select("l_orderkey", F.col("l_suppkey").alias("src"))
    b = pairs.select("l_orderkey", F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = li.select(F.col("l_suppkey").alias("node")).distinct()
    ranks = pagerank_ranks(edges, nodes, n_iters=PR_ITERS)
    return ranks.select(
        F.col("node").alias("s_suppkey"),
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(1000000.0)).alias("rank"),
    )


def _pagerank_sql() -> str:
    ctes = [
        "pq AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)",
        """edges AS (
  SELECT a.l_suppkey AS src, b.l_suppkey AS dst, COUNT(*) AS w
  FROM pq a JOIN pq b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey != b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
)""",
        "nodes AS (SELECT DISTINCT l_suppkey AS node FROM lineitem)",
        "outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        cur = f"r{i}"
        ctes.append(
            f"""{cur} AS (
  SELECT n.node,
    CAST(150000 + (850000 * COALESCE(s.m, 0)) // 1000000 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((p.r * e.w) // o.ow) AS m
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN outw o ON e.src = o.src
    GROUP BY e.dst) s ON n.node = s.node
)"""
        )
        prev = cur
    joined = ",\n".join(ctes)
    return f"""
WITH {joined}
SELECT node AS s_suppkey, r AS rank_micro,
       CAST(r AS DOUBLE) / 1000000.0 AS rank
FROM {prev}
"""


SQL_PAGERANK = _pagerank_sql()


# ===========================================================================
# Q: zorder_key — Morton (Z-order) clustering key over two join/filter
# dimensions of orders. The layout primitive behind multi-dimensional
# data skipping: range-writing on this key makes parquet min/max stats
# prune predicates on EITHER interleaved column (operators/layout.py,
# cluster_by_morton). Pure integer floor-div/mod arithmetic — the
# oracle replays the identical expression text.
# ===========================================================================

ZORDER_BITS = 16
ZORDER_DIMS = ("o_custkey % 65536", "o_orderkey % 65536")


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.layout import morton_key

    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        morton_key(ZORDER_DIMS, ZORDER_BITS).alias("zkey"),
        F.expr(
            f"CAST(floor({morton_key_sql_cached()} / {2 ** (2 * ZORDER_BITS - 8)})"
            " AS BIGINT)"
        ).alias("zbucket"),
    )


def morton_key_sql_cached() -> str:
    from dataengineering_spark.operators.layout import morton_key_sql

    return morton_key_sql(ZORDER_DIMS, ZORDER_BITS)


def _zorder_sql() -> str:
    zk = morton_key_sql_cached()
    return f"""
SELECT o_orderkey, {zk} AS zkey,
  CAST(floor({zk} / {2 ** (2 * ZORDER_BITS - 8)}) AS BIGINT) AS zbucket
FROM orders
"""


SQL_ZORDER_KEY = _zorder_sql()


# ===========================================================================
# Q: countmin_topk — Count-Min-sketch heavy hitters. The sketch is the
# mergeable frequency summary (d=3 md5-derived hash rows × w=64
# counters, same engine-portable hex32 arithmetic as the SimHash/
# MinHash family); the query builds it with one map-side-combined
# groupBy over a 3×-exploded key stream, then point-queries every
# distinct key (min over the 3 counter cells, joined against the
# BROADCAST 192-row sketch) and emits the top-10 estimated keys next
# to their exact counts. ORDER BY + LIMIT, not a global window — the
# top-k runs as TakeOrderedAndProject, no single-partition exchange.
# At 100 TB the sketch build is the only pass that touches the fact
# stream; its shuffle is bounded by partitions × 192 cells.
# ===========================================================================

CM_ROWS = 3
CM_WIDTH = 64
CM_TOPK = 10


def _cm_bucket_sql(row_expr: str, key_expr: str, dialect: str) -> str:
    from dataengineering_spark.operators.dedup import hex32_sql

    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = (
        f"md5(concat('cm', CAST({row_expr} AS {str_t}), ':',"
        f" CAST({key_expr} AS {str_t})))"
    )
    return f"(CAST({hex32_sql(h)} AS BIGINT) % {CM_WIDTH})"


def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.caching import persist_tracked

    ev = _t(spark, sf_dir, "events")
    rows = F.array(*[F.lit(i) for i in range(CM_ROWS)])
    bucket = F.expr(_cm_bucket_sql("cm_row", "user_id", "spark"))
    # ONE events pass: per-key exact counts.  The sketch cell total is
    # the sum of counts of the keys hashing into the cell, so it builds
    # from this |distinct keys| frame — hashing 3×|events| raw rows
    # (the r5 shape) redid the md5 work per event for the same cells
    # (isolated-bench regression fix, round 7).
    exact = persist_tracked(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    )
    keyed = (
        exact.select("user_id", "exact_n", F.explode(rows).alias("cm_row"))
        .withColumn("bucket", bucket)
    )
    sketch = keyed.groupBy("cm_row", "bucket").agg(
        F.sum("exact_n").alias("cnt")
    )
    est = (
        keyed.join(F.broadcast(sketch), ["cm_row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est"), F.first("exact_n").alias("exact_n"))
    )
    return (
        est.orderBy(F.desc("est"), F.asc("user_id"))
        .limit(CM_TOPK)
        .select("user_id", "est", "exact_n", (F.col("est") - F.col("exact_n")).alias("overcount"))
    )


SQL_COUNTMIN_TOPK = f"""
WITH tripled AS (
  SELECT user_id, UNNEST([{", ".join(str(i) for i in range(CM_ROWS))}]) AS cm_row
  FROM events
), bucketed AS (
  SELECT user_id, cm_row,
    {_cm_bucket_sql("cm_row", "user_id", "duckdb")} AS bucket
  FROM tripled
), sketch AS (
  SELECT cm_row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY cm_row, bucket
), est AS (
  SELECT b.user_id, MIN(s.cnt) AS est
  FROM (SELECT DISTINCT user_id, cm_row, bucket FROM bucketed) b
  JOIN sketch s ON b.cm_row = s.cm_row AND b.bucket = s.bucket
  GROUP BY b.user_id
), exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM events GROUP BY user_id
)
SELECT est.user_id, est, exact_n, est - exact_n AS overcount
FROM est JOIN exact ON est.user_id = exact.user_id
ORDER BY est DESC, est.user_id ASC
LIMIT {CM_TOPK}
"""


# ===========================================================================
# Q: event_transitions — first-order Markov transition matrix over
# per-user event sequences: lag() partitioned on user_id (per-user
# state, ties broken on event_id), one groupBy over the (prev, next)
# pairs, and a window over the 25-row aggregate for the per-source
# share. The share is exact-int → double division, bit-identical
# across engines.
# ===========================================================================


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("share"),
    )


SQL_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS share
FROM pairs
"""


# ===========================================================================
# Q: funnel_steps — sequential-conversion funnel (view → click →
# purchase) per user. Each step's earliest qualifying timestamp must
# strictly follow the previous step's. The sequential dependency is a
# chain of min-aggregate → equi-join stages, all shuffling on the SAME
# key (user_id), so AQE reuses one partitioning end-to-end; nothing in
# the chain is quadratic and the per-step frames only shrink. The
# reference's analytics tier has no funnel; this is the shape its
# ClickHouse users would write with windowFunnel().
# ===========================================================================


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("depth"),
        )
    )


SQL_FUNNEL_STEPS = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
  CAST(1 + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
         + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END AS INT) AS depth
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


# ===========================================================================
# Q: cohort_retention — weekly cohort × activity-week retention counts.
# cohort_week = ISO week of a user's first event; one row per
# (cohort_week, week_offset) with the distinct-user count still active
# that week. Two aggregations over the events scan plus one join on
# user_id; offsets are exact integer day-arithmetic (both engines
# truncate weeks to Monday), so counts hash-match bit-for-bit.
# ===========================================================================


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
  FROM events
)
SELECT f.cohort_week,
  CAST((a.act_week - f.cohort_week) // 7 AS INT) AS week_offset,
  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
"""


# ===========================================================================
# Q: scd2_history — slowly-changing-dimension type-2 intervals built
# from a change stream (gaps-and-islands). Per user, consecutive runs
# of the same event_type collapse into one [valid_from, valid_to)
# interval; the latest run is open (is_current). Classic lag→flag→
# running-sum island id, then lead() over the interval sequence. All
# window work partitions on user_id — per-user state, never global —
# and ties at identical timestamps break on event_id, so the island
# assignment replays deterministically on both engines.
# ===========================================================================


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "island",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = islands.groupBy("user_id", "island", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    valid_to = F.lead("valid_from").over(w2)
    return iv.select(
        "user_id",
        "island",
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


SQL_SCD2_HISTORY = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN lag(event_type) OVER w IS NULL
           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), islands AS (
  SELECT user_id, ts, event_type,
    SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
), iv AS (
  SELECT user_id, CAST(island AS BIGINT) AS island, event_type,
    MIN(ts) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM islands GROUP BY user_id, island, event_type
)
SELECT user_id, island, event_type, valid_from,
  lead(valid_from) OVER w2 AS valid_to,
  n_events,
  (lead(valid_from) OVER w2 IS NULL) AS is_current
FROM iv
WINDOW w2 AS (PARTITION BY user_id ORDER BY island)
"""


# ===========================================================================
# Q: snapshot_diff — two-snapshot table diff (added / removed /
# changed), the reconciliation primitive behind incremental loads and
# CDC audits. The two snapshots are carved deterministically from
# orders (key mod 97 missing from the old side, mod 89 missing from
# the new, mod 53 repriced), then diffed with one full-outer join on
# the key; unchanged rows drop out. One shuffle on the join key; at
# scale both sides prune columns to key + compared fields.
# ===========================================================================


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("old_price"),
        F.col("o_orderstatus").alias("old_status"),
    )
    new = (
        o.filter(F.col("o_orderkey") % 89 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(
                F.col("o_orderkey") % 53 == 0, F.col("o_totalprice") + 1.5
            )
            .otherwise(F.col("o_totalprice"))
            .alias("new_price"),
            F.col("o_orderstatus").alias("new_status"),
        )
    )
    j = old.join(new, "key", "full_outer")
    status = (
        F.when(F.col("old_price").isNull(), "added")
        .when(F.col("new_price").isNull(), "removed")
        .when(
            (F.col("old_price") != F.col("new_price"))
            | (F.col("old_status") != F.col("new_status")),
            "changed",
        )
    )
    return (
        j.withColumn("diff_status", status)
        .filter(F.col("diff_status").isNotNull())
        .select("key", "diff_status", "old_price", "new_price")
    )


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT o_orderkey AS key, o_totalprice AS old_price, o_orderstatus AS old_status
  FROM orders WHERE o_orderkey % 97 <> 0
), new AS (
  SELECT o_orderkey AS key,
    CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1.5 ELSE o_totalprice END AS new_price,
    o_orderstatus AS new_status
  FROM orders WHERE o_orderkey % 89 <> 0
)
SELECT COALESCE(old.key, new.key) AS key,
  CASE WHEN old_price IS NULL THEN 'added'
       WHEN new_price IS NULL THEN 'removed'
       WHEN old_price <> new_price OR old_status <> new_status THEN 'changed'
  END AS diff_status,
  old_price, new_price
FROM old FULL OUTER JOIN new ON old.key = new.key
WHERE CASE WHEN old_price IS NULL THEN 'added'
           WHEN new_price IS NULL THEN 'removed'
           WHEN old_price <> new_price OR old_status <> new_status THEN 'changed'
      END IS NOT NULL
"""


# ===========================================================================
# Q: props_json — JSON property extraction over the events payload column
# ===========================================================================
#
# The reference ships payloads as opaque strings and parses them in
# pandas after the fact (clickhouse/v1/operator.py:454 reads CSV text
# wholesale). Spark-first: get_json_object is codegen'd JVM-side, so
# the parse rides the scan with no Python in the loop.

def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", "value", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("k_distinct"),
            F.coalesce(
                dsum(F.when(F.col("k") < 50, F.col("value"))), F.lit(0.0)
            ).alias("low_k_value"),
        )
    )


SQL_PROPS_JSON = """
WITH parsed AS (
  SELECT event_type, value,
    CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
  MIN(k) AS k_min,
  MAX(k) AS k_max,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct,
  COALESCE(CAST(CAST(SUM(CASE WHEN k < 50
      THEN CAST(value AS DECIMAL(18,6)) END) AS VARCHAR) AS DOUBLE), 0.0)
    AS low_k_value
FROM parsed GROUP BY event_type
"""


# ===========================================================================
# Q: event_unpivot — wide → long melt (UNPIVOT round-trip of the A4 pivot)
# ===========================================================================

def q_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot per user then UNPIVOT back to long form.

    Exercises the melt operator for real: the wide frame's five typed
    columns become (etype, total) rows, zero-filled combos included —
    the shape a feature-store export needs.
    """
    wide = q_user_event_pivot(spark, sf_dir)
    return wide.unpivot(
        "user_id", list(EVENT_TYPES), "etype", "total"
    )


SQL_EVENT_UNPIVOT = """
WITH u AS (SELECT DISTINCT user_id FROM events),
t AS (
  SELECT 'click' AS etype UNION ALL SELECT 'view' UNION ALL
  SELECT 'purchase' UNION ALL SELECT 'signup' UNION ALL SELECT 'error'
),
s AS (
  SELECT user_id, event_type,
    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total
  FROM events GROUP BY user_id, event_type
)
SELECT u.user_id, t.etype, COALESCE(s.total, 0.0) AS total
FROM u CROSS JOIN t
LEFT JOIN s ON s.user_id = u.user_id AND s.event_type = t.etype
"""


# ===========================================================================
# Q: user_diversity — Shannon entropy + Gini impurity of per-user event mix
# ===========================================================================
#
# Label-diversity metrics a training-data curation pass computes per
# source/user. Gini is emitted in exact integer ppm (pure BIGINT
# arithmetic — engine-identical by construction); entropy in floored
# micro-nats (ln is the one libm call; the decimal-routed inner sum
# keeps addition order-independent so engines agree to the ulp).

def q_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = c.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(
            (F.col("c").cast("double") * F.log(F.col("c").cast("double"))).cast(
                "decimal(28,12)"
            )
        ).alias("clnc"),
    )
    return per_user.select(
        "user_id",
        F.expr("(1000000 * (n * n - s2)) DIV (n * n)").alias("gini_ppm"),
        F.floor(
            (
                F.log(F.col("n").cast("double"))
                - _dec_to_double(F.col("clnc")) / F.col("n")
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).alias("entropy_unats"),
    )


SQL_USER_DIVERSITY = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
p AS (
  SELECT user_id,
    CAST(SUM(c) AS BIGINT) AS n,
    CAST(SUM(c * c) AS BIGINT) AS s2,
    SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,12))) AS clnc
  FROM c GROUP BY user_id
)
SELECT user_id,
  (1000000 * (n * n - s2)) // (n * n) AS gini_ppm,
  CAST(FLOOR((ln(CAST(n AS DOUBLE))
      - CAST(CAST(clnc AS VARCHAR) AS DOUBLE) / n) * 1000000.0 + 0.5) AS BIGINT)
    AS entropy_unats
FROM p
"""


# ===========================================================================
# Q: concurrency_peak — max overlapping 1-hour event intervals per user
# ===========================================================================
#
# Sweep-line over interval endpoints: +1 at start, -1 at end, running
# sum, max. Partitioned by user so the window shuffles on a high-
# cardinality key (no global sort); ties at one instant order ends
# before starts (half-open intervals), making the max deterministic.

def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    starts = ev.select("user_id", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionAll(ends)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = pts.withColumn("c", F.sum("delta").over(w))
    return run.groupBy("user_id").agg(F.max("c").cast("long").alias("peak"))


SQL_CONCURRENCY_PEAK = """
WITH pts AS (
  SELECT user_id, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, ts + INTERVAL 1 HOUR, -1 FROM events
),
run AS (
  SELECT user_id,
    SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                     ROWS UNBOUNDED PRECEDING) AS c
  FROM pts
)
SELECT user_id, CAST(MAX(c) AS BIGINT) AS peak FROM run GROUP BY user_id
"""


# ===========================================================================
# Q: ewma_daily — exponentially weighted moving average of daily revenue
# ===========================================================================
#
# alpha = 1/2 over an 8-day truncated horizon. Shuffle-shaped for
# scale: each source day explodes into its 8 target-day contributions
# (sequence + date_add), then one equi-join + groupBy — no range join,
# no BroadcastNestedLoop, no global window. Exactness: everything stays
# DECIMAL — the weight 0.5**(k+1) is a power of two (exact in double,
# <=8 dp, so the DECIMAL(9,8) cast is lossless on both engines), and
# DECIMAL(24,6) x DECIMAL(9,8) multiplies exactly without hitting
# either engine's 38-digit cap.

def q_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(24,6)")
        .alias("rev")
    )
    contrib = daily.select(
        "day",
        "rev",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"),
    ).select(
        F.date_add(F.col("day"), F.col("k")).alias("t"),
        (F.col("rev") * F.pow(F.lit(0.5), F.col("k") + 1).cast("decimal(9,8)")).alias(
            "w"
        ),
    )
    return (
        daily.select(F.col("day"))
        .join(contrib, F.col("day") == F.col("t"))
        .groupBy("day")
        .agg(_dec_to_double(F.sum("w")).alias("ewma"))
    )


SQL_EWMA_DAILY = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS rev
  FROM orders GROUP BY 1
),
contrib AS (
  SELECT day + CAST(k AS INTEGER) AS t,
    rev * CAST(power(0.5, k + 1) AS DECIMAL(9,8)) AS w
  FROM (SELECT day, rev, UNNEST(range(8)) AS k FROM daily)
)
SELECT d.day, CAST(CAST(SUM(c.w) AS VARCHAR) AS DOUBLE) AS ewma
FROM daily d JOIN contrib c ON c.t = d.day
GROUP BY d.day
"""


# ===========================================================================
# Q: degree_distribution — graph degree histogram over the transfer graph
# ===========================================================================
#
# The TigerGraph-side analytics the reference defers to the graph
# engine (S18-S22); in-engine it is two hash aggregations.

def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = transfers_from_events(_t(spark, sf_dir, "events"))
    deg = tr.groupBy("sender_address").agg(
        F.countDistinct("receiver_address").alias("out_degree")
    )
    return deg.groupBy("out_degree").agg(
        F.count(F.lit(1)).alias("n_senders")
    )


SQL_DEGREE_DISTRIBUTION = f"""
WITH transfers AS ({TRANSFERS_SQL}),
deg AS (
  SELECT sender_address,
    CAST(COUNT(DISTINCT receiver_address) AS BIGINT) AS out_degree
  FROM transfers GROUP BY sender_address
)
SELECT out_degree, CAST(COUNT(*) AS BIGINT) AS n_senders
FROM deg GROUP BY out_degree
"""


# ===========================================================================
# Q: fuzzy_match — blocked Levenshtein near-duplicate pairs over documents
# ===========================================================================
#
# Record-linkage shape: block on (lang, 16-char prefix) so the
# quadratic edit-distance only runs inside tiny equi-join buckets —
# never all-pairs — then score a bounded 80-char prefix. Both engines
# define levenshtein over unicode code points identically.

def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 16).alias("blk"),
        F.substring("text", 1, 80).alias("prefix"),
    )
    a = docs.select(
        F.col("doc_id").alias("a_id"),
        "lang",
        "blk",
        F.col("prefix").alias("a_prefix"),
    )
    b = docs.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("b_lang"),
        F.col("blk").alias("b_blk"),
        F.col("prefix").alias("b_prefix"),
    )
    pairs = a.join(
        b,
        (F.col("lang") == F.col("b_lang"))
        & (F.col("blk") == F.col("b_blk"))
        & (F.col("a_id") < F.col("b_id")),
    )
    return pairs.select(
        "a_id",
        "b_id",
        F.levenshtein("a_prefix", "b_prefix").alias("dist"),
    ).filter(F.col("dist") <= 20)


SQL_FUZZY_MATCH = """
WITH d AS (
  SELECT doc_id, lang, substr(text, 1, 16) AS blk, substr(text, 1, 80) AS prefix
  FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
FROM d a JOIN d b
  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 20
"""


# ===========================================================================
# Q: bloom_prune — Bloom-filter semi-join pruning (runtime-filter shape)
# ===========================================================================
#
# The scale technique behind Spark's runtime row-group filters, built
# explicitly so the reduction is observable and oracle-checkable: a
# selective dim filter builds an m=4096-bit Bloom set (j=3 md5-derived
# positions per key, same engine-portable hex32 arithmetic as the
# sketch family); the fact side checks its 3 positions against the
# BROADCAST ≤4096-row bit set — a bounded-size build no matter how
# large the dim — and only bloom-passing candidates reach the exact
# join. Emits per-status probe/pass/true/false-positive counts, so the
# pruning ratio (and the no-false-negative invariant) is the result.

BLOOM_M = 4096
BLOOM_K = 3


def _bloom_pos_sql(j_expr: str, key_expr: str, dialect: str) -> str:
    from dataengineering_spark.operators.dedup import hex32_sql

    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = (
        f"md5(concat('bf', CAST({j_expr} AS {str_t}), ':',"
        f" CAST({key_expr} AS {str_t})))"
    )
    return f"(CAST({hex32_sql(h)} AS BIGINT) % {BLOOM_M})"


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ks = F.array(*[F.lit(i) for i in range(BLOOM_K)])
    build = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )
    bloom = (
        build.select("key", F.explode(ks).alias("j"))
        .select(F.expr(_bloom_pos_sql("j", "key", "spark")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", F.explode(ks).alias("j"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.expr(_bloom_pos_sql("j", "o_custkey", "spark")).alias("pos"),
        )
    )
    cand = (
        probe.join(F.broadcast(bloom), "pos", "left")
        .groupBy("o_orderkey", "o_custkey", "o_orderstatus")
        .agg(
            (F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1)
            .cast("int")
            .alias("pass_bloom")
        )
    )
    members = build.select(
        F.col("key").alias("o_custkey"), F.lit(1).alias("is_member")
    ).distinct()
    flagged = cand.join(F.broadcast(members), "o_custkey", "left").na.fill(
        0, ["is_member"]
    )
    return (
        flagged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum("pass_bloom").alias("n_bloom_pass"),
            F.sum(F.col("pass_bloom") * F.col("is_member")).alias("n_true"),
        )
        .withColumn("n_false_pos", F.col("n_bloom_pass") - F.col("n_true"))
    )


def _sql_bloom_prune() -> str:
    pos_b = _bloom_pos_sql("j", "key", "duckdb")
    pos_p = _bloom_pos_sql("j", "o_custkey", "duckdb")
    js = ", ".join(str(i) for i in range(BLOOM_K))
    return f"""
WITH build AS (
  SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
),
bloom AS (
  SELECT DISTINCT {pos_b} AS pos
  FROM (SELECT key, UNNEST([{js}]) AS j FROM build)
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, {pos_p} AS pos
  FROM (SELECT o_orderkey, o_custkey, o_orderstatus, UNNEST([{js}]) AS j
        FROM orders)
),
cand AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    CASE WHEN MIN(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) = 1
         THEN 1 ELSE 0 END AS pass_bloom
  FROM probe p LEFT JOIN bloom b ON p.pos = b.pos
  GROUP BY 1, 2, 3
),
flagged AS (
  SELECT c.*, CASE WHEN m.key IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM cand c LEFT JOIN (SELECT DISTINCT key FROM build) m
    ON c.o_custkey = m.key
)
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_probe,
  CAST(SUM(pass_bloom) AS BIGINT) AS n_bloom_pass,
  CAST(SUM(pass_bloom * is_member) AS BIGINT) AS n_true,
  CAST(SUM(pass_bloom) - SUM(pass_bloom * is_member) AS BIGINT) AS n_false_pos
FROM flagged GROUP BY o_orderstatus
"""


SQL_BLOOM_PRUNE = _sql_bloom_prune()


# ===========================================================================
# Q: value_correlation — exact-decimal Pearson correlation per event_type
# ===========================================================================
#
# The five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are computed as
# decimal-×-decimal products summed in DECIMAL — order-independent and
# engine-identical; only the final corr arithmetic runs in double
# (sqrt is the single libm call), emitted as floored micro-units.

def q_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(12,2)")
    y = F.get_json_object(F.col("props"), "$.k").cast("int").cast("decimal(12,2)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sx2"),
        F.sum(y * y).alias("sy2"),
    )
    n = F.col("n").cast("double")
    dd = {c: _dec_to_double(F.col(c)) for c in ("sx", "sy", "sxy", "sx2", "sy2")}
    num = n * dd["sxy"] - dd["sx"] * dd["sy"]
    den = F.sqrt(
        (n * dd["sx2"] - dd["sx"] * dd["sx"]) * (n * dd["sy2"] - dd["sy"] * dd["sy"])
    )
    return agg.select(
        "event_type",
        "n",
        F.floor(num / den * F.lit(1000000.0) + F.lit(0.5)).alias("corr_ppm"),
    )


SQL_VALUE_CORRELATION = """
WITH m AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
    SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM (
    SELECT event_type, CAST(value AS DECIMAL(12,2)) AS x,
      CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(12,2)) AS y
    FROM events
  ) GROUP BY event_type
),
d AS (
  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) AS sx2,
    CAST(CAST(sy2 AS VARCHAR) AS DOUBLE) AS sy2
  FROM m
)
SELECT event_type, n,
  CAST(FLOOR((nd * sxy - sx * sy)
      / sqrt((nd * sx2 - sx * sx) * (nd * sy2 - sy * sy))
      * 1000000.0 + 0.5) AS BIGINT) AS corr_ppm
FROM d
"""


# ===========================================================================
# Q: quantile_bins — NTILE quartile assignment + per-bin aggregates
# ===========================================================================

def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = ev.withColumn("bin", F.ntile(4).over(w))
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


SQL_QUANTILE_BINS = """
WITH b AS (
  SELECT event_type, value,
    CAST(NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS INT) AS bin
  FROM events
)
SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS n,
  MIN(value) AS lo, MAX(value) AS hi
FROM b GROUP BY event_type, bin
"""


# ===========================================================================
# Q: merge_upsert — MERGE INTO semantics over snapshot + change set
# ===========================================================================
#
# The reference's staging-flush lifecycle (DELETE + reload,
# clickhouse/v1/operator.py) as a declarative one-join merge: see
# operators/maintenance.merge_upsert. Target = snapshot missing the
# %97 keys; source = the %89 change set with adjusted prices, so the
# result exercises all three branches (update / insert / keep).

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.maintenance import merge_upsert

    od = _t(spark, sf_dir, "orders")
    target = od.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    source = od.filter(F.col("o_orderkey") % 89 == 0).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_totalprice") + F.lit(1.5)).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    return merge_upsert(target, source, keys=["key"])


SQL_MERGE_UPSERT = """
WITH t AS (
  SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
  FROM orders WHERE o_orderkey % 97 <> 0
),
s AS (
  SELECT o_orderkey AS key, o_totalprice + 1.5 AS price, o_orderstatus AS status
  FROM orders WHERE o_orderkey % 89 = 0
)
SELECT COALESCE(t.key, s.key) AS key,
  CASE WHEN s.key IS NOT NULL THEN s.price ELSE t.price END AS price,
  CASE WHEN s.key IS NOT NULL THEN s.status ELSE t.status END AS status,
  CASE WHEN s.key IS NOT NULL AND t.key IS NOT NULL THEN 'update'
       WHEN s.key IS NOT NULL THEN 'insert'
       ELSE 'keep' END AS action
FROM t FULL OUTER JOIN s ON t.key = s.key
"""


# ===========================================================================
# Q: table_checksum — order-independent content fingerprint per bucket
# ===========================================================================
#
# Cross-system reconciliation beyond row counts (V1 extends to
# content): each row hashes to a 32-bit integer (md5/hex32, identical
# on both engines over a canonical string repr — decimals fixed-point,
# dates ISO-formatted, NO raw float-to-string anywhere), summed per
# key bucket in DECIMAL so the total neither overflows nor depends on
# order at any scale. Two tables agree iff all bucket rows agree;
# a diff localizes to 1/16th of the keyspace.

CHECKSUM_BUCKETS = 16


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.dedup import hex32_sql

    li = _t(spark, sf_dir, "lineitem")
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    h = F.expr(hex32_sql("md5(r)")).cast("decimal(20,0)")
    return (
        li.select((F.col("l_orderkey") % CHECKSUM_BUCKETS).alias("bucket"), row_repr.alias("r"))
        .select("bucket", h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").cast("string").alias("checksum"),
        )
    )


def _sql_table_checksum() -> str:
    from dataengineering_spark.operators.dedup import hex32_sql

    return f"""
WITH r AS (
  SELECT l_orderkey % {CHECKSUM_BUCKETS} AS bucket,
    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|'
      || l_returnflag || '|' || l_linestatus || '|'
      || CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || '|'
      || strftime(l_shipdate, '%Y-%m-%d') AS r
  FROM lineitem
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CAST({hex32_sql("md5(r)")} AS DECIMAL(20,0))) AS VARCHAR) AS checksum
FROM r GROUP BY bucket
"""


SQL_TABLE_CHECKSUM = _sql_table_checksum()


# ===========================================================================
# Q: sales_cube — CUBE grouping sets (all four lattice levels)
# ===========================================================================

def q_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", "sum_price"),
        F.grouping_id().alias("gid"),
    )


SQL_SALES_CUBE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  {DSUM.format(e='l_extendedprice')} AS sum_price,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ===========================================================================
# Q: user_drawdown — running-max drawdown per user (RANGE-free rolling max)
# ===========================================================================
#
# Drawdown = max(running_max(value) − value) over the user's ordered
# stream. Double subtraction of identical parquet doubles is
# bit-deterministic on both engines; the per-user window shuffles on a
# high-cardinality key.

def q_user_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("run_max", F.max("value").over(w))
        .groupBy("user_id")
        .agg(
            F.max(F.col("run_max") - F.col("value")).alias("max_drawdown"),
            F.max("run_max").alias("peak"),
        )
    )


SQL_USER_DRAWDOWN = """
WITH r AS (
  SELECT user_id, value,
    MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS run_max
  FROM events
)
SELECT user_id, MAX(run_max - value) AS max_drawdown, MAX(run_max) AS peak
FROM r GROUP BY user_id
"""


# ===========================================================================
# Q: value_cume — percent_rank + cume_dist per event_type
# ===========================================================================
#
# Both functions are rational in (rank, n) — integer ratios divided in
# double, bit-identical across engines. Deterministic total order.

def q_value_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_type",
        "event_id",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    ).filter(F.col("event_id") % 100 == 0)


SQL_VALUE_CUME = """
WITH r AS (
  SELECT event_type, event_id,
    PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr,
    CUME_DIST() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd
  FROM events
)
SELECT event_type, event_id, pr, cd FROM r WHERE event_id % 100 = 0
"""


# ===========================================================================
# Q: user_event_sequence — ordered per-user event path (training-sequence
# building: the shape an LLM-pipeline uses to assemble session texts)
# ===========================================================================

SEQ_MAX = 10


def q_user_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    # positional max-pivot instead of collect_list + HOF transform:
    # stays in whole-stage codegen and never materializes per-user
    # arrays; concat_ws skips the NULL tail on both engines.
    slots = [
        F.max(F.when(F.col("rn") == i, F.col("event_type"))).alias(f"_s{i}")
        for i in range(1, SEQ_MAX + 1)
    ]
    return (
        ranked.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), *slots)
        .select(
            "user_id",
            "n_events",
            F.concat_ws("->", *[f"_s{i}" for i in range(1, SEQ_MAX + 1)]).alias(
                "path"
            ),
        )
    )


def _sql_user_event_sequence() -> str:
    slot_exprs = ", ".join(
        f"MAX(CASE WHEN rn = {i} THEN event_type END) AS _s{i}"
        for i in range(1, SEQ_MAX + 1)
    )
    slot_names = ", ".join(f"_s{i}" for i in range(1, SEQ_MAX + 1))
    return f"""
WITH ordered AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
slotted AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, {slot_exprs}
  FROM ordered GROUP BY user_id
)
SELECT user_id, n_events, concat_ws('->', {slot_names}) AS path FROM slotted
"""


SQL_USER_EVENT_SEQUENCE = _sql_user_event_sequence()


# ===========================================================================
# Q: status_priority_sets — explicit GROUPING SETS (neither rollup nor cube)
# ===========================================================================

def q_status_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    od.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS STRING)
               AS DOUBLE) AS sum_price,
          CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


SQL_STATUS_PRIORITY_SETS = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  {DSUM.format(e='o_totalprice')} AS sum_price,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


# ===========================================================================
# Q: session_bounds — first_value / last_value / nth_value per user
# ===========================================================================

def q_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first_value("event_type").over(w).alias("first_type"),
            F.last_value("event_type").over(w).alias("last_type"),
            F.nth_value("event_type", 2).over(w).alias("second_type"),
        )
        .distinct()
    )


SQL_SESSION_BOUNDS = """
SELECT DISTINCT user_id,
  FIRST_VALUE(event_type) OVER w AS first_type,
  LAST_VALUE(event_type) OVER w AS last_type,
  NTH_VALUE(event_type, 2) OVER w AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ===========================================================================
# Q: incremental_agg — materialized-view delta maintenance (IVM algebra)
# ===========================================================================
#
# The streaming-upsert story for aggregates: a base aggregate plus a
# delta batch combine by MERGING PARTIALS (counts add, decimal sums
# add) instead of rescanning the base — at 100 TB the recompute is the
# difference between touching a day and touching the archive. The
# oracle is the full-table aggregate, so the check proves the merge
# algebra is lossless, not merely self-consistent.

def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_dec"),
        )

    base = partial(ev.filter(F.col("event_id") % 11 != 0))
    delta = partial(ev.filter(F.col("event_id") % 11 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_dec").alias("sum_dec"))
    )
    return merged.select(
        "event_type", "n", _dec_to_double(F.col("sum_dec")).alias("sum_value")
    )


SQL_INCREMENTAL_AGG = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


# ===========================================================================
# Q: scd2_lookup — point-in-time temporal join against versioned intervals
# ===========================================================================
#
# The warehouse primitive behind "which dim version was active when
# this fact happened": probes are joined to SCD2 intervals AT their
# timestamp. The scalable implementation is the as-of join (backward
# at-or-before on valid_from — one sort-merge pass, no range join, no
# BroadcastNestedLoop); the oracle expresses the same semantics as
# interval CONTAINMENT (valid_from <= ts < valid_to), so the hash
# match proves as-of == containment when intervals partition time.

def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.asof import asof_join

    intervals = q_scd2_history(spark, sf_dir).select(
        "user_id", "valid_from", "event_type", "island"
    )
    probes = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 50 == 0)
        .select("user_id", "event_id", "ts")
    )
    looked = asof_join(
        probes,
        intervals,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["event_type", "island"],
    )
    return looked.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type_asof").alias("regime_type"),
        F.col("island_asof").alias("regime_island"),
    )


SQL_SCD2_LOOKUP = f"""
WITH iv AS ({SQL_SCD2_HISTORY}),
probes AS (
  SELECT user_id, event_id, ts FROM events WHERE event_id % 50 = 0
)
SELECT p.user_id, p.event_id, p.ts,
  i.event_type AS regime_type,
  CAST(i.island AS BIGINT) AS regime_island
FROM probes p JOIN iv i
  ON p.user_id = i.user_id
  AND i.valid_from <= p.ts
  AND (i.valid_to IS NULL OR p.ts < i.valid_to)
"""


# ===========================================================================
# Q: ohlc_hourly — open/high/low/close downsampling per (event_type, hour)
# ===========================================================================
#
# The classic bar-building resample. Open/close are positional (first/
# last by deterministic (ts, event_id) order) — expressed as a
# row-number window ascending + descending over a high-cardinality
# (type, hour) key, folded in the same grouped aggregate as high/low/
# volume, so one shuffle produces the whole bar.

def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", "ts", "event_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
    )
    w_asc = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.withColumn("rn_a", F.row_number().over(w_asc)).withColumn(
        "rn_d", F.row_number().over(w_desc)
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


SQL_OHLC_HOURLY = """
WITH r AS (
  SELECT event_type, value, date_trunc('hour', ts) AS hour,
    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour,
  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
  CAST(COUNT(*) AS BIGINT) AS volume
FROM r GROUP BY event_type, hour
"""


# ===========================================================================
# Q: chi_square — independence test over the (user-bucket × event_type)
# contingency table
# ===========================================================================
#
# χ² = Σ (o−e)²/e with e = row·col/n. Every input is an exact integer
# count, so the per-cell double arithmetic is bit-identical across
# engines; the 20 cell terms route through DECIMAL so the final sum is
# order-independent. Emitted in floored micro-units + degrees of
# freedom.

def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("bucket"), "event_type"
    )
    cells = ev.groupBy("bucket", "event_type").agg(F.count(F.lit(1)).alias("o"))
    rows = ev.groupBy("bucket").agg(F.count(F.lit(1)).alias("row_n"))
    cols = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("col_n"))
    n = ev.count()  # tiny scalar; the contingency table is bounded
    term = (
        (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    ).cast("decimal(28,12)")
    scored = (
        cells.join(F.broadcast(rows), "bucket")
        .join(F.broadcast(cols), "event_type")
        .withColumn("e", F.col("row_n") * F.col("col_n") / F.lit(float(n)))
        .select(term.alias("t"))
    )
    return scored.agg(
        F.floor(_dec_to_double(F.sum("t")) * F.lit(1000000.0) + F.lit(0.5))
        .cast("long")
        .alias("chi2_micro"),
        F.lit((4 - 1) * (5 - 1)).cast("long").alias("dof"),
    )


SQL_CHI_SQUARE = """
WITH base AS (
  SELECT user_id % 4 AS bucket, event_type FROM events
),
cells AS (SELECT bucket, event_type, COUNT(*) AS o FROM base GROUP BY 1, 2),
rows_n AS (SELECT bucket, COUNT(*) AS row_n FROM base GROUP BY 1),
cols_n AS (SELECT event_type, COUNT(*) AS col_n FROM base GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),
terms AS (
  SELECT CAST((o - e) * (o - e) / e AS DECIMAL(28,12)) AS t
  FROM (
    SELECT c.o, r.row_n * cl.col_n / t.n AS e
    FROM cells c JOIN rows_n r ON c.bucket = r.bucket
    JOIN cols_n cl ON c.event_type = cl.event_type
    CROSS JOIN tot t
  )
)
SELECT CAST(FLOOR(CAST(CAST(SUM(t) AS VARCHAR) AS DOUBLE) * 1000000.0 + 0.5)
    AS BIGINT) AS chi2_micro,
  CAST(12 AS BIGINT) AS dof
FROM terms
"""


# ===========================================================================
# Q: gapfill_interp — linear-interpolation gap fill over the hourly grid
# ===========================================================================
#
# gapfill_hourly zero-fills; this interpolates: an empty hour takes
# prev + (next − prev) · (h − h_prev)/(h_next − h_prev) between its
# day's nearest observed hours (edges stay null). Interpolation is
# scoped WITHIN each day, so every window partitions on a date key —
# no single-partition exchange at any scale, and the grid is bounded
# by the calendar (days × 24), not the fact count. The fraction is a
# ratio of small integers, so the double arithmetic is bit-identical
# across engines.

def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("h")
    ).agg(dsum("value", "s"))
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    spine = days.select("day", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"))
    grid = spine.join(hourly, ["day", "h"], "left")
    w_b = Window.partitionBy("day").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_f = Window.partitionBy("day").orderBy(F.col("h").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    obs_h = F.when(F.col("s").isNotNull(), F.col("h"))
    marked = (
        grid.withColumn("prev_s", F.last("s", ignorenulls=True).over(w_b))
        .withColumn("prev_h", F.last(obs_h, ignorenulls=True).over(w_b))
        .withColumn("next_s", F.last("s", ignorenulls=True).over(w_f))
        .withColumn("next_h", F.last(obs_h, ignorenulls=True).over(w_f))
    )
    frac = (F.col("h") - F.col("prev_h")) / (F.col("next_h") - F.col("prev_h"))
    interp = F.col("prev_s") + (F.col("next_s") - F.col("prev_s")) * frac
    return marked.select(
        "day",
        "h",
        F.when(F.col("s").isNotNull(), F.col("s"))
        .otherwise(
            F.when(F.col("prev_h").isNotNull() & F.col("next_h").isNotNull(), interp)
        )
        .alias("s_filled"),
        F.col("s").isNotNull().alias("was_observed"),
    )


SQL_GAPFILL_INTERP = """
WITH hourly AS (
  SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS h,
    CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
spine AS (
  SELECT day, CAST(UNNEST(range(24)) AS INT) AS h
  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day
        FROM events WHERE event_type = 'purchase')
),
grid AS (
  SELECT sp.day, sp.h, hr.s
  FROM spine sp LEFT JOIN hourly hr ON sp.day = hr.day AND sp.h = hr.h
),
marked AS (
  SELECT day, h, s,
    last_value(s IGNORE NULLS) OVER wb AS prev_s,
    last_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS) OVER wb AS prev_h,
    last_value(s IGNORE NULLS) OVER wf AS next_s,
    last_value(CASE WHEN s IS NOT NULL THEN h END IGNORE NULLS) OVER wf AS next_h
  FROM grid
  WINDOW wb AS (PARTITION BY day ORDER BY h ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY day ORDER BY h DESC ROWS UNBOUNDED PRECEDING)
)
SELECT day, h,
  CASE WHEN s IS NOT NULL THEN s
       WHEN prev_h IS NOT NULL AND next_h IS NOT NULL
         -- the ratio MUST be parenthesized: a*(b/c) and (a*b)/c differ
         -- in the last ulp, and the Spark side computes the ratio first
         THEN prev_s + (next_s - prev_s)
              * ((CAST(h AS DOUBLE) - prev_h) / (next_h - prev_h))
  END AS s_filled,
  s IS NOT NULL AS was_observed
FROM marked
"""


# ===========================================================================
# Q: cdc_apply — changelog materialization (latest-wins with deletes)
# ===========================================================================
#
# The Debezium-shaped half of the lakehouse ingest story that
# merge_upsert (two-table MERGE) doesn't cover: a totally-ordered
# change stream of I/U/D ops collapses to current table state — keep
# each key's highest-LSN row, drop keys whose last op is a delete.
# One shuffle (the per-key window keyed on the high-cardinality key);
# at scale this is exactly compaction of a CDC topic into a snapshot.

def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "purchase", "D")
        .otherwise("U")
        .alias("op"),
        F.floor(F.col("value") * 1e6).cast("long").alias("value_micro"),
    )
    w = Window.partitionBy("k").orderBy(F.col("lsn").desc())
    latest = ev.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return latest.filter(F.col("op") != "D").select(
        "k", "lsn", "op", "value_micro"
    )


SQL_CDC_APPLY = """
WITH c AS (
  SELECT user_id AS k, event_id AS lsn,
    CASE event_type WHEN 'signup' THEN 'I'
                    WHEN 'purchase' THEN 'D'
                    ELSE 'U' END AS op,
    CAST(FLOOR(value * 1e6) AS BIGINT) AS value_micro,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT k, lsn, op, value_micro FROM c WHERE rn = 1 AND op <> 'D'
"""


# ===========================================================================
# Q: skew_profile / skew_join — the skew toolkit, driver-checkable
# ===========================================================================
#
# operators.skew: explain_skew is the diagnostic (heaviest keys with
# their share — what you run BEFORE choosing a mitigation);
# salted_join is the mitigation, and its oracle is the PLAIN join —
# the parity check IS the semantic-transparency proof that salting
# never changes results, only the shuffle layout.

def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.operators.skew import explain_skew

    tr = transfers_from_events(_t(spark, sf_dir, "events"))
    prof = explain_skew(tr, ["token_address"], top=10)
    return prof.select(
        "token_address",
        "n",
        F.floor(F.col("share") * 1e6).cast("long").alias("share_ppm"),
    )


SQL_SKEW_PROFILE = f"""
WITH transfers AS ({TRANSFERS_SQL}),
c AS (
  SELECT token_address, CAST(COUNT(*) AS BIGINT) AS n FROM transfers
  GROUP BY token_address
)
SELECT token_address, n,
  CAST(FLOOR(n / (SELECT CAST(COUNT(*) AS DOUBLE) FROM transfers) * 1e6)
       AS BIGINT) AS share_ppm
FROM c ORDER BY n DESC, token_address ASC LIMIT 10
"""


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineering_spark.functions.scalars import dsum
    from dataengineering_spark.operators.skew import salted_join

    tr = transfers_from_events(_t(spark, sf_dir, "events")).select(
        "token_address", "sender_address", "coin_value_usd"
    )
    dim = tr.groupBy("token_address").agg(
        dsum("coin_value_usd", "token_total")
    )
    joined = salted_join(tr, dim, on=["token_address"], n_salts=8)
    return joined.groupBy("token_address", "sender_address").agg(
        F.count(F.lit(1)).alias("n_transfers"),
        F.max("token_total").alias("token_total"),
        dsum("coin_value_usd", "sender_value"),
    )


SQL_SKEW_JOIN = f"""
WITH transfers AS ({TRANSFERS_SQL}),
dim AS (
  SELECT token_address, {DSUM.format(e="coin_value_usd")} AS token_total
  FROM transfers GROUP BY token_address
)
SELECT t.token_address, t.sender_address,
  CAST(COUNT(*) AS BIGINT) AS n_transfers,
  MAX(d.token_total) AS token_total,
  {DSUM.format(e="t.coin_value_usd")} AS sender_value
FROM transfers t JOIN dim d ON t.token_address = d.token_address
GROUP BY t.token_address, t.sender_address
"""


# ===========================================================================
# Q: rollup_cascade — hypertable-style hierarchical rollup (min→hour→day)
# ===========================================================================
#
# Continuous-aggregate cascade: raw events are scanned ONCE into
# minute partials; hours aggregate the minute partials, days the hour
# partials — at 100 TB the coarse windows never touch raw data again,
# and the same partials serve incremental refresh (only dirty minutes
# recompute). Exactness: sums stay DECIMAL through every level
# (decimal addition is associative, so cascade ≡ direct aggregation
# bit-for-bit); the one double cast happens at the end. The oracle
# aggregates raw→day directly, proving the cascade lossless.

def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("minute", F.col("ts")).alias("minute"), "value"
    )
    minutes = ev.groupBy("minute").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    hours = (
        minutes.withColumn("hour", F.date_trunc("hour", F.col("minute")))
        .groupBy("hour")
        .agg(
            F.sum("_s").cast("decimal(18,6)").alias("_s"),
            F.sum("_n").alias("_n"),
            F.count(F.lit(1)).alias("_minutes"),
        )
    )
    days = (
        hours.withColumn("day", F.date_trunc("day", F.col("hour")))
        .groupBy("day")
        .agg(
            _dec_to_double(F.sum("_s")).alias("sum_value"),
            F.sum("_n").alias("n_events"),
            F.sum("_minutes").alias("n_minutes"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )
    return days.select("day", "n_events", "n_minutes", "n_hours", "sum_value")


SQL_ROLLUP_CASCADE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT date_trunc('minute', ts)) AS BIGINT) AS n_minutes,
  CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours,
  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
    AS sum_value
FROM events GROUP BY 1
"""


# ===========================================================================
# Q: triangle_count — per-node triangle counts over the event graph
# ===========================================================================
#
# The canonical distributed-graph kernel the reference defers to
# TigerGraph (S18-S22). Three ingredients keep it scale-sane:
#  1. the edge list is DISTINCT and canonically oriented a<b first, so
#     the self-joins see |E| rows, not |transfers|, and every triangle
#     is generated exactly once (as a<b<c) instead of 6 times;
#  2. wedges extend only FORWARD (e1.b = e2.a with b<c implied by the
#     orientation), halving the wedge stream;
#  3. the closing check is an equi-join back on (a, c) — three hash
#     joins total, no cartesian anywhere. On power-law graphs the
#     standard refinement is degree-ordering instead of id-ordering
#     (orients wedges away from hubs); id-ordering is kept here
#     because the oracle must mirror it exactly.
# Node ids fold the event stream onto overlapping integer spaces
# (user_id mod 37, event_id mod 101) so the graph is non-bipartite.

def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 37).alias("x"),
        (F.col("event_id") % 101).alias("y"),
    )
    edges = (
        ev.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
        )
        .distinct()
    )
    e1 = edges.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    e2 = edges.select(F.col("a").alias("w_b"), F.col("b").alias("t_c"))
    wedges = e1.join(e2, F.col("t_b") == F.col("w_b")).drop("w_b")
    e3 = edges.select(F.col("a").alias("c_a"), F.col("b").alias("c_c"))
    tris = wedges.join(
        e3, (F.col("t_a") == F.col("c_a")) & (F.col("t_c") == F.col("c_c"))
    )
    return tris.groupBy(F.col("t_a").alias("node")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


SQL_TRIANGLE_COUNT = """
WITH pts AS (
  SELECT user_id % 37 AS x, event_id % 101 AS y FROM events
),
e AS (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM pts WHERE x <> y
)
SELECT e1.a AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
GROUP BY e1.a
"""


# ===========================================================================
# Q: clustering_coefficient — per-node local clustering over the same
# event graph as triangle_count: coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1)).
# tri(v) needs triangle MEMBERSHIP (each a<b<c triangle credits all
# three corners), so the id-ordered triangle stream is unpivoted to
# its three corners before the per-node count; degrees come from the
# same distinct-oriented edge list unpivoted to both endpoints.  Same
# three hash joins as triangle_count plus two fixed 3x/2x explodes —
# no cartesian, no window.  The coefficient is exact-IEEE division of
# two integers, so the oracle replays it bit-for-bit.
# ===========================================================================

def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 37).alias("x"),
        (F.col("event_id") % 101).alias("y"),
    )
    edges = (
        ev.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
        )
        .distinct()
    )
    e1 = edges.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    e2 = edges.select(F.col("a").alias("w_b"), F.col("b").alias("t_c"))
    wedges = e1.join(e2, F.col("t_b") == F.col("w_b")).drop("w_b")
    e3 = edges.select(F.col("a").alias("c_a"), F.col("b").alias("c_c"))
    tris = wedges.join(
        e3, (F.col("t_a") == F.col("c_a")) & (F.col("t_c") == F.col("c_c"))
    )
    tri_per_node = (
        tris.select(
            F.explode(F.array("t_a", "t_b", "t_c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    degrees = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degrees.join(tri_per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
        F.when(
            F.col("degree") >= 2,
            2.0
            * F.coalesce("n_tri", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )


SQL_CLUSTERING_COEFFICIENT = """
WITH pts AS (
  SELECT user_id % 37 AS x, event_id % 101 AS y FROM events
),
e AS (
  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
  FROM pts WHERE x <> y
),
tris AS (
  SELECT e1.a AS t_a, e1.b AS t_b, e2.b AS t_c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
tpn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT unnest([t_a, t_b, t_c]) AS node FROM tris
  ) GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT unnest([a, b]) AS node FROM e
  ) GROUP BY node
)
SELECT d.node, d.degree,
  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
  CASE WHEN d.degree >= 2
       THEN CAST(2 AS DOUBLE) * COALESCE(t.n_tri, 0)
            / (d.degree * (d.degree - 1))
       ELSE CAST(0 AS DOUBLE) END AS coeff
FROM deg d LEFT JOIN tpn t USING (node)
"""


# ===========================================================================
# Q: reciprocity — DIRECTED-graph mutuality over the event graph:
# per source node, what fraction of its distinct out-edges have the
# reverse edge present.  Same mod-folds as triangle_count but edges
# keep their direction (src = user fold, dst = event fold).  The
# reverse check is a LEFT-SEMI self-join on the swapped key pair —
# existence only, no pair multiplicity.  ratio_ppm is integer-exact
# (floor of an exact-IEEE division of two BIGINTs).
# ===========================================================================

def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 37).alias("src"),
        (F.col("event_id") % 101).alias("dst"),
    )
    edges = ev.filter(F.col("src") != F.col("dst")).distinct()
    rev = edges.select(
        F.col("dst").alias("r_src"), F.col("src").alias("r_dst")
    )
    mutual = edges.join(
        rev,
        (F.col("src") == F.col("r_src")) & (F.col("dst") == F.col("r_dst")),
        "left_semi",
    )
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    n_recip = mutual.groupBy("src").agg(F.count(F.lit(1)).alias("n_recip"))
    return out_deg.join(n_recip, "src", "left").select(
        F.col("src").alias("node"),
        "out_deg",
        F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
        F.floor(
            F.coalesce("n_recip", F.lit(0))
            * F.lit(1000000.0)
            / F.col("out_deg")
            + F.lit(0.5)
        ).alias("recip_ppm"),
    )


SQL_RECIPROCITY = """
WITH e AS (
  SELECT DISTINCT user_id % 37 AS src, event_id % 101 AS dst
  FROM events WHERE user_id % 37 <> event_id % 101
),
m AS (
  SELECT e.src, CAST(COUNT(*) AS BIGINT) AS n_recip
  FROM e WHERE EXISTS (
    SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src
  )
  GROUP BY e.src
),
d AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY src
)
SELECT d.src AS node, d.out_deg,
  CAST(COALESCE(m.n_recip, 0) AS BIGINT) AS n_recip,
  CAST(FLOOR(COALESCE(m.n_recip, 0) * 1000000.0 / d.out_deg + 0.5)
    AS BIGINT) AS recip_ppm
FROM d LEFT JOIN m ON d.src = m.src
"""


# ===========================================================================
# Q: xcorr_lag — lead-lag analysis: Pearson correlation between the
# click-value and purchase-value DAILY series at day offsets −3..+3
# (does purchase volume follow click volume?).  The lag fanout is an
# in-row explode of a 7-element sequence — never a cross join — and
# the per-lag moments follow the value_correlation discipline: all
# six sums in DECIMAL (order-independent, engine-identical), doubles
# only in the final corr expression, emitted as floored ppm.
# ===========================================================================

XCORR_MAX_LAG = 3


def q_xcorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("v"))
    )
    x = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("v").alias("x")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("y_day"), F.col("v").alias("y")
    )
    lagged = x.select(
        "day",
        "x",
        F.explode(
            F.sequence(F.lit(-XCORR_MAX_LAG), F.lit(XCORR_MAX_LAG))
        ).alias("lag"),
    )
    j = lagged.join(
        y, F.col("y_day") == F.date_add(F.col("day"), F.col("lag"))
    )
    agg = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n = F.col("n_days").cast("double")
    dd = {c: _dec_to_double(F.col(c)) for c in ("sx", "sy", "sxy", "sx2", "sy2")}
    num = n * dd["sxy"] - dd["sx"] * dd["sy"]
    den = F.sqrt(
        (n * dd["sx2"] - dd["sx"] * dd["sx"])
        * (n * dd["sy2"] - dd["sy"] * dd["sy"])
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n_days",
        F.floor(num / den * F.lit(1000000.0) + F.lit(0.5)).alias("corr_ppm"),
    )


SQL_XCORR_LAG = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
    SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
),
x AS (SELECT day, v AS x FROM daily WHERE event_type = 'click'),
y AS (SELECT day AS y_day, v AS y FROM daily WHERE event_type = 'purchase'),
lagged AS (
  SELECT day, x, CAST(unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG + 1}))
    AS INT) AS lag
  FROM x
),
m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
    SUM(x * x) AS sx2, SUM(y * y) AS sy2
  FROM lagged JOIN y ON y_day = day + lag
  GROUP BY lag
),
d AS (
  SELECT lag, n_days, CAST(n_days AS DOUBLE) AS nd,
    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(sx2 AS VARCHAR) AS DOUBLE) AS sx2,
    CAST(CAST(sy2 AS VARCHAR) AS DOUBLE) AS sy2
  FROM m
)
SELECT lag, n_days,
  CAST(FLOOR((nd * sxy - sx * sy)
      / sqrt((nd * sx2 - sx * sx) * (nd * sy2 - sy * sy))
      * 1000000.0 + 0.5) AS BIGINT) AS corr_ppm
FROM d
"""


# ===========================================================================
# Q: gini_by_source — per-source Gini coefficient of document length:
# the inequality summary behind "is this source a few mega-docs or
# many uniform snippets".  G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n with x
# ranked ascending (ties broken by doc_id so the rank is total and
# engine-identical).  All sums are BIGINT (Σ i·x stays under 2^53 so
# the final double conversion is exact); doubles only in the last
# expression, emitted as floored ppm.
# ===========================================================================

def q_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    nd = F.col("n_docs").cast("double")
    return agg.select(
        "source",
        "n_docs",
        F.col("sx").alias("total_chars"),
        F.floor(
            (
                F.lit(2.0) * F.col("six") / (nd * F.col("sx"))
                - (nd + F.lit(1.0)) / nd
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).alias("gini_ppm"),
    )


SQL_GINI_BY_SOURCE = """
WITH r AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
      AS BIGINT) AS i
  FROM documents
),
m AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(i * x) AS BIGINT) AS six
  FROM r GROUP BY source
)
SELECT source, n_docs, sx AS total_chars,
  CAST(FLOOR(
    (2.0 * six / (CAST(n_docs AS DOUBLE) * sx)
     - (CAST(n_docs AS DOUBLE) + 1.0) / CAST(n_docs AS DOUBLE))
    * 1000000.0 + 0.5) AS BIGINT) AS gini_ppm
FROM m
"""


ANALYTICS_QUERIES: dict[str, tuple] = {
    "triangle_count": (
        q_triangle_count,
        SQL_TRIANGLE_COUNT,
        "graph:triangle counting",
    ),
    "reciprocity": (
        q_reciprocity,
        SQL_RECIPROCITY,
        "graph:directed mutuality",
    ),
    "xcorr_lag": (
        q_xcorr_lag,
        SQL_XCORR_LAG,
        "timeseries:lead-lag cross-correlation",
    ),
    "gini_by_source": (
        q_gini_by_source,
        SQL_GINI_BY_SOURCE,
        "corpus:length inequality",
    ),
    "clustering_coefficient": (
        q_clustering_coefficient,
        SQL_CLUSTERING_COEFFICIENT,
        "graph:local clustering coefficient",
    ),
    "rollup_cascade": (
        q_rollup_cascade,
        SQL_ROLLUP_CASCADE,
        "timeseries:hypertable rollup cascade",
    ),
    "cdc_apply": (
        q_cdc_apply,
        SQL_CDC_APPLY,
        "maintenance:CDC latest-wins apply",
    ),
    "skew_profile": (
        q_skew_profile,
        SQL_SKEW_PROFILE,
        "scale:skew diagnostic",
    ),
    "skew_join": (
        q_skew_join,
        SQL_SKEW_JOIN,
        "scale:salted-join transparency",
    ),
    "props_json": (q_props_json, SQL_PROPS_JSON, "analytics:JSON extraction"),
    "gapfill_interp": (
        q_gapfill_interp,
        SQL_GAPFILL_INTERP,
        "timeseries:linear-interp gap fill",
    ),
    "ohlc_hourly": (q_ohlc_hourly, SQL_OHLC_HOURLY, "timeseries:OHLC bars"),
    "chi_square": (q_chi_square, SQL_CHI_SQUARE, "analytics:chi-square independence"),
    "scd2_lookup": (
        q_scd2_lookup,
        SQL_SCD2_LOOKUP,
        "analytics:point-in-time temporal join",
    ),
    "status_priority_sets": (
        q_status_priority_sets,
        SQL_STATUS_PRIORITY_SETS,
        "analytics:GROUPING SETS",
    ),
    "session_bounds": (
        q_session_bounds,
        SQL_SESSION_BOUNDS,
        "analytics:first/last/nth_value",
    ),
    "incremental_agg": (
        q_incremental_agg,
        SQL_INCREMENTAL_AGG,
        "ivm:partial-aggregate merge",
    ),
    "user_drawdown": (q_user_drawdown, SQL_USER_DRAWDOWN, "analytics:running-max drawdown"),
    "value_cume": (q_value_cume, SQL_VALUE_CUME, "analytics:percent_rank/cume_dist"),
    "user_event_sequence": (
        q_user_event_sequence,
        SQL_USER_EVENT_SEQUENCE,
        "analytics:ordered sequence build",
    ),
    "merge_upsert": (q_merge_upsert, SQL_MERGE_UPSERT, "maintenance:MERGE upsert"),
    "table_checksum": (
        q_table_checksum,
        SQL_TABLE_CHECKSUM,
        "reconciliation:content fingerprint",
    ),
    "sales_cube": (q_sales_cube, SQL_SALES_CUBE, "analytics:CUBE lattice"),
    "bloom_prune": (q_bloom_prune, SQL_BLOOM_PRUNE, "scale:Bloom semi-join pruning"),
    "value_correlation": (
        q_value_correlation,
        SQL_VALUE_CORRELATION,
        "analytics:exact-moment Pearson",
    ),
    "quantile_bins": (q_quantile_bins, SQL_QUANTILE_BINS, "analytics:NTILE binning"),
    "event_unpivot": (q_event_unpivot, SQL_EVENT_UNPIVOT, "analytics:UNPIVOT melt"),
    "user_diversity": (
        q_user_diversity,
        SQL_USER_DIVERSITY,
        "analytics:entropy+Gini diversity",
    ),
    "concurrency_peak": (
        q_concurrency_peak,
        SQL_CONCURRENCY_PEAK,
        "analytics:interval sweep-line",
    ),
    "ewma_daily": (q_ewma_daily, SQL_EWMA_DAILY, "timeseries:EWMA"),
    "degree_distribution": (
        q_degree_distribution,
        SQL_DEGREE_DISTRIBUTION,
        "graph:degree histogram",
    ),
    "fuzzy_match": (q_fuzzy_match, SQL_FUZZY_MATCH, "dedup:blocked Levenshtein"),
    "zorder_key": (q_zorder_key, SQL_ZORDER_KEY, "layout:Z-order clustering key"),
    "countmin_topk": (
        q_countmin_topk,
        SQL_COUNTMIN_TOPK,
        "sketch:Count-Min heavy hitters",
    ),
    "event_transitions": (
        q_event_transitions,
        SQL_EVENT_TRANSITIONS,
        "analytics:Markov transitions",
    ),
    "funnel_steps": (q_funnel_steps, SQL_FUNNEL_STEPS, "analytics:funnel"),
    "cohort_retention": (
        q_cohort_retention,
        SQL_COHORT_RETENTION,
        "analytics:cohort retention",
    ),
    "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY, "analytics:SCD2 intervals"),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF, "analytics:snapshot diff"),
    "pagerank": (q_pagerank, SQL_PAGERANK, "graph:iterative PageRank"),
    "kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT, "sketch:KMV distinct"),
    "kmv_merge": (q_kmv_merge, SQL_KMV_MERGE, "sketch:KMV union-merge"),
    "kmv_intersect": (
        q_kmv_intersect,
        SQL_KMV_INTERSECT,
        "sketch:KMV intersection estimate",
    ),
    "hll_merge": (q_hll_merge, SQL_HLL_MERGE, "sketch:DataSketches HLL merge"),
    "table_profile": (q_table_profile, SQL_TABLE_PROFILE, "profiling:one-scan stats"),
    "gapfill_hourly": (q_gapfill_hourly, SQL_GAPFILL_HOURLY, "timeseries:gap-fill"),
    "rolling_24h": (q_rolling_24h, SQL_ROLLING_24H, "timeseries:RANGE window"),
    "rolling_24h_decomposed": (
        q_rolling_24h_decomposed,
        SQL_ROLLING_24H,
        "timeseries:bucketed trailing-window decomposition",
    ),
    "histogram_merge": (
        q_histogram_merge,
        SQL_HISTOGRAM_MERGE,
        "profiling:mergeable histogram",
    ),
    "priority_line_counts": (q_priority_line_counts, SQL_PRIORITY_LINE_COUNTS, "A1-over-join,J4"),
    "promo_revenue": (q_promo_revenue, SQL_PROMO_REVENUE, "F4-ratio,J2"),
    "dormant_customers": (q_dormant_customers, SQL_DORMANT_CUSTOMERS, "U2-anti,A5-scalar"),
    "value_percentiles": (q_value_percentiles, SQL_VALUE_PERCENTILES, "analytics:percentiles"),
    "returns_rollup": (q_returns_rollup, SQL_RETURNS_ROLLUP, "analytics:rollup"),
    "user_event_pivot": (q_user_event_pivot, SQL_USER_EVENT_PIVOT, "A4-general"),
    "topk_per_group": (q_topk_per_group, SQL_TOPK_PER_GROUP, "W2-general,O2"),
    "active_customers": (q_active_customers, SQL_ACTIVE_CUSTOMERS, "J-semi"),
    "log_index_desc": (q_log_index_desc, SQL_LOG_INDEX_DESC, "W1,O1-desc"),
    "user_type_universe": (q_user_type_universe, SQL_USER_TYPE_UNIVERSE, "A7"),
}
