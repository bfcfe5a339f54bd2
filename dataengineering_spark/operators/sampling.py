"""Deterministic sampling for training-data pipelines.

``df.sample``/``sampleBy`` draw from a seeded RNG whose stream depends
on partitioning — re-running after a repartition (or on another
engine) yields a different sample, which is poison for reproducible
dataset builds. Everything here derives membership from md5 of the
row's own key, so the sample is a pure function of the data: stable
under retries, re-partitioning, engine changes, and incremental
re-runs (a new batch's rows join the sample independently of history
— the property that makes hash-sampling the standard for LLM corpus
subsetting).

Scale shape: ``hash_sample`` is a pure filter (codegen, pushes through
joins, no shuffle). ``stratified_sample`` ranks by hash within each
stratum through the two-stage top-k (rank within
(spark_partition_id, stratum) first), so low-cardinality strata never
serialize onto one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_hash(col: Column | str, salt: str = "") -> Column:
    """uint32 sampling hash of ``salt|col`` — the md5-derived value
    both membership tests below share. Engine-portable (DuckDB mirror:
    :func:`sample_hash_sql`)."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(f"{salt}|"), c.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def sample_hash_sql(expr: str, salt: str = "") -> str:
    from dataengineering_spark.operators.dedup import hex32_sql

    keyed = f"'{salt}|' || CAST({expr} AS VARCHAR)"
    return f"CAST({hex32_sql(f'md5({keyed})')} AS BIGINT)"


def hash_sample(
    df: DataFrame, col: str, denom: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose sampling hash is ≡ 0 (mod denom) — a stable
    ~1/denom sample keyed on ``col``. Different ``salt`` values give
    independent samples over the same keys."""
    return df.filter(sample_hash(col, salt) % denom == 0)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash rank
    (ties broken by the key itself) — a deterministic quota sample.
    Two-stage ranking keeps giant strata off single tasks."""
    h = sample_hash(key_col, salt).alias("_h")
    base = df.select("*", h)
    order = [F.col("_h"), F.col(key_col)]
    w_local = Window.partitionBy(F.spark_partition_id(), *strata_cols).orderBy(*order)
    pruned = (
        base.withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= n_per_stratum)
        .drop("_lr")
    )
    w = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn", "_h")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    source_col: str,
    rates_ppm: dict[str, int],
    default_ppm: int = 1_000_000,
    salt: str = "mix",
) -> DataFrame:
    """Per-source mixture weighting — the pretraining dataset-mixing
    primitive: each source keeps a deterministic ``rate/1e6`` fraction
    of its rows (hash-membership, so the mixture is reproducible under
    retries, repartitioning, and incremental re-runs, and a source's
    sample is a strict superset of any lower rate's).

    Scale shape: the rates table is a broadcast dim (never a shuffle);
    membership is one codegen'd filter on the fact stream.
    """
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(s, int(r)) for s, r in sorted(rates_ppm.items())],
        f"{source_col} string, _rate_ppm int",
    )
    keyed = df.join(F.broadcast(rates), source_col, "left").withColumn(
        "_rate_ppm", F.coalesce(F.col("_rate_ppm"), F.lit(int(default_ppm)))
    )
    return keyed.filter(
        sample_hash(key_col, salt) % 1_000_000 < F.col("_rate_ppm")
    ).drop("_rate_ppm")


def dataset_split(
    df: DataFrame,
    key_col: str,
    boundaries_pct: tuple[int, int] = (80, 90),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — no row
    ever changes split across re-runs, engines, or incremental
    appends (the leakage guarantee RNG-based splits cannot give).
    ``boundaries_pct=(80, 90)`` → 80/10/10. Pure codegen projection;
    nothing shuffles.
    """
    lo, hi = boundaries_pct
    if not 0 < lo < hi <= 100:
        raise ValueError(f"bad boundaries {boundaries_pct}")
    h = sample_hash(key_col, salt) % 100
    return df.withColumn(
        split_col,
        F.when(h < lo, F.lit("train"))
        .when(h < hi, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str,
    salt: str = "wsample",
    priority_col: str = "_priority",
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement:
    each row gets priority u**(1/w) with u uniform in (0,1] derived
    from the row key's sampling hash, and the global top-``n``
    priorities win. Inclusion probability is proportional to weight
    (exactly the A-Res reservoir scheme), yet selection is fully
    deterministic and append-stable: a row's priority never changes,
    so re-runs and engine ports agree row-for-row.

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-n then a single merge of partition heads; no
    global sort materializes.

    Exactness note: ``pow`` is not required to be correctly rounded by
    IEEE-754, so cross-engine bit-parity of priorities is guaranteed
    only for weights that are powers of two, where u**(1/w) is a
    chain of ``sqrt`` (which IS correctly rounded). The oracle-checked
    registry query pins such weights; arbitrary weights remain valid
    for production use.
    """
    u = (sample_hash(key_col, salt) + F.lit(1)).cast("double") / F.lit(
        float(2**32)
    )
    w = F.col(weight_col).cast("double")
    pri = F.when(w == 1.0, u)
    x = u
    for k in (2.0, 4.0, 8.0, 16.0):
        x = F.sqrt(x)
        pri = pri.when(w == k, x)
    pri = pri.otherwise(F.pow(u, F.lit(1.0) / w))
    out = df.withColumn(priority_col, pri)
    return out.orderBy(
        F.col(priority_col).desc(), F.col(key_col).asc()
    ).limit(n)


def epoch_upsample(
    df: DataFrame,
    epochs_col: str,
    key_col: str,
    salt: str = "epoch",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Materialize a pretraining mixture's UPSAMPLING side: a row with
    ``epochs = 2.5`` appears twice always plus a third time for a
    deterministic hash-chosen 50% of keys — so every source lands
    within one row of its exact target epoch count, reproducibly
    (same keys replicate on every run/engine; appends don't reshuffle
    prior copies). The downsampling side (epochs < 1 → keep-rate
    filter) is :func:`mixture_sample`; together they express an
    arbitrary mixture vector.

    Scale shape: a narrow explode of a per-row 1..n sequence — no
    shuffle; output size is exactly the epoch-weighted corpus. Rows
    whose copy count is 0 vanish (explode of an empty array).
    """
    whole = F.floor(F.col(epochs_col)).cast("int")
    frac_ppm = F.round((F.col(epochs_col) - whole) * 1e6).cast("long")
    extra = (sample_hash(key_col, salt) % 1_000_000 < frac_ppm).cast("int")
    n = (whole + extra).alias("_n_copies")
    seq = F.when(
        n >= 1, F.sequence(F.lit(1), n, F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.select("*", F.explode(seq).alias(copy_col))
