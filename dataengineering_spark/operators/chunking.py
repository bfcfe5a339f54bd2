"""Document chunking and token-budget sharding — the sequence-prep
stage of a training-data pipeline (context-window chunks, then packing
documents into fixed token-budget shards).

Both operators are pure DataFrame compositions:

- ``chunk_documents``: sliding word-window chunks via a JVM-side
  sequence explode + array slice — no UDF, shuffle-free (narrow maps
  only; output rows ≈ words/stride per doc).
- ``token_budget_shards``: assigns each document (in a stable global
  order) to the training shard its EXCLUSIVE running token total falls
  in — ``seq_id = cum_before // budget``. The global cumulative sum is
  distributed: range-partition by the order key, per-partition totals
  prefix-summed into offsets (one row per partition — bounded by the
  partition count, never the data), then per-partition running sums.
  This is the same two-pass global-rank machinery as the exact
  percentile query, reused for cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineering_spark.functions.text import normalize_text


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_len: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_id, n_chunk_words, chunk_text) sliding windows over
    the normalized word stream: chunk c covers words
    [c*stride, c*stride + chunk_len). Trailing chunks are shorter;
    every word index < n starts at most one chunk (starts are the
    stride grid below n)."""
    words = F.split(normalize_text(text_col), " ")
    d = docs.select(F.col(id_col), words.alias("_w"), F.size(words).alias("_n"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = d.select(
        id_col, "_w", "_n", F.posexplode(starts).alias("chunk_id", "_start")
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.least(F.lit(chunk_len), F.col("_n") - F.col("_start"))
        .cast("long")
        .alias("n_chunk_words"),
        F.concat_ws(
            " ", F.slice("_w", F.col("_start") + 1, F.lit(chunk_len))
        ).alias("chunk_text"),
    )


def token_budget_shards(
    df: DataFrame,
    size_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Input columns plus (cum_before, seq_id, offset_in_seq): the
    document's exclusive running ``size_col`` total in ``order_col``
    order, and the budget-window shard that total falls in. Contiguous
    packing: shard boundaries may split a document across seq_id and
    seq_id+1 — the standard streaming-tokenizer layout where documents
    are concatenated and sliced every ``budget`` tokens."""
    # PERSIST IS CORRECTNESS-CRITICAL, not a cache hint: the totals
    # collect and the caller's final action are two separate jobs, and
    # RangePartitioner re-samples its bounds per execution — without a
    # shared materialization the `_pid` offsets collected in job 1 can
    # misalign with job 2's partitioning (wrong cum_before, and the
    # `_pid` join silently drops rows). The totals job below touches
    # every partition, so the cache is fully built before the offsets
    # are read. The frame stays cached for the caller's action and is
    # registered with ``dataengineering_spark.caching`` — pipelines
    # call ``release_tracked()`` after their consuming action.
    from dataengineering_spark.caching import persist_tracked

    data = persist_tracked(
        df.repartitionByRange(order_col).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    # Per-partition totals prefix-summed ON THE DRIVER: the relation is
    # one row per range partition — bounded metadata of the same class
    # Spark's own RangePartitioner collects for its bounds, never the
    # data. (A window here would need an Exchange SinglePartition,
    # which the plan-shape CI bans outright.)
    totals = data.groupBy("_pid").agg(F.sum(size_col).alias("_pt")).collect()
    running = 0
    offs: list[tuple[int, int]] = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offs.append((int(row["_pid"]), running))
        running += int(row["_pt"] or 0)
    spark = df.sparkSession
    if offs:
        vals = ", ".join(f"({p}, {o})" for p, o in offs)
        offsets = spark.sql(
            f"SELECT col1 AS _pid, CAST(col2 AS BIGINT) AS _off "
            f"FROM (VALUES {vals})"
        )
    else:
        offsets = spark.sql(
            "SELECT CAST(NULL AS INT) AS _pid, CAST(NULL AS BIGINT) AS _off "
            "WHERE 1 = 0"
        )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        data.withColumn(
            "_lc", F.coalesce(F.sum(size_col).over(w_local), F.lit(0))
        )
        .join(F.broadcast(offsets), "_pid")
        .withColumn("cum_before", (F.col("_off") + F.col("_lc")).cast("long"))
    )
    return cum.select(
        *df.columns,
        "cum_before",
        F.expr(f"cum_before DIV {budget}").alias("seq_id"),
        (F.col("cum_before") % budget).alias("offset_in_seq"),
    )
