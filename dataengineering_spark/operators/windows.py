"""Window operators (SURVEY.md §2.5).

The reference derives ``log_index`` by globally sorting the batch in
pandas and ranking within each transaction (reference
``clickhouse/v1/operator.py:455-470``); that is driver-local and
single-threaded. Here it is a ``row_number`` window: the shuffle is
hash-partitioned by the partition key only, each partition sorts
locally, and nothing ever concentrates on one machine — the same
plan works at 100 TB as at 6k rows.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(sort_columns: Sequence[str] | Mapping[str, bool]) -> list[Column]:
    """Accept the reference's two sort specs: a plain list (all
    ascending) or an {column: ascending} mapping
    (``clickhouse/v1/operator.py:458-465``)."""
    if isinstance(sort_columns, Mapping):
        return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_columns.items()]
    return [F.col(c).asc() for c in sort_columns]


def log_index(
    df: DataFrame,
    partition_by: str = "transaction_id",
    sort_columns: Sequence[str] | Mapping[str, bool] = (),
    output_col: str = "log_index",
) -> DataFrame:
    """1-based ordinal per ``partition_by`` group after a total order.

    Equivalent to the reference's sort + ``groupby(key).rank(
    method="first").astype(int)`` (``clickhouse/v1/operator.py:
    455-470``). pandas rank(method="first") depends on the pre-sort
    order including ties, so callers must pass a tie-breaking total
    order in ``sort_columns`` for deterministic output — the same
    caveat the reference silently has.
    """
    order = _order_cols(sort_columns) or [F.monotonically_increasing_id().asc()]
    w = Window.partitionBy(partition_by).orderBy(*order)
    return df.withColumn(output_col, F.row_number().over(w))


def top1_by_order(
    df: DataFrame,
    order_by: Sequence[Column],
) -> DataFrame:
    """``ORDER BY ... LIMIT 1`` (reference ``clickhouse/utils.py:
    57-60``, the Hedera head-block probe). Implemented as a global
    sort + limit; Spark turns this into a TakeOrdered (per-partition
    top-1 + driver merge of one row per partition), not a full sort."""
    return df.orderBy(*order_by).limit(1)


def trailing_range_agg(
    df: DataFrame,
    partition_col: str,
    sec_col: str,
    value_col: Column | str,
    window_sec: int = 86400,
    bucket_sec: int = 3600,
    count_col: str = "n_trailing",
    sum_col: str = "sum_trailing",
) -> DataFrame:
    """Per-row trailing ``window_sec`` count + sum over event time —
    the bucketed decomposition of ``RANGE BETWEEN window_sec-1
    PRECEDING AND CURRENT ROW``.

    Spark's sliding-frame WindowExec re-evaluates the aggregate
    buffer as the frame moves, so a bare RANGE window costs
    O(rows x avg-frame-size) — the frame is re-materialized per row.
    At dense frames (hundreds of events per key per day) that is the
    dominant cost of the whole query (SCALE.md: 30.7 s at sf100).
    This decomposition is the bounded-fanout alternative:

    1. bucket partials: one (key, bucket) row with count/sum —
       a plain hash aggregate;
    2. full-bucket contribution: each partial explodes to the
       following ``window_sec/bucket_sec - 1`` buckets (FIXED fanout,
       24 for a day of hours) and re-aggregates — every row in bucket
       H inherits the sum over buckets [H-23, H-1] with one broadcast-
       able join on (key, bucket);
    3. current-bucket prefix: a RANGE running window WITHIN the
       bucket — partitions are (key, bucket), bounded by bucket
       density, never a day of events;
    4. edge bucket H-24: an equi-join on (key, bucket-24) filtered to
       ``sec >= t - window_sec + 1`` — fanout bounded by bucket
       density, exactly the rows the day-window only partially covers.

    Total work is O(rows x 24 + rows x bucket-density) instead of
    O(rows x frame-size); the three shuffles all hash on (key,
    bucket), so AQE coalesces them into the same exchange footprint
    at scale.  The sum stays in DECIMAL end-to-end — decimal addition
    is associative, so regrouping cannot drift vs the windowed form
    (the float-vs-decimal story is the caller's, as with the plain
    window).

    Exactness contract (oracle-checked via ``rolling_24h``): equals
    the RANGE window INCLUDING peer rows (ties in ``sec_col`` all see
    each other) because step 3 uses a range frame within the bucket.
    ``window_sec`` must be a multiple of ``bucket_sec``.
    """
    if window_sec % bucket_sec:
        raise ValueError("window_sec must be a multiple of bucket_sec")
    n_full = window_sec // bucket_sec - 1
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    key = F.col(partition_col)
    ev = df.withColumn("_bkt", (F.col(sec_col) / bucket_sec).cast("long"))

    partials = ev.groupBy(partition_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_cnt_b"),
        F.sum(val).alias("_sum_b"),
    )
    full = (
        partials.select(
            partition_col,
            F.explode(
                F.sequence(F.col("_bkt") + 1, F.col("_bkt") + n_full)
            ).alias("_bkt"),
            "_cnt_b",
            "_sum_b",
        )
        .groupBy(partition_col, "_bkt")
        .agg(
            F.sum("_cnt_b").alias("_cnt_full"),
            F.sum("_sum_b").alias("_sum_full"),
        )
    )

    w_cur = (
        Window.partitionBy(partition_col, "_bkt")
        .orderBy(F.col(sec_col))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cur = ev.withColumn("_cnt_cur", F.count(F.lit(1)).over(w_cur)).withColumn(
        "_sum_cur", F.sum(val).over(w_cur)
    )

    edge_src = ev.select(
        key.alias("_ekey"),
        (F.col("_bkt") + window_sec // bucket_sec).alias("_tgt_bkt"),
        F.col(sec_col).alias("_esec"),
        val.alias("_eval"),
    )
    edge = (
        cur.join(
            edge_src,
            on=[
                key == F.col("_ekey"),
                F.col("_bkt") == F.col("_tgt_bkt"),
                F.col("_esec") >= F.col(sec_col) - (window_sec - 1),
            ],
            how="left",
        )
        .groupBy(*[c for c in cur.columns])
        .agg(
            F.count("_esec").alias("_cnt_edge"),
            F.sum("_eval").alias("_sum_edge"),
        )
    )

    zero = F.lit(0)
    out = (
        edge.join(full, [partition_col, "_bkt"], "left")
        .withColumn(
            count_col,
            F.col("_cnt_cur")
            + F.coalesce("_cnt_full", zero)
            + F.coalesce("_cnt_edge", zero),
        )
        .withColumn(
            sum_col,
            F.col("_sum_cur")
            + F.coalesce(F.col("_sum_full"), zero)
            + F.coalesce(F.col("_sum_edge"), zero),
        )
    )
    drop = [
        "_bkt", "_cnt_b", "_sum_b", "_cnt_full", "_sum_full",
        "_cnt_cur", "_sum_cur", "_cnt_edge", "_sum_edge",
    ]
    return out.drop(*[c for c in drop if c in out.columns])
