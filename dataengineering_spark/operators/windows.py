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


def _lit_col(name: str) -> Column:
    """Bind ``name`` LITERALLY: backtick-quote so dotted/spaced/hyphened
    names resolve as one column instead of parsing as struct access
    (ADVICE r8 — an F.expr f-string, and bare F.col, both mis-bind)."""
    return F.col("`" + name.replace("`", "``") + "`")


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
    id_cols: Sequence[str],
    window_sec: int = 86400,
    bucket_sec: int = 3600,
    count_col: str = "n_trailing",
    sum_col: str = "sum_trailing",
) -> DataFrame:
    """Per-row trailing ``window_sec`` count + sum over event time —
    the bucketed map-reduce decomposition of ``RANGE BETWEEN
    window_sec-1 PRECEDING AND CURRENT ROW``.

    MEASURED VERDICT (SCALE.md round-7 sf100 A/B, 100M events): the
    plain RANGE window BEAT this decomposition at every tested frame
    density (avg frames 2 / 170 / 670 / 3300 rows: window 24-42 s,
    essentially density-flat; decomposition 97-241 s, and disk-death
    at sparse keys with 1h buckets).  Spark 4's sliding-frame
    count/sum evidently costs O(rows), not O(rows x frame) — use the
    plain window for count/sum trailing metrics.  The operator is
    retained, oracle-checked (``rolling_24h_decomposed``), as the
    composable decomposition pattern for engines/aggregates where
    sliding re-evaluation IS per-frame, and as the bounded-shuffle
    fallback shape.  Decomposition structure:

    1. bucket partials: one (key, bucket) row with count/sum —
       a plain hash aggregate;
    2. full-bucket contribution: each partial explodes to the
       following ``window_sec/bucket_sec - 1`` buckets (24 for a day
       of hours) and re-aggregates — every row in bucket H inherits
       the sum over buckets [H-23, H-1];
    3. current-bucket prefix: a RANGE running window WITHIN the
       bucket — partitions are (key, bucket), bounded by bucket
       density, never a day of events;
    4. edge bucket H-24: an equi-join on (key, bucket-24) filtered to
       ``sec >= t - window_sec + 1`` — fanout bounded by bucket
       density, exactly the rows the day-window only partially
       covers.

    ``id_cols`` must uniquely key rows: every intermediate runs on a
    NARROW projection (ids + key + sec + value only) and the metrics
    join back on ``id_cols`` at the end — the first version of this
    operator carried the full row width through the edge join's
    shuffle and group-by and spilled 50 GB at sf100; narrow frames
    are the difference between a working decomposition and a
    disk-filler.

    Shuffle discipline (the second sf100 lesson — narrow frames
    alone still filled the disk): every step between the in-bucket
    window and the final metrics frame rides the SAME
    ``(key, bucket)`` hash exchange.  The edge sources left-join
    ONTO ``cur`` (already partitioned by (key, bucket) from the
    window), and the per-row edge aggregate groups by
    ``(key, bucket, *ids)`` — a hash partitioning on a SUBSET of
    the grouping/join keys satisfies their clustering requirement,
    so Catalyst inserts no new exchange.  Large shuffles in the
    whole plan: the window exchange, the edge-source exchange, and
    the final ids join back onto ``df`` — everything else is
    aggregate-sized.

    Total work is O(rows + n_buckets x fanout + rows x bucket-density),
    where fanout = ``window_sec/bucket_sec − 1``.  REGIME RULE
    (measured, SCALE.md): the n_buckets x fanout term is the explode
    in step 2, so on SPARSE keys n_buckets ≈ rows and the explode
    manufactures fanout x rows shuffle volume (sf100 natural keys:
    95.6M buckets x 23 ≈ 2.2B rows, >51 GB of shuffle → disk-death).
    If using this operator at all, size ``bucket_sec`` so expected
    rows per (key, bucket) exceeds the fanout — for sparse keys that
    means ``window_sec/2`` (fanout 1, sf100: 97.2 s where 1h buckets
    died).  The sum stays in DECIMAL end-to-end — decimal addition is
    associative, so regrouping cannot drift vs the windowed form.

    Exactness contract (oracle-checked via ``rolling_24h_decomposed``):
    equals the RANGE window INCLUDING peer rows (ties in ``sec_col``
    all see each other) because step 3 uses a range frame within the
    bucket.  ``window_sec`` must be a multiple of ``bucket_sec``.
    """
    if window_sec % bucket_sec:
        raise ValueError("window_sec must be a multiple of bucket_sec")
    n_full = window_sec // bucket_sec - 1
    ids = list(id_cols)
    val = _lit_col(value_col) if isinstance(value_col, str) else value_col
    # exact integer FLOOR division, NOT (sec/bucket).cast(long):
    # double division truncates toward zero (mis-buckets negative
    # epochs) and loses exactness past 2^53. DIV alone also truncates
    # toward zero, so subtract the pmod first — pmod is in [0, bucket),
    # making the numerator the exact floor multiple. The expr runs on
    # the SAFE internal alias `_sec`, never on the user-supplied name;
    # user columns bind via _lit_col (backtick-quoted literal lookup).
    ev = df.select(
        *[_lit_col(i).alias(i) for i in ids],
        _lit_col(partition_col).alias("_key"),
        _lit_col(sec_col).alias("_sec"),
        val.alias("_val"),
    ).withColumn(
        "_bkt",
        F.expr(
            f"(CAST(_sec AS BIGINT) - pmod(CAST(_sec AS BIGINT),"
            f" {bucket_sec})) DIV {bucket_sec}"
        ),
    )

    partials = ev.groupBy("_key", "_bkt").agg(
        F.count(F.lit(1)).alias("_cnt_b"),
        F.sum("_val").alias("_sum_b"),
    )
    full = (
        partials.select(
            "_key",
            F.explode(
                F.sequence(F.col("_bkt") + 1, F.col("_bkt") + n_full)
            ).alias("_bkt"),
            "_cnt_b",
            "_sum_b",
        )
        .groupBy("_key", "_bkt")
        .agg(
            F.sum("_cnt_b").alias("_cnt_full"),
            F.sum("_sum_b").alias("_sum_full"),
        )
    )

    w_cur = (
        Window.partitionBy("_key", "_bkt")
        .orderBy("_sec")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cur = ev.select(
        *[_lit_col(i) for i in ids],
        "_key",
        "_bkt",
        "_sec",
        F.count(F.lit(1)).over(w_cur).alias("_cnt_cur"),
        F.sum("_val").over(w_cur).alias("_sum_cur"),
    )

    edge_src = ev.select(
        F.col("_key").alias("_ekey"),
        (F.col("_bkt") + window_sec // bucket_sec).alias("_tgt_bkt"),
        F.col("_sec").alias("_esec"),
        F.col("_val").alias("_eval"),
    )
    edge = (
        cur.join(
            edge_src,
            on=[
                F.col("_key") == F.col("_ekey"),
                F.col("_bkt") == F.col("_tgt_bkt"),
                F.col("_esec") >= F.col("_sec") - (window_sec - 1),
            ],
            how="left",
        )
        .groupBy("_key", "_bkt", *[_lit_col(i) for i in ids])
        .agg(
            F.first("_cnt_cur").alias("_cnt_cur"),
            F.first("_sum_cur").alias("_sum_cur"),
            F.count("_esec").alias("_cnt_edge"),
            F.sum("_eval").alias("_sum_edge"),
        )
    )

    zero = F.lit(0)
    metrics = edge.join(full, ["_key", "_bkt"], "left").select(
        *[_lit_col(i) for i in ids],
        (
            F.col("_cnt_cur")
            + F.coalesce("_cnt_full", zero)
            + F.col("_cnt_edge")
        ).alias(count_col),
        (
            F.col("_sum_cur")
            + F.coalesce(F.col("_sum_full"), zero)
            + F.coalesce(F.col("_sum_edge"), zero)
        ).alias(sum_col),
    )
    return df.join(metrics, ids)
