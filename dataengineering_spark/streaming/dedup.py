"""Streaming exact/content dedup — the streaming face of the batch
dedup tier (``operators/setops.dedup_exact``,
``plans/queries_llm.prefix_dedup``).

A training-data firehose needs duplicates dropped AS DOCUMENTS ARRIVE,
not in a nightly batch. Spark's ``dropDuplicatesWithinWatermark``
gives exactly the right state contract at scale: dedup state is keyed
by the content digest and EVICTED once the watermark passes, so state
size is bounded by (arrival rate × watermark delay), never by corpus
size — the unbounded-state ``dropDuplicates`` on a stream would OOM a
long-running job.

The content key is the SAME expression the batch path uses
(md5 of the normalized text), so batch backfills and the live stream
agree on what counts as a duplicate — operator reuse, not a parallel
implementation.

Reference scope note: the reference dedups via ClickHouse
``OPTIMIZE ... DEDUPLICATE`` on the storage engine
(``clickhouse/v1/utils.py:173-193``); a streaming-arrival dedup has no
reference counterpart and is part of the LLM-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataengineering_spark.functions.text import normalize_text


def content_key(text_col: Column | str = "text") -> Column:
    """Content digest both batch and stream dedup key on: md5 of the
    normalized text (case/punctuation/whitespace-insensitive)."""
    return F.md5(normalize_text(text_col))


def content_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """First-seen pass-through of a document stream: rows whose content
    digest was already emitted within the watermark horizon are
    dropped; state for digests older than ``delay`` is evicted.

    The survivor is the FIRST arrival (stream order) — the streaming
    analogue of batch keep-canonical, where canonical = min doc_id.
    """
    keys = ["_content_key", *(extra_keys or [])]
    out = (
        stream.withColumn("_content_key", content_key(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(keys)
    )
    return out.drop("_content_key")


def content_dedup_batch(
    df: DataFrame,
    text_col: str = "text",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """The batch twin (for backfills and the stream-vs-batch oracle in
    tests): same key expression, dropDuplicates semantics."""
    keys = ["_content_key", *(extra_keys or [])]
    return (
        df.withColumn("_content_key", content_key(text_col))
        .dropDuplicates(keys)
        .drop("_content_key")
    )
