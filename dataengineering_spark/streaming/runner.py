"""Incremental micro-batch sync runner (SURVEY.md §2.9 T2-T7, §3.3).

Reproduces the reference's hand-built sync loop as an engine
component with Structured-Streaming semantics:

1. ``check_sync_status`` — probe the source head, hold back
   ``streaming_lag`` blocks (the unstable head-of-chain), clamp to
   ``batch_size`` (≙ maxOffsetsPerTrigger), gate on progress
   (``airflow/bitquery.py:208-285``).
2. run the user's batch transform over exactly the proposed
   ``(last_synced, latest]`` range and fan it out to sinks
   (``clickhouse/v1/operator.py:440-499``).
3. ``commit_from_destination`` — re-derive the committed watermark
   from what actually LANDED in the destination, not what was
   attempted (``airflow/bitquery.py:288-351``). A batch that dies
   mid-write self-heals on re-run: the destination max is whatever
   made it durable, so the next range re-covers the gap. Sinks must
   therefore be idempotent per range — which flush_partitions /
   dynamic partition overwrite provides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineering_spark.streaming.state import SyncState, SyncStateStore


@dataclass
class SyncConfig:
    """Knobs mirroring the reference's Variable-driven parameters
    (``airflow/bitquery.py:252-259``)."""

    stream: str
    offset_col: str = "block"
    time_col: str | None = "block_date_time"
    batch_size: int = 100_000
    streaming_lag: int = 0


@dataclass
class SyncRange:
    last_synced: int
    latest: int

    @property
    def should_run(self) -> bool:
        """ShortCircuit gate (``airflow/bitquery.py:271-285``)."""
        return self.latest > self.last_synced


class IncrementalSyncRunner:
    def __init__(self, spark: SparkSession, store: SyncStateStore, config: SyncConfig):
        self.spark = spark
        self.store = store
        self.config = config

    # -- T2: offset negotiation -----------------------------------------

    def check_sync_status(self, source: DataFrame) -> SyncRange:
        state = self.store.get(self.config.stream)
        head_row = source.agg(
            F.max(self.config.offset_col).alias("head")
        ).collect()[0]
        head = head_row.head if head_row.head is not None else -1
        capped = min(
            state.last_synced_block + self.config.batch_size,
            head - self.config.streaming_lag,
        )
        return SyncRange(last_synced=state.last_synced_block, latest=capped)

    def lag_gauge(self, source: DataFrame) -> DataFrame:
        """One-row metrics frame — the reportLatestOffset-style gauge
        a monitoring sink scrapes: how far behind the head this stream
        is and how many batch_size triggers the backlog represents.
        Union rows across runners for a fleet dashboard; write with
        any sink.  The head probe is the same bounded scalar collect
        check_sync_status performs (min/max over the offset column —
        parquet row-group stats, not a scan).

        Columns: stream, last_synced, head, effective_head (head minus
        the held-back streaming_lag), lag_blocks (0 when fully
        drained), backlog_batches (ceil(lag / batch_size))."""
        state = self.store.get(self.config.stream)
        head_row = source.agg(
            F.max(self.config.offset_col).alias("head")
        ).collect()[0]
        head = head_row.head if head_row.head is not None else -1
        effective = head - self.config.streaming_lag
        lag = max(0, effective - state.last_synced_block)
        backlog = -(-lag // self.config.batch_size)
        return self.spark.createDataFrame(
            [
                (
                    self.config.stream,
                    state.last_synced_block,
                    head,
                    effective,
                    lag,
                    backlog,
                )
            ],
            schema=(
                "stream string, last_synced bigint, head bigint, "
                "effective_head bigint, lag_blocks bigint, backlog_batches bigint"
            ),
        )

    # -- T5/T6: one micro-batch -----------------------------------------

    def select_range(self, source: DataFrame, rng: SyncRange) -> DataFrame:
        """Exactly the reference's half-open range predicate
        ``block > last AND block <= latest``
        (``airflow/bitquery.py:68-71``) — pushed down to the scan."""
        c = F.col(self.config.offset_col)
        return source.filter((c > rng.last_synced) & (c <= rng.latest))

    def run_once(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        sink: Callable[[DataFrame], None],
        destination_max: Callable[[], int | None],
    ) -> SyncRange | None:
        """One micro-batch: negotiate range → transform → sink →
        commit-from-destination. Returns the processed range, or None
        when the gate short-circuits."""
        rng = self.check_sync_status(source)
        if not rng.should_run:
            return None
        batch = self.select_range(source, rng)
        sink(transform(batch))
        self.commit_from_destination(destination_max)
        return rng

    # -- T3: destination-derived commit ---------------------------------

    def commit_from_destination(self, destination_max: Callable[[], int | None]) -> SyncState:
        """Commit what landed, not what was attempted (reference
        ``set_latest_block``, ``airflow/bitquery.py:288-351``)."""
        landed = destination_max()
        prev = self.store.get(self.config.stream)
        committed = prev.last_synced_block if landed is None else int(landed)
        state = SyncState(
            last_synced_block=committed,
            last_synced_block_date=prev.last_synced_block_date,
            latest_block=committed,
            latest_block_date=prev.latest_block_date,
        )
        self.store.commit(self.config.stream, state)
        return state

    # -- drain loop ------------------------------------------------------

    def run_to_head(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        sink: Callable[[DataFrame], None],
        destination_max: Callable[[], int | None],
        max_batches: int = 1000,
    ) -> list[SyncRange]:
        """Drain the backlog in batch_size steps — the equivalent of
        repeated scheduler runs of the reference DAG."""
        done: list[SyncRange] = []
        for _ in range(max_batches):
            rng = self.run_once(source, transform, sink, destination_max)
            if rng is None:
                break
            done.append(rng)
        return done
