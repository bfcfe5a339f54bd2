"""Tracked persistence for correctness-critical caches.

Some operators MUST materialize an intermediate (e.g.
``token_budget_shards``: RangePartitioner re-samples bounds per job, so
its partition-offset map is only valid against a cached partitioning).
Those persists outlive the builder function — the returned lazy frame
still references them — so the builder cannot unpersist. Registering
the handle here lets the pipeline that eventually *acts* on the frame
release everything it accumulated with one call, instead of leaking
storage-memory until the session dies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release."""
    handle = df.persist()
    _LIVE.append(handle)
    return handle


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call AFTER the consuming action (collect/write) — releasing between
    the builder and the action would re-trigger the partition-stability
    hazard the persist exists to prevent.
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n


def tracked_count() -> int:
    return len(_LIVE)
