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

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_TLS = threading.local()


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for later release.

    Inside a :func:`tracking_scope`, the handle registers with that
    scope (released at scope exit) instead of the session-global list.
    """
    handle = df.persist()
    scopes = getattr(_TLS, "scopes", None)
    if scopes:
        scopes[-1].append(handle)
    else:
        _LIVE.append(handle)
    return handle


@contextmanager
def tracking_scope():
    """Scope tracked persists to one pipeline leg.

    ``release_tracked()`` is session-global — calling it inside a
    foreachBatch hook would unpersist OTHER concurrently-running
    pipelines' correctness-critical caches (the RangePartitioner
    bound-stability persists, where a mid-query recompute is a
    correctness hazard, not just wasted work). A scope captures every
    ``persist_tracked`` issued on this thread while it is active and
    unpersists exactly those at exit — run the consuming action
    (write/collect) INSIDE the scope. Thread-local, so concurrent
    streaming queries' hooks never see each other's frames."""
    scopes = getattr(_TLS, "scopes", None)
    if scopes is None:
        scopes = _TLS.scopes = []
    scope: list[DataFrame] = []
    scopes.append(scope)
    try:
        yield
    finally:
        scopes.pop()
        for df in scope:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped; nothing to release


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
