"""r14 optimization-round regression pins: the small-frame driver
gates must select exactly what their distributed formulations select.
(The global_discrete_pcts gate is fuzz-pinned in test_frontier_fuzz;
this file pins the query-level gates.)"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rfm_segments_driver_gate_matches_distributed(spark, monkeypatch):
    """The rfm quintile-cut driver pull (<=_RFM_DRIVER_MAX users) must
    produce the identical census as the unpivot + keyed discrete_pcts
    pass (forced via threshold 0)."""
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.plans import queries_segments as qs

    gated = _rows(qs.q_rfm_segments(spark, SF))
    release_tracked()
    spark.catalog.clearCache()
    monkeypatch.setattr(qs, "_RFM_DRIVER_MAX", 0)
    distributed = _rows(qs.q_rfm_segments(spark, SF))
    release_tracked()
    assert gated == distributed and len(gated) > 0


def test_global_pct_gate_empty_frame(spark):
    """Empty input: both percentile paths return {name: None}."""
    from dataengineering_spark.operators.robust import global_discrete_pcts

    df = spark.createDataFrame([], "v long, uid long")
    for thr in (100_000, 0):
        got = global_discrete_pcts(
            df, "v", "uid", (0.5,), ("cut",), driver_threshold=thr
        )
        assert got == {"cut": None}
