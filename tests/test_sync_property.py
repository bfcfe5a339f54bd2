"""Property test: the sync loop drains exactly once under any
batch_size/streaming_lag combination (the reference's correctness
worry — SURVEY.md §7 risks)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataengineering_spark.streaming.runner import IncrementalSyncRunner, SyncConfig
from dataengineering_spark.streaming.state import SyncStateStore


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batch_size=st.integers(1, 400),
    streaming_lag=st.integers(0, 120),
    n_rows=st.integers(1, 300),
)
def test_sync_drains_exactly_once(spark, tmp_path_factory, batch_size, streaming_lag, n_rows):
    tmp = tmp_path_factory.mktemp("sync_prop")
    src = spark.range(n_rows).select(F.col("id").alias("block"))
    runner = IncrementalSyncRunner(
        spark,
        SyncStateStore(str(tmp / "state")),
        SyncConfig("s", batch_size=batch_size, streaming_lag=streaming_lag),
    )
    seen: list[int] = []

    def sink(df):
        seen.extend(r.block for r in df.collect())

    def dest_max():
        return max(seen) if seen else None

    runner.run_to_head(src, lambda d: d, sink, dest_max)
    head = n_rows - 1
    expected = [b for b in range(n_rows) if b <= head - streaming_lag]
    assert sorted(seen) == expected  # every block once, lag held back
    assert len(seen) == len(set(seen))  # no duplicates ever


def test_load_tables_registers_views(spark):
    from dataengineering_spark.catalog import load_tables

    load_tables(spark, "/root/testdata/sf0.001", names=("nation", "region"))
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey"
    ).collect()[0].n
    assert n == 25
