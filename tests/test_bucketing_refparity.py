"""Bucketed co-located joins + reference-semantics property tests +
CSV edge cases + env routing."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataengineering_spark.catalog import build_destination, read_table
from dataengineering_spark.operators.aggregates import (
    link_inputs_agg,
    link_outputs_agg,
    transactions_agg,
)
from dataengineering_spark.sources.bucketing import bucketed_join, write_bucketed
from dataengineering_spark.sources.io import read_any, write_any
from tests.conftest import SF_SMOKE


# --- bucketing --------------------------------------------------------------

def test_bucketed_join_has_no_exchange(spark):
    orders = read_table(spark, "orders", SF_SMOKE)
    lineitem = read_table(spark, "lineitem", SF_SMOKE).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    # disable broadcast so the planner exercises the bucketed path
    # (at real fact⋈fact scale neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # the whole point of bucketing
        assert "SortMergeJoin" in plan
        # and results equal the plain join
        plain = orders.join(lineitem, on=["o_orderkey"])
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


# --- reference-semantics property tests ------------------------------------
# pandas replicas of the reference's grouped aggregators
# (tigergraph/v1/streaming_operator.py:310-348), run against random
# frames — our native aggregations must match the pandas semantics
# including empty-slice→0 and fee totals.

# 2-decimal money values: the engine's oracle-exact sums round inputs
# to 6 decimals by design (functions/scalars.py), so generated values
# stay within that contract and comparisons are exact.
_vals = st.integers(0, 100_000).map(lambda c: c / 100.0)
_row = st.tuples(
    st.integers(0, 5),  # transaction id pool
    st.integers(0, 3),  # sender pool
    st.integers(0, 3),  # receiver pool
    st.integers(0, 2),  # type
    _vals,
    _vals,
)


def _to_spark(spark, rows):
    data = [
        (
            f"tx{t}",
            f"s{s}",
            f"r{r}",
            ty,
            float(cv),
            float(fee),
            float(cv) * 2.0,
            float(fee) * 2.0,
            f"2024-01-{(i % 27) + 1:02d} 00:00:00",
        )
        for i, (t, s, r, ty, cv, fee) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "transaction_id string, sender_address string, receiver_address string,"
        "type int, coin_value double, fee double, coin_value_usd double,"
        "fee_usd double, block_date_time string",
    )
    return df.withColumn("block_date_time", F.to_timestamp("block_date_time"))


def _close(a, b):
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


@settings(deadline=None, max_examples=15, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_row, min_size=1, max_size=40))
def test_transactions_agg_matches_reference_pandas(spark, rows):
    df = _to_spark(spark, rows)
    ours = {r.transaction_id: r for r in transactions_agg(df).collect()}

    pdf = df.toPandas()

    def ref_agg(g: pd.DataFrame) -> pd.Series:
        # the reference's aggregator, verbatim semantics:
        # conditional sums over type slices; empty slice sums to 0.0
        return pd.Series(
            {
                "external_value": g.loc[g["type"] == 0, "coin_value"].sum(),
                "external_value_usd": g.loc[g["type"] == 0, "coin_value_usd"].sum(),
                "internal_value": g.loc[g["type"] == 1, "coin_value"].sum(),
                "internal_value_usd": g.loc[g["type"] == 1, "coin_value_usd"].sum(),
                "token_value_usd": g.loc[g["type"] == 2, "coin_value_usd"].sum(),
                "fee": g["fee"].sum(),
                "fee_usd": g["fee_usd"].sum(),
            }
        )

    theirs = pdf.groupby("transaction_id").apply(ref_agg, include_groups=False)
    assert set(ours) == set(theirs.index)
    for tx, row in theirs.iterrows():
        for col in row.index:
            assert _close(ours[tx][col], row[col]), (tx, col, ours[tx][col], row[col])


@settings(deadline=None, max_examples=10, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_row, min_size=1, max_size=40))
def test_link_aggs_match_reference_pandas(spark, rows):
    df = _to_spark(spark, rows)
    pdf = df.toPandas()

    ours_in = {
        (r.transaction_id, r.sender_address): (r.value, r.value_usd)
        for r in link_inputs_agg(df).collect()
    }
    native = pdf[pdf["type"].isin([0, 1])]
    for (tx, snd), g in pdf.groupby(["transaction_id", "sender_address"]):
        n = native[(native["transaction_id"] == tx) & (native["sender_address"] == snd)]
        want_v = (n["coin_value"] + n["fee"]).sum()
        want_u = (n["coin_value_usd"] + n["fee_usd"]).sum()
        got_v, got_u = ours_in[(tx, snd)]
        assert _close(got_v, want_v) and _close(got_u, want_u)

    ours_out = {
        (r.transaction_id, r.receiver_address): (r.value, r.value_usd)
        for r in link_outputs_agg(df).collect()
    }
    for (tx, rcv), g in pdf.groupby(["transaction_id", "receiver_address"]):
        n = native[(native["transaction_id"] == tx) & (native["receiver_address"] == rcv)]
        got_v, got_u = ours_out[(tx, rcv)]
        assert _close(got_v, n["coin_value"].sum())
        assert _close(got_u, n["coin_value_usd"].sum())


# --- CSV edge cases (reference integration fixture: strings with
# commas/quotes, tests/test_clickhouse.py:45-109) ------------------------

def test_csv_round_trip_hostile_strings(spark, tmp_path):
    rows = [
        (1, 'comma, inside', 'quote " inside', "newline\ninside"),
        (2, "both, \" and ,", "", None),
        (3, "unicode ✓ é", "tab\tinside", "trailing space "),
    ]
    df = spark.createDataFrame(rows, "id int, a string, b string, c string")
    path = str(tmp_path / "csv")
    # Spark CSV *write* strips cell whitespace by default — disable to
    # preserve payloads byte-for-byte (reference ships raw CSV bodies)
    write_any(
        df,
        path,
        fmt="CSVWithNames",
        ignoreLeadingWhiteSpace="false",
        ignoreTrailingWhiteSpace="false",
    )
    back = read_any(spark, path, fmt="CSVWithNames", schema=df.schema, multiLine="true")
    got = sorted([tuple(r) for r in back.collect()], key=repr)
    # CSV cannot distinguish empty string from null (both serialize to
    # nothing) — the same ambiguity the reference's CSVWithNames bodies
    # have; normalize '' → None in the expectation.
    want = sorted(
        [tuple(None if c == "" else c for c in r) for r in rows], key=repr
    )
    assert got == want


def test_build_destination_env_routing():
    assert build_destination("prices", "daily", "production") == "prices.daily"
    assert build_destination("prices", "daily", "development") == "prices_dev.daily"
    with pytest.raises(ValueError):
        build_destination("prices", "daily", "staging")
