"""Transform primitives (P1-P6, F6, F11), templating compat (F9),
driver helpers (F10), driver-ingest edges (S23-S26), import smoke
(the reference's test strategy #1)."""

from __future__ import annotations

import importlib
import pkgutil

import pytest
from pyspark.sql import functions as F

import dataengineering_spark
from dataengineering_spark.catalog import read_table
from dataengineering_spark.functions.templating import (
    apply_env_variables,
    format_sql_query,
    render_sql,
)
from dataengineering_spark.functions.utils import column_letter, humanize_bytes
from dataengineering_spark.operators.transforms import (
    drop_columns,
    fill_nulls,
    mask_filter,
    rename_columns,
    select_columns,
    sort_rows,
    stringify_keys,
)
from dataengineering_spark.sources.driver_ingest import (
    RetryingFetcher,
    df_to_sheet_rows,
    latest_token_prices,
    sheet_to_df,
)
from tests.conftest import SF_SMOKE


def test_import_smoke_every_module():
    """Every module in the package must import (reference policy,
    README.rst:56-59 / tests/test_import.py)."""
    failures = []
    for mod in pkgutil.walk_packages(
        dataengineering_spark.__path__, prefix="dataengineering_spark."
    ):
        try:
            importlib.import_module(mod.name)
        except Exception as ex:  # noqa: BLE001
            failures.append((mod.name, ex))
    assert not failures, failures


def test_transform_primitives(spark):
    ev = read_table(spark, "events", SF_SMOKE)
    assert select_columns(ev, ["event_id", "value"]).columns == ["event_id", "value"]
    assert "props" not in drop_columns(ev, "props").columns
    renamed = rename_columns(ev, {"event_id": "id", "value": "amount"})
    assert {"id", "amount"} <= set(renamed.columns)
    assert mask_filter(ev, F.col("event_type").isin("click")).select(
        "event_type"
    ).distinct().count() == 1
    assert stringify_keys(ev, "event_id").schema["event_id"].dataType.simpleString() == "string"

    with_null = ev.withColumn(
        "maybe", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    )
    assert fill_nulls(with_null, 0.0, ["maybe"]).filter("maybe IS NULL").count() == 0

    first = sort_rows(ev, {"value": False, "event_id": True}).first()
    top = ev.agg(F.max("value")).collect()[0][0]
    assert first.value == top


def test_templating_compat():
    assert (
        render_sql("SELECT * FROM t WHERE a >= {{ lo }} AND a < {{hi}}", {"lo": 1, "hi": 2})
        == "SELECT * FROM t WHERE a >= 1 AND a < 2"
    )
    with pytest.raises(KeyError, match="missing"):
        render_sql("SELECT {{ missing }}", {})
    assert format_sql_query("SELECT [[ col ]] FROM [[table]]", {"col": "a", "table": "t"}) == "SELECT a FROM t"
    blob = apply_env_variables("SELECT '$ENVV' || '${ENVV}' || '$UNSET_XYZ'", {"ENVV": "x"})
    assert blob == "SELECT 'x' || 'x' || '$UNSET_XYZ'"


def test_driver_helpers():
    assert humanize_bytes(512) == "512.0 B"
    assert humanize_bytes(10 * 1024**2) == "10.0 MB"
    assert column_letter(1) == "A"
    assert column_letter(26) == "Z"
    assert column_letter(27) == "AA"
    assert column_letter(703) == "AAA"


def test_retrying_fetcher_recovers():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("429")
        return "ok"

    assert RetryingFetcher(flaky, sleep=lambda s: None)() == "ok"
    assert calls["n"] == 3

    def always_down():
        raise ConnectionError("500")

    with pytest.raises(ConnectionError):
        RetryingFetcher(always_down, retries=2, sleep=lambda s: None)()


def test_sheet_to_df_ragged_rows(spark):
    rows = [
        ["symbol", "price", "day"],
        ["ETH", "3000", "2024-01-01"],
        ["SHORT"],  # ragged → dropped
        ["BTC", "60000", "2024-01-02"],
        [None, "1", "2024-01-03"],
    ]
    df = sheet_to_df(spark, rows)
    assert df.columns == ["symbol", "price", "day"]
    assert df.count() == 3  # ragged row dropped, None kept as null


def test_latest_token_prices(spark):
    feed = [
        {"symbol": "ETH", "price": "3000.5"},
        {"symbol": "BTC", "price": 60000},
        {"symbol": None, "price": 1},  # dropped
    ]
    df = latest_token_prices(spark, lambda: feed)
    assert df.columns == ["symbol", "coin_price_usd"]
    got = {r.symbol: r.coin_price_usd for r in df.collect()}
    assert got == {"ETH": 3000.5, "BTC": 60000.0}


def test_df_to_sheet_rows_guard(spark):
    small = spark.createDataFrame([(1, "a"), (2, None)], "id int, s string")
    rows = df_to_sheet_rows(small)
    assert rows[0] == ["id", "s"]
    assert ["2", ""] in rows
    with pytest.raises(ValueError, match="refusing to collect"):
        df_to_sheet_rows(spark.range(100), max_rows=10)
