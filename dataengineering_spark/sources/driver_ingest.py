"""Driver-side ingest edges (SURVEY.md §2.1 S23-S26): spreadsheet and
REST-API dimension feeds.

These are the reference's Google-Sheets reader/appender
(``coinprice/utils.py:76-187``) and token-price REST fetch
(``coinprice/utils.py:20-32``) — tiny dimension tables that
legitimately enter through the driver and then get broadcast. The
transport is pluggable (a ``fetch`` callable), because this
environment has no network and the reference's exact endpoints are
private; the engine-side contract — retry, coercion, createDataFrame,
broadcast-sized output — is real and tested with injected fakes.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


class RetryingFetcher:
    """Retry-with-backoff wrapper for flaky driver-side feeds
    (reference retries sheet reads on 429/5xx,
    ``coinprice/utils.py:92-149``; GCS 5 retries,
    ``airflow/google_cloud_storage/utils.py:18``)."""

    def __init__(
        self,
        fetch: Callable[[], object],
        retries: int = 5,
        backoff_s: float = 0.1,
        retryable: tuple[type[Exception], ...] = (Exception,),
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.fetch = fetch
        self.retries = retries
        self.backoff_s = backoff_s
        self.retryable = retryable
        self.sleep = sleep

    def __call__(self):
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                return self.fetch()
            except self.retryable as ex:  # noqa: PERF203
                last = ex
                self.sleep(self.backoff_s * (2**attempt))
        raise last  # type: ignore[misc]


def sheet_to_df(
    spark: SparkSession,
    rows: Sequence[Sequence],
    header: Sequence[str] | None = None,
    min_row_len: int | None = None,
) -> DataFrame:
    """Spreadsheet rows → DataFrame with the reference's cleanups:
    first row as header unless given, ragged short rows dropped
    (``coinprice/utils.py:141``), all cells coerced to string
    (``coinprice/utils.py:13-17``)."""
    rows = list(rows)
    if header is None:
        if not rows:
            raise ValueError("empty sheet and no header provided")
        header, rows = list(rows[0]), rows[1:]
    width = min_row_len if min_row_len is not None else len(header)
    clean = [
        [str(c) if c is not None else None for c in r[: len(header)]]
        for r in rows
        if len(r) >= width
    ]
    schema = ", ".join(f"`{c}` string" for c in header)
    return spark.createDataFrame(clean, schema=schema)


def latest_token_prices(
    spark: SparkSession,
    fetch: Callable[[], list[dict]],
    symbol_key: str = "symbol",
    price_key: str = "price",
) -> DataFrame:
    """REST price feed → (symbol, coin_price_usd) dimension with the
    reference's rename + float cast (``coinprice/utils.py:20-32``).
    Output is broadcast-join ready."""
    records = RetryingFetcher(fetch)()
    rows = [
        (str(r[symbol_key]), float(r[price_key]))
        for r in records
        if r.get(symbol_key) is not None
    ]
    return spark.createDataFrame(rows, "symbol string, coin_price_usd double")


def df_to_sheet_rows(df: DataFrame, max_rows: int = 100_000) -> list[list]:
    """DataFrame → spreadsheet append payload (reference
    ``append_dataframe``, ``coinprice/utils.py:159-176``). Guarded:
    spreadsheet egress is for small results only — a driver collect
    of more than ``max_rows`` is almost certainly a pipeline bug."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"refusing to collect {n} rows for spreadsheet egress "
            f"(limit {max_rows}); write to a table instead"
        )
    header = [list(df.columns)]
    return header + [[("" if v is None else str(v)) for v in row] for row in df.collect()]
