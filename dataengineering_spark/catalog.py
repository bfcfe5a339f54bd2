"""Table registry: explicit schemas + env/chain routing.

The reference never declares schemas (pandas ``read_csv`` inference,
reference ``clickhouse/v1/operator.py:454``) and routes table names by
environment and chain (``airflow/bigquery/utils.py:12-31``,
``chains.py:40-43``, ``coinprice/pricing_checks.py:36-47``). Here the
catalog pins an explicit ``StructType`` per table (schema-on-read
inference is a correctness and perf hazard at 100 TB: it triggers a
file-listing + footer-read pass) and centralizes name routing.
"""

from __future__ import annotations

import functools
import os
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Explicit schemas for the driver-provided corpus (TESTDATA.md). At
# production scale these come from the metastore; pinning them here
# means the parquet scan never needs an inference pass and the plan's
# ReadSchema is exactly what the query needs after pruning.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough that every join against them should be
# a broadcast hash join, never a shuffle.
BROADCAST_DIMS = frozenset({"region", "nation", "customer", "supplier", "part"})

# Some corpus generations store TIMESTAMP(NANOS), which Spark's parquet
# reader rejects outright. Rather than hardcoding which tables carry
# nanos (a unit change on regeneration silently corrupts every
# downstream timestamp — see round-4 postmortem), we sniff the actual
# timeUnit from the parquet footer and apply the nanos-as-long path
# only when the file really declares nanoseconds. The conversion uses
# *integer* division — ns values (~1.7e18) exceed double's
# exact-integer range, so a float path would drift by ±1µs vs the
# DuckDB oracle's truncation.


def _nanos_to_ntz(col: str):
    from pyspark.sql import functions as F

    return F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz")


def _first_parquet_file(path: str) -> str | None:
    """Resolve a parquet path (file or directory) to one footer to sniff."""
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                return os.path.join(path, entry)
    return None


def _sniff_nano_cols(path: str, ts_cols: tuple[str, ...]) -> tuple[str, ...]:
    """Return the subset of ``ts_cols`` stored as TIMESTAMP(NANOS) in ``path``.

    Footer-only read (no data pages); cached per (path, cols) since the
    corpus files are immutable within a run. Non-local / unreadable
    paths fall back to () — i.e. trust the pinned schema — which is
    correct for every unit except nanos, where Spark fails loudly
    rather than reading garbage.
    """
    return _sniff_nano_cols_cached(path, ts_cols)


@functools.lru_cache(maxsize=256)
def _sniff_nano_cols_cached(path: str, ts_cols: tuple[str, ...]) -> tuple[str, ...]:
    if not ts_cols:
        return ()
    target = _first_parquet_file(path)
    if target is None:
        return ()
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_schema = pq.read_schema(target)
    except Exception:
        return ()
    out = []
    for c in ts_cols:
        idx = arrow_schema.get_field_index(c)
        if idx < 0:
            continue
        typ = arrow_schema.field(idx).type
        if pa.types.is_timestamp(typ) and typ.unit == "ns":
            out.append(c)
    return tuple(out)


# Fact-scan parallelism floor. Small-file parquet tables split into
# few byte ranges, so the scan runs on a handful of tasks no matter
# how small maxPartitionBytes is — and every downstream stage of a
# scan-dominated query serializes on those cores. When the file's
# split-count estimate is below the cluster's parallelism AND the
# table carries enough ROWS that the round-robin shuffle pays for
# itself, spread the scan. The gate is row-based, not byte-based:
# zstd-compressed text can pack 50k exploding documents into under
# 6 MB, so a byte floor silently strands explode-heavy queries on two
# cores (the round-5 sf1 headroom run caught repetition_metrics at
# 133× for 10× data exactly this way). At production scale
# (splits >> cores) the gate never fires, so the plan keeps the
# shuffle-free scan→partial-agg shape.
SPREAD_MIN_ROWS_PER_TASK = 1000


@functools.lru_cache(maxsize=256)
def _parquet_num_rows(path: str) -> int | None:
    target = _first_parquet_file(path)
    if target is None:
        return None
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(target).metadata.num_rows
    except Exception:
        return None


def _spread_if_narrow(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    try:
        size = os.path.getsize(path)  # local paths only; object stores skip
    except OSError:
        return df
    target = spark.sparkContext.defaultParallelism
    rows = _parquet_num_rows(path)
    if rows is None or rows < target * SPREAD_MIN_ROWS_PER_TASK:
        return df  # too little work for the shuffle to pay for itself
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    raw = raw.removesuffix("b")
    mult = units.get(raw[-1:], 1)
    max_split = int(raw.rstrip("kmg") or "134217728") * mult
    est_splits = -(-size // max_split)
    if est_splits >= target:
        return df
    return df.repartition(target)


def read_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one corpus table with its pinned schema.

    Timestamp columns land as TimestampNTZType (the files are
    isAdjustedToUTC=false), truncated ns→µs exactly like DuckDB.
    """
    from pyspark.sql import types as Ty

    schema = SCHEMAS.get(name)
    path = f"{sf_dir}/{name}.parquet"
    ts_cols = tuple(
        f.name
        for f in (schema.fields if schema is not None else ())
        if isinstance(f.dataType, (Ty.TimestampNTZType, Ty.TimestampType))
    )
    nano_cols = _sniff_nano_cols(path, ts_cols)
    reader = spark.read
    if schema is not None:
        if nano_cols:
            raw_fields = [
                Ty.StructField(f.name, Ty.LongType() if f.name in nano_cols else f.dataType)
                for f in schema.fields
            ]
            schema = Ty.StructType(raw_fields)
        reader = reader.schema(schema)
    if nano_cols:
        # settable at runtime so this works under the driver's own session
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _spread_if_narrow(spark, reader.parquet(path), path)
    for c in nano_cols:
        df = df.withColumn(c, _nanos_to_ntz(c))
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
    names: tuple[str, ...] = TESTDATA_TABLES,
) -> dict[str, DataFrame]:
    """Load the corpus, optionally registering SQL temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


class Environment(str, Enum):
    """Prod/dev namespace routing (reference ``airflow/bigquery/utils.py:12-31``,
    ``airflow/google_cloud_storage/utils.py:69-83``)."""

    PRODUCTION = "production"
    DEVELOPMENT = "development"


def build_destination(dataset: str, table: str, environment: str | Environment) -> str:
    """Map a logical dataset/table to an env-qualified identifier.

    Mirrors the reference's routing rule: production keeps the dataset
    name, any other environment gets a ``_dev`` suffix
    (``airflow/bigquery/utils.py:22-31``).
    """
    env = Environment(environment) if not isinstance(environment, Environment) else environment
    suffix = "" if env is Environment.PRODUCTION else "_dev"
    return f"{dataset}{suffix}.{table}"


class Chain(str, Enum):
    """Chain dimension (reference ``chains.py:4-64``): the only
    first-class schema object in the reference. Retained as a plain
    enum + routing properties; joins against chain attributes use a
    broadcast dimension frame instead."""

    BITCOIN = "bitcoin"
    ETHEREUM = "ethereum"
    LITECOIN = "litecoin"
    TRON = "tron"
    RIPPLE = "ripple"
    HEDERA = "hedera"
    POLYGON = "polygon"
    BITCOIN_CASH = "bitcoin_cash"
    DOGECOIN = "dogecoin"

    @property
    def database_name(self) -> str:
        """Logical database routing (reference ``chains.py:40-43``)."""
        return self.value

    @property
    def is_smart_contract_chain(self) -> bool:
        """Smart-contract subset (reference ``chains.py:54-64``)."""
        return self in {Chain.ETHEREUM, Chain.TRON, Chain.POLYGON, Chain.HEDERA}

    def metadata_table(self) -> str:
        """Token-metadata source routing: chains alphabetically >= 's'
        read the shared ``aal_dictionaries`` namespace (reference
        ``coinprice/pricing_checks.py:36-47``). Kept as a name-compat
        shim; in Spark both resolve through the same catalog."""
        if ord(self.value[0]) < ord("s"):
            return f"{self.value}.tokens_metadata"
        return f"aal_dictionaries.{self.value}_tokens_metadata"
