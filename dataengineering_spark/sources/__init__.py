from dataengineering_spark.sources.io import (
    read_any,
    write_any,
    fan_out,
    flush_partitions,
    FORMATS,
)
from dataengineering_spark.sources.graph import GraphSink, LoadStats

__all__ = [
    "read_any",
    "write_any",
    "fan_out",
    "flush_partitions",
    "FORMATS",
    "GraphSink",
    "LoadStats",
]
