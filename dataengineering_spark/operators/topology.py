"""Compute-topology helpers: parallelism plumbing that is orthogonal
to any one operator family.

``spread_for_compute`` lived in ``operators.dedup`` through r12 (the
dedup signature chains were its first consumer), but by r13 the text,
media-synth, and ANN lanes all route through it — and because drift
signatures resolve a symbol to its DEFINING module, every one of those
queries was drifting on dedup-engine edits it never executed, crowding
the 50-slot driver re-check window (the r13 spread fix pushed the
dedup-edit consumer set past the window size). Moving the helper to a
module with no operator logic restores the signature graph to true
dependencies: fan-out-only consumers drift on THIS file, dedup
consumers keep drifting on dedup.py (which imports this module, so its
closure still covers topology edits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work (md5 signature chains, regex
    tokenize passes, interpreted array folds, mapInPandas decode lanes)
    uses every core: a small parquet file arrives as 1-2 partitions,
    which would serialize the whole computation on one thread. No-op
    when the scan is already parallel (the 100 TB case — file splits ≫
    cores).

    The split-count estimate prefers ``inputFiles()`` + local file
    sizes (a file listing, ~30 ms) over ``df.rdd.getNumPartitions()``
    (a full plan analysis + RDD conversion, ~300 ms of driver latency
    per dedup query); the RDD probe remains the fallback for
    non-file and remote sources."""
    import os

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    split_bytes = 128 << 20  # spark.sql.files.maxPartitionBytes default
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) >= target:
        return df  # ≥ one split per core already
    est = 0
    local_ok = bool(files)
    for f in files:
        if not f.startswith("file:"):
            local_ok = False
            break
        p = f[5:]
        while p.startswith("//"):
            p = p[1:]
        try:
            sz = os.path.getsize(p)
        except OSError:
            local_ok = False
            break
        est += max(1, -(-sz // split_bytes))
        if est >= target:
            return df
    if local_ok:
        return df.repartition(target) if est < target else df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
