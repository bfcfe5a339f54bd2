"""Bin packing — assigning whole documents to fixed-capacity training
sequences with minimal waste.

``token_budget_shards`` (chunking.py) packs CONTIGUOUSLY: documents
are concatenated in a global order and sliced every ``budget`` tokens,
so a document may straddle two shards.  Many pipelines instead want
EXACT packing — every document wholly inside one sequence, each
sequence at most ``budget`` tokens, and as few sequences as possible:
the classic bin-packing problem.  First-fit-decreasing (sort by size
descending, drop each item into the first bin with room) is the
standard heuristic with the 11/9·OPT + 6/9 guarantee.

FFD is inherently sequential, so it cannot run over an unbounded
corpus in one pass.  The scalable form — what this operator implements
— packs WITHIN BOUNDED WINDOWS: the corpus is first cut into windows
of bounded item count (any bounded grouping key works: the contiguous
shard id from ``token_budget_shards``, a date partition, a hash
bucket), FFD runs per window inside an Arrow-batched ``applyInPandas``
group, and bin ids are window-scoped.  Windows are independent →
embarrassingly parallel across executors; each group is bounded → no
single-task blowup; the cost of distributing a sequential algorithm is
at most one under-filled bin per window.

Determinism contract (what the DuckDB oracle replays): items are
ordered by (size DESC, id ASC); each item goes to the LOWEST-indexed
bin whose load + size ≤ budget, else opens a new bin with the next
index.  Items larger than ``budget`` never fit an existing bin and get
singleton bins naturally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_bins_ffd(
    df: DataFrame,
    window_col: str,
    size_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """(window_col, id_col, size_col, bin_idx): first-fit-decreasing
    bin assignment within each ``window_col`` group.  ``bin_idx`` is
    0-based and window-scoped (global bin identity is the pair).

    Plan shape (the 100 TB lesson, round-6 sf100 probe): a
    ``groupBy(window).applyInPandas`` pays per-GROUP Arrow/worker
    overhead — at 20k windows that overhead alone was ~20 s, dwarfing
    the packing itself.  Instead the windows are range-partitioned
    (equal keys never split across range partitions) and sorted into
    FFD order (window, size DESC, id) WITHIN each partition, and ONE
    ``mapInPandas`` stream per partition walks the rows carrying
    (current window, bin loads) across Arrow batches — per-group cost
    becomes per-PARTITION cost.  Results are identical to the grouped
    form: FFD state resets at every window boundary, so the assignment
    depends only on the per-window row order, which the sort pins."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [
            f"{window_col} {fields[window_col]}",
            f"{id_col} {fields[id_col]}",
            f"{size_col} {fields[size_col]}",
            "bin_idx bigint",
        ]
    )
    data = (
        df.select(window_col, id_col, size_col)
        .repartitionByRange(window_col)
        .sortWithinPartitions(
            F.col(window_col), F.col(size_col).desc(), F.col(id_col)
        )
    )

    _UNSET = object()

    def _pack_stream(batches):
        # sentinel start + NaN→None normalization: a null window arrives
        # as NaN in pandas and NaN != NaN is always True, which would
        # reset FFD state on EVERY null row instead of packing all nulls
        # as one group like the grouped form did (ADVICE r6).  Nulls are
        # contiguous here: repartitionByRange keeps them in one range
        # partition and the within-partition sort groups them.
        cur_w = _UNSET
        loads: list[int] = []
        for pdf in batches:
            assign: list[int] = []
            for w, s in zip(pdf[window_col], pdf[size_col]):
                if pd.isna(w):
                    w = None
                if w != cur_w:
                    cur_w = w
                    loads = []
                s = int(s)
                for i, load in enumerate(loads):
                    if load + s <= budget:
                        loads[i] = load + s
                        assign.append(i)
                        break
                else:
                    assign.append(len(loads))
                    loads.append(s)
            out = pdf[[window_col, id_col, size_col]].copy()
            out["bin_idx"] = assign
            yield out

    return data.mapInPandas(_pack_stream, schema)


def merge_underfilled_bins(
    packed: DataFrame,
    window_col: str,
    size_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Second pass over :func:`pack_bins_ffd` output: fold under-filled
    bins ACROSS window boundaries (windowed FFD's known waste is up to
    one under-filled bin per window).

    Capacity-safe by construction, no sequential scan: only bins with
    load ≤ budget/2 merge, and they merge in PAIRS — two half-or-less
    bins always fit one budget. Pairing is deterministic and parallel:
    each candidate bin hashes (md5 of its identity) into one of 16
    buckets, and within a bucket bins ranked by (load DESC, window,
    bin) pair up consecutively — the rank window is PARTITIONED by
    bucket, so no single-partition exchange ever appears; the residual
    waste is at most one odd unpaired bin per bucket. All of this runs
    on the BIN-LEVEL frame (|corpus| / avg-docs-per-bin rows), and the
    (window, bin) → merged_id mapping broadcast-joins back to the doc
    rows, so the document stream is never shuffled again.

    Output: input columns plus ``merged_id`` (string; global bin
    identity after merging) and ``merged_load`` (token total of the
    merged bin — always ≤ budget for merged pairs).
    """
    half = budget // 2
    loads = packed.groupBy(window_col, "bin_idx").agg(
        F.sum(size_col).alias("_load")
    )
    key = F.concat_ws(
        ":", F.col(window_col).cast("string"), F.col("bin_idx").cast("string")
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 1), 16, 10).cast("int")
    under = loads.filter(F.col("_load") <= half).withColumn("_bkt", bucket)
    w = Window.partitionBy("_bkt").orderBy(
        F.col("_load").desc(), F.col(window_col), F.col("bin_idx")
    )
    paired = under.withColumn(
        "_pair",
        F.floor((F.row_number().over(w) - F.lit(1)) / 2).cast("long"),
    )
    merged_under = paired.select(
        window_col,
        "bin_idx",
        "_load",
        F.concat_ws(
            ":",
            F.lit("m"),
            F.col("_bkt").cast("string"),
            F.col("_pair").cast("string"),
        ).alias("merged_id"),
    )
    solo = loads.filter(F.col("_load") > half).select(
        window_col,
        "bin_idx",
        "_load",
        F.concat_ws(
            ":",
            F.lit("s"),
            F.col(window_col).cast("string"),
            F.col("bin_idx").cast("string"),
        ).alias("merged_id"),
    )
    mapping = merged_under.unionByName(solo)
    mloads = mapping.groupBy("merged_id").agg(
        F.sum("_load").alias("merged_load")
    )
    mapping = mapping.join(F.broadcast(mloads), "merged_id").select(
        window_col, "bin_idx", "merged_id", "merged_load"
    )
    return packed.join(F.broadcast(mapping), [window_col, "bin_idx"]).select(
        window_col, id_col, size_col, "bin_idx", "merged_id", "merged_load"
    )
