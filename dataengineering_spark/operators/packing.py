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
from pyspark.sql import DataFrame


def pack_bins_ffd(
    df: DataFrame,
    window_col: str,
    size_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """(window_col, id_col, size_col, bin_idx): first-fit-decreasing
    bin assignment within each ``window_col`` group.  ``bin_idx`` is
    0-based and window-scoped (global bin identity is the pair)."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [
            f"{window_col} {fields[window_col]}",
            f"{id_col} {fields[id_col]}",
            f"{size_col} {fields[size_col]}",
            "bin_idx bigint",
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [size_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        assign: list[int] = []
        for s in pdf[size_col]:
            s = int(s)
            for i, load in enumerate(loads):
                if load + s <= budget:
                    loads[i] = load + s
                    assign.append(i)
                    break
            else:
                assign.append(len(loads))
                loads.append(s)
        pdf["bin_idx"] = assign
        return pdf[[window_col, id_col, size_col, "bin_idx"]]

    return (
        df.select(window_col, id_col, size_col)
        .groupBy(window_col)
        .applyInPandas(_pack, schema=schema)
    )
