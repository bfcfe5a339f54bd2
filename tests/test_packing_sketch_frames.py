"""Unit-level invariants for FFD bin packing, mergeable HLL sketch
state, and video frame sampling (the round-3 additions; the oracle
parity of their registry queries is covered by test_oracle_parity)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _ffd_reference(items: list[tuple[int, int]], budget: int) -> dict[int, int]:
    """(id, size) -> bin via the textbook FFD loop."""
    loads: list[int] = []
    out: dict[int, int] = {}
    for iid, s in sorted(items, key=lambda t: (-t[1], t[0])):
        for b, load in enumerate(loads):
            if load + s <= budget:
                loads[b] = load + s
                out[iid] = b
                break
        else:
            out[iid] = len(loads)
            loads.append(s)
    return out


def test_pack_bins_ffd_matches_reference_and_respects_budget(spark):
    from dataengineering_spark.operators.packing import pack_bins_ffd

    budget = 900
    rows = [(i, i % 5, 100 + (i * 37) % 450) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, window_id long, n_chars long")
    packed = pack_bins_ffd(df, "window_id", "n_chars", "doc_id", budget)
    pdf = packed.toPandas()

    assert len(pdf) == 200
    # every bin within budget
    loads = pdf.groupby(["window_id", "bin_idx"])["n_chars"].sum()
    assert (loads <= budget).all()
    # assignment == textbook FFD per window
    for wid, grp in pdf.groupby("window_id"):
        ref = _ffd_reference(
            list(zip(grp["doc_id"], grp["n_chars"])), budget
        )
        got = dict(zip(grp["doc_id"], grp["bin_idx"]))
        assert got == ref, wid


def test_pack_bins_ffd_partitioning_invariant_and_oversize(spark):
    from dataengineering_spark.operators.packing import pack_bins_ffd

    budget = 500
    rows = [(i, 0, 5000 if i < 3 else 90 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, window_id long, n_chars long")
    a = pack_bins_ffd(df.repartition(13), "window_id", "n_chars", "doc_id", budget)
    b = pack_bins_ffd(df.coalesce(1), "window_id", "n_chars", "doc_id", budget)
    pa = a.orderBy("doc_id").toPandas()
    pb = b.orderBy("doc_id").toPandas()
    assert pa.equals(pb)
    # oversize items land in singleton bins
    over = pa[pa.n_chars > budget]
    assert len(over) == 3
    for bin_idx in over.bin_idx:
        assert (pa.bin_idx == bin_idx).sum() == 1


def test_pack_bins_ffd_null_window_packs_as_one_group(spark):
    # nulls arrive as NaN in pandas and NaN != NaN, so an unnormalized
    # state check would reset FFD on EVERY null row (each null doc →
    # bin 0).  All nulls must pack as ONE window, like the grouped form
    # (ADVICE r6).
    from dataengineering_spark.operators.packing import pack_bins_ffd

    budget = 250
    rows = [(i, None if i < 12 else i % 2, 100) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, window_id long, n_chars long")
    pdf = pack_bins_ffd(df, "window_id", "n_chars", "doc_id", budget).toPandas()
    nulls = pdf[pdf.window_id.isna()]
    assert len(nulls) == 12
    # 12 size-100 docs at budget 250 → bins of 2 → bin_idx 0..5, not all 0
    counts = nulls.groupby("bin_idx").size()
    assert (counts == 2).all() and len(counts) == 6
    # non-null windows unaffected: textbook FFD per window
    for wid, grp in pdf[pdf.window_id.notna()].groupby("window_id"):
        ref = _ffd_reference(list(zip(grp["doc_id"], grp["n_chars"])), budget)
        assert dict(zip(grp["doc_id"], grp["bin_idx"])) == ref, wid


def test_hll_sketch_state_merges_losslessly(spark):
    from dataengineering_spark.operators.sketches import (
        hll_estimate_from_sketch,
        hll_merge_sketches,
        hll_sketch_by,
    )

    df = spark.range(0, 20000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 16).alias("shard"),
        (F.col("id") % 4111).alias("v"),
    )
    direct = hll_estimate_from_sketch(hll_sketch_by(df, ["g"], "v"))
    shards = hll_sketch_by(df, ["g", "shard"], "v").drop("shard")
    merged = hll_estimate_from_sketch(hll_merge_sketches(shards, ["g"]))
    d = {r["g"]: r["distinct_est"] for r in direct.collect()}
    m = {r["g"]: r["distinct_est"] for r in merged.collect()}
    # the union is lossless on register state, but the direct sketch
    # answers via the stream-order HIP estimator, which a merge
    # necessarily discards — so merged vs direct agree to within the
    # sketch error, not bit-for-bit (they DO coincide in sparse mode)
    for g in d:
        assert abs(d[g] - m[g]) <= 0.02 * d[g], (g, d[g], m[g])
    # merge of merges (re-merge a merged state) is a no-op
    twice = hll_estimate_from_sketch(
        hll_merge_sketches(hll_merge_sketches(shards, ["g"]), ["g"])
    )
    assert {r["g"]: r["distinct_est"] for r in twice.collect()} == m
    # estimate quality: within 5% of exact at lgK=12
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g, est in m.items():
        assert abs(est - exact[g]) <= 0.05 * exact[g], (g, est, exact[g])


def test_sample_frames_rows_and_bounds(spark):
    from dataengineering_spark.functions.multimodal import (
        make_solid_png,
        make_test_mp4,
        parse_mp4_duration,
        sample_frames,
    )

    assert parse_mp4_duration(make_test_mp4(31500)) == 31500
    # non-1000 timescale round-trips through units conversion
    assert parse_mp4_duration(make_test_mp4(2000, timescale=90000)) == 2000

    payloads = [
        (1, make_test_mp4(10000)),
        (2, make_test_mp4(777)),
        (3, make_solid_png(4, 4, (1, 2, 3))),  # not a video: no rows
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = sample_frames(df, n_frames=5).toPandas()
    assert sorted(out.doc_id.unique()) == [1, 2]
    assert (out.groupby("doc_id").size() == 5).all()
    for _, r in out.iterrows():
        dur = 10000 if r.doc_id == 1 else 777
        assert 0 <= r.frame_ts_ms < dur
        assert len(r.frame_id) == 32
    # midpoint rule: frame k of doc 1 at (2k+1)*10000//10
    one = out[out.doc_id == 1].sort_values("frame_idx")
    assert list(one.frame_ts_ms) == [1000, 3000, 5000, 7000, 9000]


def test_merge_underfilled_bins_capacity_and_utilization(spark):
    """Cross-window merge: merged pairs stay within budget, at most two
    source bins per merged id, and the merge strictly reduces the bin
    count whenever ≥2 under-filled bins share a hash bucket."""
    from dataengineering_spark.operators.packing import (
        merge_underfilled_bins,
        pack_bins_ffd,
    )

    budget = 2000
    # sized so each window fills ~1.3 bins: the remainder bin lands
    # well under budget/2 and is a merge candidate
    rows = [(i, i % 8, 60 + (i * 13) % 140) for i in range(160)]
    df = spark.createDataFrame(rows, "doc_id long, window_id long, n_chars long")
    packed = pack_bins_ffd(df, "window_id", "n_chars", "doc_id", budget)
    merged = merge_underfilled_bins(
        packed, "window_id", "n_chars", "doc_id", budget
    )
    pdf = merged.toPandas()

    assert len(pdf) == 160
    per_merged = pdf.groupby("merged_id").agg(
        load=("n_chars", "sum"),
        src_bins=("bin_idx", lambda s: len({*zip(pdf.loc[s.index, "window_id"], s)})),
    )
    # merged_load column agrees with the actual sum, and pairs fit
    for mid, grp in pdf.groupby("merged_id"):
        assert grp["merged_load"].nunique() == 1
        assert grp["merged_load"].iloc[0] == grp["n_chars"].sum()
        if mid.startswith("m:"):
            assert grp["n_chars"].sum() <= budget, mid
    assert (per_merged["src_bins"] <= 2).all()
    n_orig = pdf.groupby(["window_id", "bin_idx"]).ngroups
    n_merged = pdf["merged_id"].nunique()
    assert n_merged < n_orig, (n_merged, n_orig)


def test_mixture_sample_is_nested_and_deterministic(spark):
    """A lower keep-rate's sample must be a strict subset of a higher
    rate's over the same keys (hash membership, not RNG), and a rerun
    after repartitioning must return the identical set."""
    from dataengineering_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(900)], ["doc_id", "source"]
    )
    lo = mixture_sample(df, "doc_id", "source", {}, default_ppm=200_000)
    hi = mixture_sample(df, "doc_id", "source", {}, default_ppm=600_000)
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids < hi_ids
    again = {
        r.doc_id
        for r in mixture_sample(
            df.repartition(7), "doc_id", "source", {}, default_ppm=200_000
        ).collect()
    }
    assert again == lo_ids


def test_ffd_stream_state_survives_arrow_batch_boundaries(spark):
    """pack_bins_ffd streams one mapInPandas per partition carrying
    (window, loads) state ACROSS Arrow batches; force tiny batches so
    every window straddles several and assert assignments still equal
    a direct Python FFD replay."""
    from dataengineering_spark.operators.packing import pack_bins_ffd

    budget = 500
    rows = [(i, i // 40, 30 + (i * 17) % 90) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, window_id long, n_chars long")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = {
            (r.window_id, r.doc_id): r.bin_idx
            for r in pack_bins_ffd(
                df, "window_id", "n_chars", "doc_id", budget
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # direct replay: per window, (size desc, id asc), first-fit
    import collections

    by_w = collections.defaultdict(list)
    for doc_id, w, s in rows:
        by_w[w].append((s, doc_id))
    want = {}
    for w, items in by_w.items():
        loads: list[int] = []
        for s, doc_id in sorted(items, key=lambda t: (-t[0], t[1])):
            for i, load in enumerate(loads):
                if load + s <= budget:
                    loads[i] = load + s
                    want[(w, doc_id)] = i
                    break
            else:
                want[(w, doc_id)] = len(loads)
                loads.append(s)
    assert got == want
