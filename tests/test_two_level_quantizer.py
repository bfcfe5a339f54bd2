"""Two-level coarse quantizer: assignment validity, determinism, and
composition with the SemDeDup pipeline — the scale path past flat
literal assignment (O(c1+c2) per-row work for c1*c2 cells)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineering_spark.operators.similarity import (
    two_level_assign,
    two_level_train_rows,
)

DIM = 8


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id LONG, v ARRAY<DOUBLE>",
    )


def _basis(i, scale=1.0):
    v = [0.0] * DIM
    v[i % DIM] = scale
    return v


@pytest.fixture(scope="module")
def corpus(spark):
    # four orthogonal groups of 8 IDENTICAL vectors — identical points
    # co-assign at any (c1, c2); perturbed scales may legitimately
    # split a direction across sub-cells (k-means is L2-metric)
    vecs = [_basis(g) for g in range(4) for _ in range(8)]
    return _frame(spark, vecs)


def test_assignment_valid_and_deterministic(spark, corpus):
    c1, c2 = 2, 2
    sr, sbs = two_level_train_rows(corpus, c1, c2, n_iters=1, dim=DIM)
    assert len(sr) == c1
    assert set(sbs) <= {cid for cid, _ in sr}
    out1 = two_level_assign(corpus, sr, sbs, c2).collect()
    out2 = two_level_assign(corpus, sr, sbs, c2).collect()
    assert sorted((r.vec_id, r.cid) for r in out1) == sorted(
        (r.vec_id, r.cid) for r in out2
    )
    for r in out1:
        scid, sub = divmod(r.cid, c2)
        assert any(scid == cid for cid, _ in sr)
        assert sub < c2
    # identical-direction vectors always share a composite cell
    by_group = {}
    for r in out1:
        by_group.setdefault(r.vec_id // 8, set()).add(r.cid)
    assert all(len(cells) == 1 for cells in by_group.values())


def test_missing_sub_quantizer_falls_back(spark, corpus):
    sr, sbs = two_level_train_rows(corpus, 2, 2, n_iters=1, dim=DIM)
    # simulate a super cell whose sub-quantizer never trained
    dropped = {k: v for k, v in list(sbs.items())[:1]}
    out = two_level_assign(corpus, sr, dropped, 2).collect()
    assert all(r.cid is not None for r in out)


def test_composes_with_semantic_dedup(spark, corpus):
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.operators.dedup import semantic_dedup_members

    members = semantic_dedup_members(
        corpus,
        n_iters=1,
        dim=DIM,
        threshold=0.999,
        vec_col="v",
        two_level=(2, 2),
    ).collect()
    release_tracked()
    # each orthogonal group forms one cluster with one keeper
    comps = {}
    for r in members:
        comps.setdefault(r.component, []).append(r)
    assert len(comps) == 4
    for rows in comps.values():
        assert len(rows) == 8
        assert sum(r.keep for r in rows) == 1


def test_semantic_dedup_covers_fallback_cells(spark, corpus):
    """Vectors landing in a super cell with NO trained sub-quantizer
    get the fallback cid super*c2; semantic_dedup_members must still
    score them against a centroid (the super's) instead of silently
    dropping them in the inner cells->centroids join — a dropped
    cluster means the wrong doc gets deduplicated."""
    from dataengineering_spark.caching import release_tracked
    from dataengineering_spark.operators.dedup import semantic_dedup_members

    sr, sbs = two_level_train_rows(corpus, 2, 2, n_iters=1, dim=DIM)
    # simulate a super whose sub-quantizer never trained (train cap)
    dropped = {k: v for k, v in list(sbs.items())[:1]}
    assert len(dropped) < len(sbs)
    members = semantic_dedup_members(
        corpus,
        n_iters=1,
        dim=DIM,
        threshold=0.999,
        vec_col="v",
        two_level=(2, 2),
        cent_rows=(sr, dropped),
    ).collect()
    release_tracked()
    # all four identical groups must still surface as full clusters —
    # including the ones assigned to the fallback cid
    comps = {}
    for r in members:
        comps.setdefault(r.component, []).append(r)
    assert len(comps) == 4
    for rows in comps.values():
        assert len(rows) == 8
        assert sum(r.keep for r in rows) == 1
    assert all(r.cos_centroid is not None for r in members)


def test_degenerate_two_level_equals_flat(spark):
    """c1=1 collapses the hierarchy: one super cell holding the whole
    corpus, so the grouped sub-training IS flat Lloyd (same md5-ranked
    seeds, same (d2, id) tie rule, same 1e-6 fixed-point updates) and
    two_level_assign's composite cid (0*c2 + sub) must match
    ivf_assign's cid exactly. This differentially pins the grouped
    trainer against the oracle-proven flat recipe."""
    from dataengineering_spark.operators.similarity import ivf_assign, ivf_train_rows

    # irregular but deterministic vectors — not cluster-friendly on
    # purpose, so ties and odd cells exercise the tie rules
    vecs = [
        [float((i * 7 + j * 3) % 11) / 11.0 for j in range(DIM)]
        for i in range(40)
    ]
    e = _frame(spark, vecs)
    c = 4
    flat_rows = ivf_train_rows(e, c, n_iters=2, dim=DIM)
    sr, sbs = two_level_train_rows(e, 1, c, n_iters=2, dim=DIM)
    got = {
        (r.vec_id, r.cid)
        for r in two_level_assign(e, sr, sbs, c).collect()
    }
    want = {(r.vec_id, r.cid) for r in ivf_assign(e, flat_rows).collect()}
    assert got == want
    # the trained centroids themselves match
    (super_cid,) = [cid for cid, _cv in sr]
    assert [(cid, cv) for cid, cv in flat_rows] == sbs[super_cid]


def test_hot_split_rebalances_skewed_supers(spark):
    """Balance-aware training (VERDICT r8 #4): a corpus with one dense
    region must re-split that region's super cell at 2*c2, reducing
    capped-out volume at the same cap without touching cold supers or
    colliding cids."""
    import numpy as np

    from dataengineering_spark.operators.similarity import (
        two_level_assign,
        two_level_train_rows,
    )

    rng = np.random.RandomState(7)
    rows = []
    # hot region: 8 tight subclusters of 150 vectors each around
    # v[0]=10 — more structure than a c2=4 sub-budget can separate,
    # so pairs of subclusters share a cell (~300 > CAP) until the
    # split doubles the budget; sparse rest: 300 spread far away
    for i in range(1200):
        v = np.zeros(8)
        v[0] = 10.0
        v[1 + (i % 7)] += 3.0 if i % 8 < 4 else -3.0
        rows.append((i, (v + rng.normal(0, 0.1, 8)).tolist()))
    for i in range(1200, 1500):
        v = rng.normal(0, 5.0, 8)
        v[0] = -50.0  # far from the hot region
        rows.append((i, v.tolist()))
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")

    CAP = 200
    sup, subs_uniform = two_level_train_rows(e, c1=4, c2=4, n_iters=2, dim=8)
    sup_b, subs_bal = two_level_train_rows(
        e, c1=4, c2=4, n_iters=2, dim=8, hot_split=(CAP, 1500)
    )
    assert sup == sup_b  # super layer untouched
    assert max(len(v) for v in subs_bal.values()) == 8  # a hot super split
    assert min(len(v) for v in subs_bal.values()) <= 4  # cold supers kept

    def capped_out(subs):
        cells = two_level_assign(e, sup, subs, 4)
        sizes = [r["n"] for r in cells.groupBy("cid").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()]
        return sum(n for n in sizes if n > CAP), sizes

    dropped_u, sizes_u = capped_out(subs_uniform)
    dropped_b, sizes_b = capped_out(subs_bal)
    assert sum(sizes_u) == sum(sizes_b) == 1500  # nothing lost
    assert dropped_b < dropped_u  # the split actually relieves the cap
    # cids stay collision-free across supers at the stretched stride
    cells_b = two_level_assign(e, sup, subs_bal, 4)
    stride = 8
    for r in cells_b.select("cid").distinct().collect():
        cid = r["cid"]
        assert 0 <= cid % stride < len(subs_bal.get(cid // stride, [(0, None)]))
