"""The materialization-aware pair budget (r11 — SCALE.md r10's sf100
video lesson): pigeonhole/hamming lanes verify map-side inside the
candidate join (candidates never materialize), so their budget prices
post-verify survivor volume = exact capped candidate volume × a
measured verify rate. Materializing paths (SemDeDup persists its
candidate pairs) keep the exact pre-verify pricing.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pytest

from pyspark.sql import functions as F

from dataengineering_spark.operators.dedup import (
    candidate_volume,
    require_survivor_budget,
    sample_verify_rate,
    simhash_neardup_pairs,
    video_neardup_pairs,
)

DIST = 3
BITS = 32
CHUNK_BITS = BITS // (DIST + 1)
MASK = (1 << CHUNK_BITS) - 1


def _fixture() -> dict[int, int]:
    # deterministic fingerprints with clustered buckets: a hot cluster
    # sharing chunk 0, plus a spread tail
    hashes = {}
    for i in range(40):
        hashes[i] = (0xAB) | ((i % 7) << 8) | ((i % 11) << 16) | ((i % 5) << 24)
    for i in range(40, 90):
        hashes[i] = (i * 2654435761) & 0xFFFFFFFF
    return hashes


def _cv(h: int, c: int) -> int:
    return (h >> (CHUNK_BITS * c)) & MASK


def _occurrences(hashes, max_bucket_size=None):
    """(candidate, survivor) occurrence counts the join produces:
    one per shared (chunk, value) bucket membership pair."""
    cand = surv = 0
    for c in range(DIST + 1):
        buckets: dict[int, list[int]] = {}
        for doc, h in sorted(hashes.items()):
            buckets.setdefault(_cv(h, c), []).append(doc)
        for members in buckets.values():
            if max_bucket_size is not None and len(members) > max_bucket_size:
                continue
            for a, b in combinations(members, 2):
                cand += 1
                if bin(hashes[a] ^ hashes[b]).count("1") <= DIST:
                    surv += 1
    return cand, surv


def test_candidate_volume_matches_manual_histogram(spark):
    hashes = _fixture()
    sizes = Counter(
        (_cv(h, c)) | (c << 40) for c in range(DIST + 1) for h in hashes.values()
    )
    buckets = spark.createDataFrame(
        [(int(n),) for n in sizes.values()], "n long"
    )
    want = sum(n * (n - 1) // 2 for n in sizes.values())
    assert candidate_volume(buckets) == want
    cap = 10
    want_capped = sum(n * (n - 1) // 2 for n in sizes.values() if n <= cap)
    assert candidate_volume(buckets, max_bucket_size=cap) == want_capped
    # empty frame prices zero, not null
    assert candidate_volume(buckets.filter(F.col("n") < 0)) == 0


def test_sample_verify_rate_full_sample_is_exact(spark):
    """bucket_sample=1 keeps every bucket: the 'sampled' rate must be
    the exact occurrence-level pass rate of the real join."""
    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    rate, cand, surv = sample_verify_rate(
        df, max_distance=DIST, bits=BITS, bucket_sample=1
    )
    want_cand, want_surv = _occurrences(hashes)
    assert (cand, surv) == (want_cand, want_surv)
    assert rate == pytest.approx(want_surv / want_cand)


def test_sample_verify_rate_respects_cap_and_subsamples(spark):
    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    cap = 8
    rate, cand, surv = sample_verify_rate(
        df, max_distance=DIST, bits=BITS, bucket_sample=1, max_bucket_size=cap
    )
    want_cand, want_surv = _occurrences(hashes, max_bucket_size=cap)
    assert (cand, surv) == (want_cand, want_surv)
    # a 1-in-4 bucket sample sees a strict subset of the UNCAPPED
    # occurrence stream
    full_cand, full_surv = _occurrences(hashes)
    _, cand4, surv4 = sample_verify_rate(
        df, max_distance=DIST, bits=BITS, bucket_sample=4
    )
    assert cand4 < full_cand and surv4 <= full_surv
    # no sampled candidates -> conservative rate 1.0
    empty = df.filter(F.col("doc_id") < 0)
    assert sample_verify_rate(empty, max_distance=DIST, bits=BITS) == (1.0, 0, 0)


def test_require_survivor_budget_contract(spark):
    hashes = _fixture()
    sizes = Counter(
        (_cv(h, c)) | (c << 40) for c in range(DIST + 1) for h in hashes.values()
    )
    buckets = spark.createDataFrame(
        [(int(n),) for n in sizes.values()], "n long"
    )
    total = sum(n * (n - 1) // 2 for n in sizes.values())
    # within budget: returns (candidates, survivors)
    cand, surv = require_survivor_budget(buckets, max_pairs=total, verify_rate=0.5)
    assert cand == total and surv == total // 2
    # a rate that prices the survivors over budget refuses with numbers
    with pytest.raises(ValueError, match="survivor volume"):
        require_survivor_budget(buckets, max_pairs=surv - 1, verify_rate=0.5)
    # ...while the SAME budget passes at a lower measured rate — the
    # materialization-aware behavior the r10 video arm needed
    require_survivor_budget(buckets, max_pairs=surv - 1, verify_rate=0.01)
    with pytest.raises(ValueError, match="verify_rate"):
        require_survivor_budget(buckets, max_pairs=10, verify_rate=1.5)


def test_verify_predicate_folds_into_candidate_join(spark):
    """The premise of survivor pricing, pinned: Catalyst pushes the
    hamming verify below the candidate distinct INTO the join
    condition, so pre-verify candidates stream through codegen and
    never reach an exchange — for both the simhash and the
    slot-keyed video lanes."""
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("simhash")
    )
    plan = (
        simhash_neardup_pairs(df, max_distance=DIST, bits=BITS)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    join_lines = [ln for ln in plan.splitlines() if "Join Inner" in ln]
    assert join_lines and all("bit_count" in ln for ln in join_lines), plan

    fh = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("slot"),
        (F.col("id") % 53).alias("dhash"),
    )
    vplan = (
        video_neardup_pairs(fh, max_distance=DIST, min_matching=1)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    vjoin = [ln for ln in vplan.splitlines() if "Join Inner" in ln]
    assert vjoin and all("bit_count" in ln for ln in vjoin), vplan


def test_authorize_pigeonhole_cap_picks_largest_fitting(spark):
    """The one-call price-then-cap workflow: generous budget -> the
    largest cap authorized without sampling smaller ones; tight budget
    -> descends to a smaller cap; impossible budget -> priced refusal
    listing every cap considered."""
    from dataengineering_spark.operators.dedup import (
        authorize_pigeonhole_cap,
    )

    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    full_cand, full_surv = _occurrences(hashes)
    caps = [40, 8, 2]
    # cap 40 keeps everything on this fixture (max bucket 40)
    got = authorize_pigeonhole_cap(df, caps, budget=full_surv, bits=BITS)
    assert got["cap"] == 40 and got["verdict"] == "authorized"
    assert got["candidates"] == full_cand
    assert got["predicted_survivors"] == full_surv  # exact sample (k=1)
    assert [r["cap"] for r in got["priced"]] == [40]

    cand8, surv8 = _occurrences(hashes, max_bucket_size=8)
    tight = authorize_pigeonhole_cap(df, caps, budget=surv8, bits=BITS)
    assert tight["cap"] == 8
    assert [r["verdict"] for r in tight["priced"]] == ["refused", "authorized"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pricing table"):
        authorize_pigeonhole_cap(df, caps, budget=-1, bits=BITS)

    # compute_cap skips (priced, not silent) instead of sampling
    skipped = authorize_pigeonhole_cap(
        df, caps, budget=full_surv, bits=BITS, compute_cap=cand8
    )
    assert skipped["cap"] == 8
    assert skipped["priced"][0]["verdict"] == "over_compute_cap"


def test_rate_upper_bound_contract():
    """Wilson one-sided upper bound (ADVICE r11): >= point estimate,
    <= 1, shrinks with sample size, conservative on empty samples."""
    from dataengineering_spark.operators.dedup import rate_upper_bound

    assert rate_upper_bound(0, 0) == 1.0  # no evidence -> price at 1
    # always above the point estimate, capped at 1
    for s, n in [(0, 10), (1, 10), (5, 10), (10, 10), (50, 1000)]:
        ub = rate_upper_bound(s, n)
        assert s / n <= ub <= 1.0, (s, n, ub)
    assert rate_upper_bound(0, 10) > 0.0  # zero successes != zero risk
    # the margin shrinks as the sample densifies at fixed rate
    margins = [rate_upper_bound(n // 10, n) - 0.1 for n in (10, 100, 10_000)]
    assert margins[0] > margins[1] > margins[2] > 0
    # a huge sample converges to the point estimate
    assert rate_upper_bound(100_000, 1_000_000) - 0.1 < 1e-3


def test_authorize_prices_on_wilson_upper_bound(spark):
    """Authorization must use the Wilson UPPER bound of a sampled rate,
    never the point estimate (ADVICE r11): a budget that fits the point
    prediction but not the UCB prediction is refused."""
    import pytest as _pytest

    from dataengineering_spark.operators.dedup import (
        authorize_pigeonhole_cap,
    )

    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    full_cand, _ = _occurrences(hashes)
    # force a genuine 1-in-k sample (k > 1) and trust it despite being
    # thin, so the UCB machinery is exercised
    kwargs = dict(
        bits=BITS,
        sample_target=max(1, full_cand // 4),
        min_sampled_candidates=1,
    )
    got = authorize_pigeonhole_cap(df, [40], budget=full_cand, **kwargs)
    row = got["priced"][0]
    s_cand, _s_surv = row["sampled"]
    assert 0 < s_cand < full_cand, "fixture must yield a strict sample"
    assert row["rate_ub"] > row["rate"]
    assert row["margin"] == row["rate_ub"] - row["rate"]
    assert row["predicted_survivors_ub"] > row["predicted_survivors"]
    # a budget between the point and UCB predictions must refuse
    between = row["predicted_survivors_ub"] - 1
    if between > row["predicted_survivors"]:
        with _pytest.raises(ValueError, match="pricing table"):
            authorize_pigeonhole_cap(df, [40], budget=between, **kwargs)


def test_authorize_densifies_thin_samples_to_census(spark):
    """A sample below min_sampled_candidates densifies (k -> k // 8)
    until it is trustworthy; on this small fixture that means a census,
    which is exact and carries zero margin (ADVICE r11)."""
    from dataengineering_spark.operators.dedup import (
        authorize_pigeonhole_cap,
    )

    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    full_cand, full_surv = _occurrences(hashes)
    got = authorize_pigeonhole_cap(
        df,
        [40],
        budget=full_surv,
        bits=BITS,
        sample_target=max(1, full_cand // 4),  # initial k > 1 ...
        # ... but the default min_sampled_candidates (10k) far exceeds
        # this fixture's candidate volume, so sampling densifies to k=1
    )
    row = got["priced"][0]
    assert row["sampled"][0] == full_cand, "must have densified to census"
    assert row["margin"] == 0.0
    assert row["predicted_survivors_ub"] == row["predicted_survivors"] == full_surv
