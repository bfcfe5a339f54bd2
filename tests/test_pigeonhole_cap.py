"""Hot-bucket capping for the pigeonhole chunk join (r10): the same
priced safety valve minhash_lsh_pairs carries, applied to the
simhash/dHash/video lanes, plus the pigeonhole_bucket_stats
accounting that makes the cap non-silent. Expected sets are brute-
forced in Python from the same fingerprints, so the tests pin the
exact recall contract: a pair is lost only when EVERY chunk it shares
sits in an over-cap bucket.
"""

from __future__ import annotations

from collections import Counter

from dataengineering_spark.operators.dedup import (
    pigeonhole_bucket_stats,
    simhash_neardup_pairs,
    video_neardup_pairs,
)

BITS, CHUNKS, DIST, CAP = 32, 4, 3, 10


def _cv(h: int, c: int) -> int:
    return (h >> (8 * c)) & 0xFF


def _fixture() -> dict[int, int]:
    # ids 0..11 share chunk-0 value 0x00 (a 12-member hot bucket at
    # cap 10) with otherwise-distinct chunk values; 100/101 pair
    # through their cold chunks 1..3
    hashes = {i: (i + 1) * 0x01010100 for i in range(12)}
    hashes[100] = 0x01010101
    hashes[101] = 0x01010102
    return hashes


def _expected(hashes: dict[int, int], capped: bool) -> set:
    buckets = Counter(
        (c, _cv(h, c)) for h in hashes.values() for c in range(CHUNKS)
    )
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham > DIST:
                continue
            shared = [
                c
                for c in range(CHUNKS)
                if _cv(hashes[a], c) == _cv(hashes[b], c)
                and (not capped or buckets[(c, _cv(hashes[a], c))] <= CAP)
            ]
            if shared:
                out.add((a, b, ham))
    return out


def test_simhash_cap_drops_only_hot_bucket_candidates(spark):
    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    uncapped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(df, max_distance=DIST).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(
            df, max_distance=DIST, max_bucket_size=CAP
        ).collect()
    }
    assert uncapped == _expected(hashes, capped=False)
    assert capped == _expected(hashes, capped=True)
    # the cap genuinely binds: some hot-chunk-only pair is forfeited,
    # and the cold-chunk pair (100, 101) survives
    assert capped < uncapped
    assert (100, 101, 2) in capped


def test_pigeonhole_bucket_stats_match_manual_accounting(spark):
    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    got = {
        r.chunk_id: (
            r.n_buckets,
            r.max_bucket,
            r.candidates,
            r.n_hot_buckets,
            r.docs_in_hot,
            r.pairs_in_hot,
        )
        for r in pigeonhole_bucket_stats(
            df, max_distance=DIST, max_bucket_size=CAP
        ).collect()
    }
    for c in range(CHUNKS):
        sizes = Counter(_cv(h, c) for h in hashes.values())
        want = (
            len(sizes),
            max(sizes.values()),
            sum(n * (n - 1) // 2 for n in sizes.values()),
            sum(1 for n in sizes.values() if n > CAP),
            sum(n for n in sizes.values() if n > CAP),
            sum(n * (n - 1) // 2 for n in sizes.values() if n > CAP),
        )
        assert got[c] == want, (c, got[c], want)


def test_video_cap_binds_per_slot_bucket(spark):
    # slot 0: 12 videos share the same frame hash (hot bucket in every
    # chunk -> all slot-0 matches forfeited under the cap); slot 1:
    # videos 0/1 share a near-identical frame through cold buckets
    rows = [(v, 0, 0x0) for v in range(12)]
    rows += [(0, 1, 0x05050505), (1, 1, 0x05050507)]
    df = spark.createDataFrame(rows, "doc_id long, slot long, dhash long")
    uncapped = {
        (r.doc_a, r.doc_b, r.n_match)
        for r in video_neardup_pairs(
            df, max_distance=DIST, min_matching=1, bits=BITS
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b, r.n_match)
        for r in video_neardup_pairs(
            df, max_distance=DIST, min_matching=1, bits=BITS,
            max_bucket_size=CAP,
        ).collect()
    }
    # uncapped: all 66 slot-0 pairs (n_match 1, or 2 for the 0-1 pair
    # which also matches at slot 1)
    assert (0, 1, 2) in uncapped and len(uncapped) == 66
    # capped: slot-0's degenerate bucket is gone; only the slot-1
    # cold-bucket match remains
    assert capped == {(0, 1, 1)}


def test_bucket_stats_candidate_arithmetic_stays_bigint(spark):
    """ADVICE r10: candidates/pairs_in_hot routed n*(n-1)/2 through
    double (bigint `/` -> double) before casting back — exact only
    below 2^53 total. The aggregation must stay in integer arithmetic
    end to end (n*(n-1) DIV 2), matching the oracle's exact //."""
    hashes = _fixture()
    df = spark.createDataFrame(
        sorted(hashes.items()), "doc_id long, simhash long"
    )
    stats = pigeonhole_bucket_stats(df, max_distance=DIST, max_bucket_size=CAP)
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "cast((n * (n - 1)) as double)" not in plan.lower()
    for col in ("candidates", "pairs_in_hot", "docs_in_hot", "max_bucket"):
        assert stats.schema[col].dataType.simpleString() == "bigint", col
