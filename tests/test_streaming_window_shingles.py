"""Streaming windowed aggregation over a real stream + equivalence of
the two shingle implementations."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineering_spark.catalog import read_table
from dataengineering_spark.operators.dedup import (
    exploded_shingles,
    minhash_signature,
    minhash_signatures,
    shingles,
)
from dataengineering_spark.streaming.structured import windowed_counts
from tests.conftest import SF_SMOKE


def test_windowed_counts_streaming_equals_batch(spark, tmp_path):
    """windowed_counts over readStream (with watermark) must produce
    the same finalized windows as the batch computation."""
    ev = read_table(spark, "events", SF_SMOKE)
    src = str(tmp_path / "in")
    # two files → two micro-batches
    ev.filter("event_id < 500").coalesce(1).write.mode("append").parquet(src)
    ev.filter("event_id >= 500").coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM win_stream").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_counts(ev, window="1 hour").collect()
    }
    assert got == want


def test_exploded_shingles_equals_hof_shingles(spark):
    """The codegen shingle pipeline and the column-expression form
    must produce identical shingle sets (the oracle mirrors the
    column form's semantics)."""
    docs = read_table(spark, "documents", SF_SMOKE)
    hof = {
        r.doc_id: set(r.sh)
        for r in docs.select("doc_id", shingles("text").alias("sh")).collect()
    }
    fast = {
        r.doc_id: set(r.sh)
        for r in exploded_shingles(docs)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
        .collect()
    }
    assert hof == fast


def test_minhash_codegen_equals_hof_signature(spark):
    """The one-aggregation codegen minhash path must produce values
    identical to the column-expression (HOF) form — the same claim the
    DuckDB oracle relies on."""
    docs = read_table(spark, "documents", SF_SMOKE).limit(50)
    hof = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id", minhash_signature(shingles("text")).alias("sig")
        ).collect()
    }
    fast = {r.doc_id: list(r.signature) for r in minhash_signatures(docs).collect()}
    assert hof == fast


def test_exploded_shingles_edge_cases(spark):
    edge = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words"), (4, "a b c d"), (5, "x  y   z")],
        "doc_id long, text string",
    )
    got = {}
    for r in exploded_shingles(edge).collect():
        got.setdefault(r.doc_id, set()).add(r.shingle)
    assert got[1] == {"one"}
    assert got[2] == {""}
    assert got[3] == {"two words"}
    assert got[4] == {"a b c", "b c d"}
    assert got[5] == {"x y z"}  # whitespace normalized


def test_lsh_bucket_cap_drops_adversarial_mass(spark):
    """An adversarial corpus (many identical docs) must not explode
    into n^2 candidate pairs when max_bucket_size is set; normal
    near-dup pairs must survive the cap."""
    from dataengineering_spark.operators.dedup import minhash_lsh_pairs

    spam = [(i, "buy cheap tokens now limited offer act fast") for i in range(40)]
    real = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog tonight ok"),
    ]
    docs = spark.createDataFrame(spam + real, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(docs).count()
    capped = minhash_lsh_pairs(docs, max_bucket_size=10)
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert uncapped >= 40 * 39 // 2  # spam dominates uncapped
    assert (100, 101) in got  # real near-dup survives
    assert all(a >= 100 for a, _ in got)  # spam bucket dropped


def test_lsh_bucket_cap_sample_policy(spark):
    """cap_policy="sample" keeps a deterministic cap-doc wedge of each
    hot bucket instead of dropping it: a mega-cluster still yields at
    most cap*(cap-1)/2 pairs per band, the same subset on every run,
    and normal near-dups are untouched."""
    from dataengineering_spark.operators.dedup import minhash_lsh_pairs

    spam = [(i, "buy cheap tokens now limited offer act fast") for i in range(40)]
    real = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog tonight ok"),
    ]
    docs = spark.createDataFrame(spam + real, "doc_id long, text string")
    cap = 5
    sampled = minhash_lsh_pairs(docs, max_bucket_size=cap, cap_policy="sample")
    got = {(r.doc_a, r.doc_b) for r in sampled.collect()}
    spam_pairs = {(a, b) for a, b in got if b < 100}
    assert (100, 101) in got  # real near-dup survives
    # the spam cluster is represented, but bounded by the cap wedge
    assert 0 < len(spam_pairs) <= cap * (cap - 1) // 2
    # deterministic: a rerun keeps the identical subset
    rerun = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            docs, max_bucket_size=cap, cap_policy="sample"
        ).collect()
    }
    assert rerun == got

    import pytest

    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, max_bucket_size=cap, cap_policy="keep_all")


def test_lsh_bucket_stats_accounting(spark):
    """lsh_bucket_stats reports exactly what the cap costs: hot-bucket
    doc and pair counts per band sum to the adversarial cluster's
    contribution, and pairs_kept_if_sampled is the cap wedge."""
    from dataengineering_spark.operators.dedup import lsh_bucket_stats

    spam = [(i, "buy cheap tokens now limited offer act fast") for i in range(12)]
    real = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "completely different text with no overlap whatsoever here"),
    ]
    docs = spark.createDataFrame(spam + real, "doc_id long, text string")
    cap = 5
    rows = lsh_bucket_stats(docs, max_bucket_size=cap).collect()
    assert rows, "expected one row per band"
    for r in rows:
        # identical spam docs share every band signature: one hot
        # bucket of 12 docs per band
        assert r.n_hot_buckets == 1
        assert r.docs_in_hot == 12
        assert r.pairs_in_hot == 12 * 11 // 2
        assert r.pairs_kept_if_sampled == cap * (cap - 1) // 2
        assert r.n_buckets >= 2  # the two real docs bucket elsewhere


def test_connected_components_multihop(spark):
    """Chain 1-2, 2-3, 3-4 is ONE component labeled by its min id even
    though 1 and 4 never share a pair; disjoint pair keeps its own."""
    from dataengineering_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_streaming_dedup_exactly_once(spark, tmp_path):
    """An at-least-once source (the same rows re-delivered in a later
    micro-batch) must come out exactly-once through
    deduplicated(); the result equals batch dropDuplicates."""
    from dataengineering_spark.streaming.structured import deduplicated

    ev = read_table(spark, "events", SF_SMOKE).select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = str(tmp_path / "dedup_in")
    first = ev.filter("event_id < 600")
    redelivered = ev.filter("event_id >= 400")  # 400-599 arrive TWICE
    first.coalesce(1).write.mode("append").parquet(src)
    redelivered.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        deduplicated(stream, keys=("event_id",), watermark="10 days")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_expected = ev.count()  # every event_id exactly once
    rows = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_stream"
    ).collect()[0]
    assert rows.n == n_expected, (rows.n, n_expected)
    assert rows.d == n_expected
    # batch path: same helper degrades to exact dropDuplicates
    batch = deduplicated(first.union(redelivered), keys=("event_id",))
    assert batch.count() == n_expected
