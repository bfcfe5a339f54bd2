"""ANN quality gates: oracle parity proves each approximate path is
deterministic and engine-exact, but says nothing about whether it
finds good neighbors. These tests measure recall@k against the exact
brute-force baseline on the driver corpus, with thresholds loose
enough to be stable (the corpus and all parameters are deterministic,
so the measured recall is a constant — the threshold just documents
the floor we promise)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

K = 5


@pytest.fixture(scope="module")
def exact_topk(spark):
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import cosine_topk

    emb = read_table(spark, "embeddings", SF_ORACLE)
    df = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=K)
    return {
        (r["query_id"], r["neighbor_id"]) for r in df.collect()
    }


def _recall(approx_df, exact_pairs) -> float:
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    return len(approx & exact_pairs) / len(exact_pairs)


def test_ivf_recall(spark, exact_topk):
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import ivf_topk

    emb = read_table(spark, "embeddings", SF_ORACLE)
    r = _recall(
        ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=K), exact_topk
    )
    assert r >= 0.5, f"IVF recall@{K} collapsed to {r}"


def test_ivfpq_recall(spark, exact_topk):
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import ivfpq_topk

    emb = read_table(spark, "embeddings", SF_ORACLE)
    r = _recall(
        ivfpq_topk(emb, emb.filter(F.col("vec_id") < 10), k=K), exact_topk
    )
    # PQ quantization costs precision on top of cell pruning, and the
    # synthetic corpus is near-uniform — the worst case for PQ (no
    # cluster structure to exploit; measured recall here is 0.10).
    # Random top-5 over 2000 vectors would score ~0.0025, so 0.05
    # still guards against a collapsed/shuffled codebook while
    # documenting that quality on THIS corpus is quantization-bound.
    assert r >= 0.05, f"IVF-PQ recall@{K} collapsed to {r}"


def test_lsh_recall(spark, exact_topk):
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import lsh_cosine_topk

    emb = read_table(spark, "embeddings", SF_ORACLE)
    r = _recall(
        lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=K),
        exact_topk,
    )
    # Single-table sign-LSH on a near-uniform corpus: each plane halves
    # the candidate bucket and costs recall (measured 0.38/0.26/0.14 at
    # 2/3/4 planes here). The gate documents the 4-plane floor; random
    # would score ~0.0025.
    assert r >= 0.1, f"LSH recall@{K} collapsed to {r}"


def test_ivfpq_index_roundtrip_identical(spark, tmp_path):
    """Persist-and-reload must reproduce the EXACT search results:
    train once, save the quantizers to parquet, reload, and run the
    query path with the loaded index — identical rows to the
    fresh-trained run (doubles round-trip parquet exactly)."""
    from dataengineering_spark.catalog import read_table
    from dataengineering_spark.operators.similarity import (
        _spread_for_training,
        ivfpq_topk,
        load_ivfpq_index,
        save_ivfpq_index,
        train_ivfpq_index,
    )

    emb = read_table(spark, "embeddings", SF_ORACLE)
    queries = emb.filter(F.col("vec_id") < 10)
    e = _spread_for_training(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
    )
    index = train_ivfpq_index(e, 8, 1, 4, 8, 1, 64)
    fresh = sorted(
        tuple(r) for r in ivfpq_topk(emb, queries, k=5, index=index).collect()
    )

    path = str(tmp_path / "ann_index")
    save_ivfpq_index(spark, path, index)
    loaded = load_ivfpq_index(spark, path)
    assert loaded[0] == [(int(c), [float(x) for x in v]) for c, v in index[0]]
    reloaded = sorted(
        tuple(r) for r in ivfpq_topk(emb, queries, k=5, index=loaded).collect()
    )
    assert reloaded == fresh
