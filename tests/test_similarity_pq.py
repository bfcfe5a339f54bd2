"""PQ codebook training: empty-cluster carry-forward parity.

When k_sub exceeds the number of distinct subvectors in a subspace,
duplicate seeds are inevitable and assignment ties break to the lowest
cid — so the higher duplicate cids get ZERO assignments. Before the
carry-forward guard, the Spark side renumbered surviving centroids
positionally while the oracle kept original cids, silently
desynchronizing the two engines. This test forces that condition
(3 distinct vectors, k_sub=8) and requires bit-exact parity.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM, M_SUB, K_SUB, N_ITERS, TOPK = 8, 4, 8, 2, 3

# Three prototypes on the 1e-6 fixed-point grid; 40 rows cycling
# through them. Distinct subvectors per subspace = 3 < k_sub = 8.
_PROTOS = [
    [0.125, -0.25, 0.5, 0.75, -0.125, 0.375, -0.5, 0.0625],
    [-0.75, 0.5, 0.25, -0.125, 0.625, -0.375, 0.125, 0.5],
    [0.0, 0.875, -0.625, 0.25, -0.5, 0.125, 0.75, -0.25],
]


def _rows():
    return [(i, [float(x) for x in _PROTOS[i % 3]]) for i in range(40)]


@pytest.fixture(scope="module")
def emb_df(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(_rows(), schema)


def test_pq_empty_cluster_matches_oracle(spark, emb_df):
    from dataengineering_spark.operators.similarity import pq_adc_topk
    from dataengineering_spark.plans.queries_llm import _pq_sql

    sdf = pq_adc_topk(
        emb_df,
        emb_df.filter(F.col("vec_id") < 10),
        k=TOPK,
        m_sub=M_SUB,
        k_sub=K_SUB,
        n_iters=N_ITERS,
        dim=DIM,
    )
    s_rows = sorted(
        (int(r["query_id"]), int(r["neighbor_id"]), int(r["rank"]), r["adc_d2"])
        for r in sdf.collect()
    )

    con = duckdb.connect()
    emb_pd = pd.DataFrame(_rows(), columns=["vec_id", "embedding"])
    con.register("embeddings", emb_pd)
    d_rows = sorted(
        (int(q), int(n), int(rk), d)
        for q, n, rk, d in con.sql(
            _pq_sql(M_SUB, K_SUB, N_ITERS, DIM, TOPK)
        ).fetchall()
    )
    con.close()

    assert len(s_rows) == len(d_rows) > 0
    for a, b in zip(s_rows, d_rows):
        assert a[:3] == b[:3], (a, b)
        assert math.isclose(a[3], b[3], rel_tol=0, abs_tol=0), (a, b)


def test_pq_codebooks_stay_dense_under_empty_clusters(spark, emb_df):
    from dataengineering_spark.operators.similarity import (
        _codebook_rows,
        pq_codebooks,
    )

    e = emb_df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    books = pq_codebooks(e, m_sub=M_SUB, k_sub=K_SUB, n_iters=N_ITERS, dim=DIM)
    by_m = _codebook_rows(books)  # raises on sparse cids
    books.unpersist()
    assert set(by_m) == set(range(M_SUB))
    for m in range(M_SUB):
        assert len(by_m[m]) == K_SUB
        # the forcing condition really held: fewer distinct centroids
        # than codes, i.e. some codes carried a duplicate/stale centroid
        assert len({tuple(cv) for cv in by_m[m]}) < K_SUB
