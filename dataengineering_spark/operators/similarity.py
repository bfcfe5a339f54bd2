"""Similarity search over embedding columns.

Two paths, per the standard ANN playbook:

- ``cosine_topk``: exact brute-force top-k — the correctness baseline
  and the right choice when the query set is small (it broadcasts the
  queries and never shuffles the corpus).
- ``lsh_cosine_topk``: random-hyperplane LSH bucketing — the scale
  path. Vectors only compare within matching sign-buckets, so the
  corpus-side work drops from O(N*Q) to O(Q * bucket size). Brute
  force within the bucket keeps exactness conditional only on recall.

All vector math is JVM-side (``zip_with``/``aggregate`` higher-order
functions over array<double>); fold order is left-to-right, which the
DuckDB oracle (list_dot_product) matches bit-for-bit — verified, not
assumed. Hyperplanes are md5-derived so they are reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cos_sim), neighbors exclude
    the query itself; ties broken by neighbor id for determinism.
    The query side is broadcast — the corpus is never shuffled, only
    the per-partition top-k rows move (window over query_id after a
    partial filter would be the 1000-executor refinement; at sane k
    and |queries| the window shuffle is |corpus|·|queries| filtered
    rows).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


# --- LSH scale path --------------------------------------------------------

def _hyperplane_component_sql(plane: int, dim: int) -> str:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5-derived so any engine can reproduce it. Value = hex32/2^32-0.5."""
    h = f"md5('plane|{plane}|{dim}')"
    terms = " + ".join(
        f"(position(substr({h}, {j + 1}, 1) in '0123456789abcdef') - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({terms}) / 4294967296.0 - 0.5)"


def hyperplanes_sql(n_planes: int, dim: int) -> str:
    """SQL array-of-arrays literal for n deterministic hyperplanes."""
    planes = []
    for p in range(n_planes):
        comps = ", ".join(_hyperplane_component_sql(p, d) for d in range(dim))
        planes.append(f"array({comps})")
    return "array(" + ", ".join(planes) + ")"


def lsh_bucket(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) >= 0."""
    planes = F.expr(hyperplanes_sql(n_planes, dim))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(dot(vec, planes[p]) >= 0, F.lit(1)).otherwise(F.lit(0))
        * F.pow(F.lit(2.0), p).cast("long"),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket. Same output shape as cosine_topk; recall < 1 by design.
    At 100 TB the bucket column is also the natural partition key for
    the corpus layout, turning ANN into a pruned-scan + local top-k.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), n_planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv"), n_planes, dim))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
