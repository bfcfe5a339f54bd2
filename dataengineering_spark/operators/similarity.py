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


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Two-stage top-k over (query_id, neighbor_id, cos_sim).

    A single ``Window.partitionBy(query_id)`` shuffles every scored row
    into |queries| partitions — with a handful of queries each becomes
    one giant single-task partition. Stage 1 instead ranks within
    (spark_partition_id, query_id): the exchange keys have cardinality
    partitions × queries, so the same row volume spreads evenly, and
    only ≤ k rows per (partition, query) survive into stage 2, whose
    per-query window then sees ≤ partitions × k tiny rows. Results are
    identical: the global top-k is a subset of the union of
    per-partition top-ks, and ties break on neighbor_id both times.
    """
    order = [F.col("cos_sim").desc(), F.col("neighbor_id").asc()]
    w_local = Window.partitionBy("pid", "query_id").orderBy(*order)
    pruned = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("lr", F.row_number().over(w_local))
        .filter(F.col("lr") <= k)
        .drop("pid", "lr")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


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
    The query side is broadcast — the corpus is never shuffled for
    scoring, and the ranking runs through the two-stage
    :func:`topk_per_query` so no single-task per-query partition ever
    materializes.
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
    return topk_per_query(scored, k)


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


# --- IVF scale path ---------------------------------------------------------
#
# Inverted-file ANN: a coarse quantizer (k-means trained with a fixed
# number of Lloyd iterations from deterministic seeds) partitions the
# corpus into C cells; a query probes only its nprobe nearest cells.
# Everything is engine-portable by construction:
# - seeds: the C vectors with the smallest md5(vec_id) — a
#   deterministic pseudo-random sample;
# - centroid update: component sums are computed on floor(x * 1e6)
#   BIGINTs (exact, order-independent — double summation order would
#   differ between engines), then divided back in double;
# - distances: d^2 = <v,v> - 2<v,c> + <c,c> with the same left-to-right
#   dot fold the cosine path uses, ties broken by centroid id.
# At 100 TB the cell id is the corpus partition key: training touches
# each vector n_iters times (narrow scans + one tiny groupBy per
# iteration — C x dim rows), and a query reads nprobe cells instead of
# the full corpus.

QUANT_SCALE = 1_000_000.0  # centroid-update fixed-point grid (1e-6)


def _dist2(v: Column, c: Column) -> Column:
    return dot(v, v) - 2 * dot(v, c) + dot(c, c)


def ivf_seed_centroids(e: DataFrame, n_centroids: int) -> DataFrame:
    """(cid, cv): deterministic seeds — the n vectors ranked first by
    md5 of their id (engine-reproducible pseudo-random spread).

    orderBy + limit compiles to TakeOrderedAndProject — per-partition
    top-n then a driver-side merge of n × partitions rows — instead of
    a partition-less Window, which would funnel the whole corpus
    through one task just to pick n seeds. The cid 0..n-1 is then
    recovered by packing the n survivors into one sorted array and
    posexploding (a single-row aggregate over n rows, not a Window)."""
    ranked = (
        e.select(
            F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "v"
        )
        .orderBy("h", "vec_id")
        .limit(n_centroids)
    )
    packed = ranked.agg(
        F.array_sort(F.collect_list(F.struct("h", "vec_id", "v"))).alias("seeds")
    )
    return packed.select(F.posexplode("seeds").alias("cid", "s")).select(
        "cid", F.col("s.v").alias("cv")
    )


def ivf_assign(e: DataFrame, cents: DataFrame, n: int = 1) -> DataFrame:
    """Assign each vector to its n nearest centroids (n=1: cell
    assignment; n=nprobe: query probe list) — SHUFFLE-FREE.

    The C centroids (a bounded C × dim scalar probe, C ≤ dozens by
    construction) are collected and inlined as an array-of-structs
    literal; each row then sorts ``struct(d2, cid)`` in-place and keeps
    the first n — a narrow map, no Exchange anywhere between the
    corpus scan and its cell id. The earlier crossJoin + Window shape
    shuffled corpus × C scored rows per Lloyd iteration; at 100 TB
    that is a C× shuffle amplification of the whole corpus, repeated
    n_iters+1 times. ``array_sort`` on structs orders by (d2, cid) —
    the exact tie-break the Window used, so results are bit-identical.
    """
    rows = sorted(cents.collect(), key=lambda r: r["cid"])  # C rows, bounded
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r["cv"]]).alias("cv"),
            )
            for r in rows
        ]
    )
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            _dist2(F.col("v"), c["cv"]).alias("d2"), c["cid"].alias("cid")
        ),
    )
    picked = F.slice(F.array_sort(scored), 1, min(n, len(rows)))
    return e.select(
        "vec_id", "v", F.explode(picked).alias("_p")
    ).select("vec_id", "v", F.col("_p.cid").alias("cid"))


def ivf_update_centroids(asg: DataFrame, dim: int) -> DataFrame:
    """One Lloyd update: per-cell element-wise mean, summed on a 1e-6
    fixed-point grid so the result is bit-identical across engines.
    Codegen shape: posexplode -> hash agg (map-side partial sums), so
    the shuffle is C x dim rows no matter the corpus size."""
    comps = (
        asg.select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            F.sum(F.floor(F.col("x") * QUANT_SCALE).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cid",
            "pos",
            (F.col("s").cast("double") / (F.lit(QUANT_SCALE) * F.col("n"))).alias(
                "comp"
            ),
        )
    )
    return comps.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "comp"))), lambda s: s["comp"]
        ).alias("cv")
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cv) after n_iters Lloyd iterations from deterministic
    seeds. Returned persisted — it is re-read by assignment and probe."""
    e = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = ivf_seed_centroids(e, n_centroids)
    for _ in range(n_iters):
        cents = ivf_update_centroids(ivf_assign(e, cents), dim)
    return cents.persist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: brute-force cosine only within the
    query's nprobe nearest cells. Same output shape as cosine_topk."""
    e = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    cents = ivf_centroids(corpus, n_centroids, n_iters, dim, id_col, vec_col)
    cells = ivf_assign(e, cents).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cid"
    )
    q = queries.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    probes = ivf_assign(q, cents, n=nprobe).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    scored = (
        cells.join(F.broadcast(probes), on="cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    return topk_per_query(scored, k)


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
    return topk_per_query(scored, k)
