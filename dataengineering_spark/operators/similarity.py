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


# Measured dead end (sf1, 25M candidate pairs): unrolling the dot fold
# into a flat 64-term element_at sum was 3x SLOWER than the
# interpreted aggregate/zip_with fold (62 s vs 23 s for the same
# count) — the giant expression falls out of whole-stage codegen and
# per-element array access loses to the fold's single traversal. Keep
# the fold; cut pair cost by precomputing self-dots and comparing
# dot >= t*sqrt(dd_a*dd_b) instead (one fold per pair, not three).


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def topk_per_query(
    scored: DataFrame,
    k: int,
    score_col: str = "cos_sim",
    descending: bool = True,
) -> DataFrame:
    """Two-stage top-k over (query_id, neighbor_id, score_col) —
    descending for similarities, ascending for distances.

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
    score = F.col(score_col).desc() if descending else F.col(score_col).asc()
    order = [score, F.col("neighbor_id").asc()]
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
        .select("query_id", "neighbor_id", "rank", score_col)
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
    # BIGINT multipliers: the top nibble times 16^7 exceeds int32, and
    # Spark 4's ANSI mode turns that overflow into a hard error at
    # constant-folding time.
    terms = " + ".join(
        f"(position(substr({h}, {j + 1}, 1) in '0123456789abcdef') - 1)"
        f" * {16 ** (7 - j)}L"
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


def _self_dot(xs: list) -> float:
    """dot(x, x) with the engine's left-to-right fold — the SAME IEEE
    operation sequence aggregate(zip_with(...)) performs, so inlining
    the result as a literal is bit-identical to computing it in-plan.
    (HOF lambdas are interpreted per row; a K-centroid argmin used to
    re-run dot(c,c) — a pure constant — K times per corpus row.)"""
    acc = 0.0
    for x in xs:
        acc = acc + x * x
    return acc


def _d(x: float) -> str:
    """Shortest round-trip double literal for SQL text — parses back to
    the identical IEEE value."""
    return f"{float(x)!r}D"


def _arr_expr(cv: list) -> Column:
    """array<double> literal built as ONE parsed SQL expression.
    Column-API construction (F.lit per element / per list) costs a py4j
    round-trip per call — ~0.4 s per 8×64 codebook, paid again on every
    assign/encode/LUT build; one parse is ~2 ms."""
    return F.expr("array(" + ", ".join(_d(x) for x in cv) + ")")


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the :func:`dot` fold — parses to the IDENTICAL
    aggregate/zip_with expression the Column API builds (same lambda
    structure, same 0.0 init, same + fold), so values are bit-equal.
    Exists because each Column-API ``dot`` costs ~20 py4j round-trips
    (~22 ms measured); the r13 profile of a WARM ivfpq_ann build showed
    3.4 s spent almost entirely in those round-trips (10.8k
    send_commands), dominated by 62 dot/_dist2_lit constructions. One
    string parse per OUTPUT COLUMN amortizes all of them."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )


def _dist2_lit_sql(vv: str, v: str, cv: list) -> str:
    """SQL text of :func:`_dist2_lit` — same associativity
    ((vv − 2·<v,c>) + <c,c>), same ``_d`` double literals."""
    arr = "array(" + ", ".join(_d(x) for x in cv) + ")"
    return f"{vv} - 2 * {_dot_sql(v, arr)} + {_d(_self_dot(cv))}"


def _dist2_lit(vv: Column, v: Column, cv: list) -> Column:
    """d² against a driver-known centroid: per-row ``vv`` (computed
    once per row, not once per centroid) − 2·<v,c> + literal <c,c>."""
    return vv - 2 * dot(v, _arr_expr(cv)) + F.lit(_self_dot(cv))


def _spread_for_training(e: DataFrame) -> DataFrame:
    """Multi-pass training reads the corpus n_iters+1 times with
    interpreted per-row math; when the scan has fewer partitions than
    cores (tiny compressed files — same failure mode as
    catalog._spread_if_narrow), one up-front round-robin pays for
    itself immediately. At production split counts this is a no-op.

    Delegates to :func:`operators.dedup.spread_for_compute` (r13): the
    former ``df.rdd.getNumPartitions()`` probe cost a full plan
    analysis + RDD conversion (~300 ms of driver latency, measured on
    the LSH path) on EVERY ann/semantic query; the shared helper
    estimates split counts from ``inputFiles()`` + local file sizes
    (~30 ms) with the RDD probe only as the non-file fallback."""
    from dataengineering_spark.operators.dedup import spread_for_compute

    return spread_for_compute(e)


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


def _centroid_rows(cents: DataFrame) -> list[tuple[int, list]]:
    """Collect a (cid, cv) centroid frame into sorted driver rows —
    a bounded C × dim scalar probe. Collecting ONCE per training step
    and re-inlining as literals keeps every downstream assign a narrow
    map and means nothing needs to stay persisted across steps."""
    return sorted((int(r["cid"]), list(r["cv"])) for r in cents.collect())


def _ranked_seed_rows(e: DataFrame, n: int) -> list[tuple[int, list]]:
    """Top-n md5-ranked corpus vectors as driver rows (cid, v) — the
    shared seed set for the coarse quantizer AND the PQ codebooks
    (prefix-closed: top-k is a prefix of top-n for k ≤ n, so one
    collect serves both). orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-n, driver merge — never
    a partition-less Window."""
    ranked = (
        e.select(
            F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "v"
        )
        .orderBy("h", "vec_id")
        .limit(n)
    )
    rows = sorted(ranked.collect(), key=lambda r: (r["h"], r["vec_id"]))
    if not rows:
        # V6 empty-input guard: an empty training corpus would otherwise
        # surface as an opaque VOID-literal AnalysisException downstream.
        raise ValueError("ANN training requires a non-empty corpus")
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def ivf_assign(
    e: DataFrame, cents: DataFrame | list, n: int = 1
) -> DataFrame:
    """Assign each vector to its n nearest centroids (n=1: cell
    assignment; n=nprobe: query probe list) — SHUFFLE-FREE.

    The C centroids (a bounded C × dim scalar probe, C ≤ dozens by
    construction; pass pre-collected ``_centroid_rows`` output to reuse
    one collect across several assigns) are inlined as an
    array-of-structs literal; each row then sorts ``struct(d2, cid)``
    in-place and keeps the first n — a narrow map, no Exchange anywhere
    between the corpus scan and its cell id. The earlier crossJoin +
    Window shape shuffled corpus × C scored rows per Lloyd iteration;
    at 100 TB that is a C× shuffle amplification of the whole corpus,
    repeated n_iters+1 times. ``array_sort`` on structs orders by
    (d2, cid) — the exact tie-break the Window used, so results are
    bit-identical.
    """
    rows = cents if isinstance(cents, list) else _centroid_rows(cents)
    if not rows:
        raise ValueError("ivf_assign requires at least one centroid")
    # the whole scored array as ONE parsed expression (r13): the former
    # per-centroid Column construction cost ~20 py4j round-trips per
    # _dist2_lit — ~0.5 s of driver latency per assign at C=8 — while
    # the parsed tree (and therefore every value) is identical
    scored_sql = "array(" + ", ".join(
        f"named_struct('d2', {_dist2_lit_sql('_vv', 'v', cv)}, "
        f"'cid', {int(cid)})"
        for cid, cv in rows
    ) + ")"
    picked = F.expr(
        f"slice(array_sort({scored_sql}), 1, {min(n, len(rows))})"
    )
    staged = e.select(
        "vec_id", "v", F.expr(_dot_sql("v", "v")).alias("_vv")
    )
    return staged.select(
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


def ivf_train_rows(
    e: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    seed_rows: list | None = None,
) -> list[tuple[int, list]]:
    """Driver-side Lloyd loop: each iteration assigns against inlined
    literals (narrow map) and collects only the C × dim centroid
    update. Nothing is persisted and lineage never grows — iteration i
    depends only on the literals of iteration i-1, not its plan.
    ``seed_rows``: pre-collected :func:`_ranked_seed_rows` output to
    share one seed collect across quantizers (prefix is taken)."""
    e = _spread_for_training(e)
    if seed_rows is not None:
        rows = [(cid, v) for cid, v in seed_rows[:n_centroids]]
    else:
        rows = _ranked_seed_rows(e, n_centroids)
    for _ in range(n_iters):
        rows = _centroid_rows(ivf_update_centroids(ivf_assign(e, rows), dim))
    return rows


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, cv) after n_iters Lloyd iterations from deterministic
    seeds — frame view of :func:`ivf_train_rows` for callers that want
    to inspect or join the codebook."""
    e = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    rows = ivf_train_rows(e, n_centroids, n_iters, dim)
    return corpus.sparkSession.createDataFrame(
        [(cid, cv) for cid, cv in rows], "cid INT, cv ARRAY<DOUBLE>"
    )


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
    cent_rows: list | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: brute-force cosine only within the
    query's nprobe nearest cells. Same output shape as cosine_topk.
    Pass pre-trained ``cent_rows`` to skip training (the train-once/
    serve-many contract shared with semantic_cells)."""
    e = _spread_for_training(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    if cent_rows is None:
        cent_rows = ivf_train_rows(e, n_centroids, n_iters, dim)
    cells = ivf_assign(e, cent_rows).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cid"
    )
    q = queries.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    probes = ivf_assign(q, cent_rows, n=nprobe).select(
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


# --- Product quantization (IVF-PQ's compression half) ----------------------
#
# PQ splits each D-dim vector into M contiguous d_sub-dim subvectors
# and learns an independent K-centroid codebook per subspace (same
# deterministic Lloyd recipe as the IVF coarse quantizer: md5-ranked
# seeds, fixed iteration count, 1e-6 fixed-point centroid sums — so
# the whole training run replays as a DuckDB CTE chain bit-for-bit).
# A vector is then stored as M small codes: at 64-dim double vectors
# and M=4/K=8 that is 512 bytes -> 4 bytes per vector, and scoring
# against a query touches only the codes plus a per-query M x K
# lookup table (ADC — asymmetric distance computation).
#
# Scale shape (100 TB corpus): training shuffles only M x K x d_sub
# fixed-point partial sums per partition; ENCODING is a pure narrow
# map (codebooks inlined as literals, argmin per row — no explode, no
# exchange); SCORING joins the code table against a BROADCAST frame of
# per-query LUTs built in-plan, so the corpus is never shuffled and
# per-candidate cost is M array lookups + M adds, independent of D.


def _subvector_slices(v, m_sub: int, d_sub: int) -> list:
    return [F.slice(v, m * d_sub + 1, d_sub) for m in range(m_sub)]


def pq_subvectors(e: DataFrame, m_sub: int, d_sub: int) -> DataFrame:
    """(vec_id, m, sv) — training-side exploded form (the Lloyd update
    needs a groupBy anyway; the encode hot path never uses this)."""
    subs = F.array(*_subvector_slices(F.col("v"), m_sub, d_sub))
    return e.select("vec_id", F.posexplode(subs).alias("m", "sv"))


def _codebook_rows(books: DataFrame) -> dict[int, list]:
    """Collect a codebook frame into {m: [cv ordered by cid]} — an
    M x K x d_sub scalar probe, bounded by construction."""
    by_m: dict[int, list] = {}
    for r in books.collect():
        by_m.setdefault(int(r["m"]), []).append((int(r["cid"]), list(r["cv"])))
    out = {m: [cv for _, cv in sorted(rows)] for m, rows in by_m.items()}
    for m, rows in by_m.items():
        cids = sorted(cid for cid, _ in rows)
        # Positional indexing downstream (encode argmin, ADC LUT) is
        # only valid on a dense 0..K-1 cid space; pq_codebooks'
        # carry-forward guarantees it, so a gap here is a logic bug.
        assert cids == list(range(len(cids))), f"sparse PQ cids in subspace {m}: {cids}"
    return out


def _cent_struct_sql(cvs: list) -> str:
    parts = ", ".join(
        f"named_struct('cid', {cid}, "
        f"'cv', array({', '.join(_d(x) for x in cv)}), "
        f"'cc', {_d(_self_dot(cv))})"
        for cid, cv in enumerate(cvs)
    )
    return f"array({parts})"


def _cent_struct_lit(cvs: list) -> Column:
    return F.expr(_cent_struct_sql(cvs))


def pq_assign(es: DataFrame, by_m: dict[int, list]) -> DataFrame:
    """Assign each (vec_id, m, sv) row to its nearest sub-centroid —
    SHUFFLE-FREE: the nested codebook literal is indexed by m per row
    and the argmin is an in-row struct(d2, cid) sort (ties to the
    lower cid, exactly ROW_NUMBER ORDER BY d2, cid)."""
    books_lit = F.array(
        *[_cent_struct_lit(by_m[m]) for m in sorted(by_m)]
    )
    cent_list = F.element_at(books_lit, F.col("m") + 1)
    scored = F.transform(
        cent_list,
        lambda c: F.struct(
            (F.col("_svv") - 2 * dot(F.col("sv"), c["cv"]) + c["cc"]).alias(
                "d2"
            ),
            c["cid"].alias("cid"),
        ),
    )
    best = F.element_at(F.array_sort(scored), 1)
    staged = es.withColumn("_svv", dot(F.col("sv"), F.col("sv")))
    return staged.withColumn("code", best["cid"]).drop("_svv")


def pq_update_codebooks(asg: DataFrame, d_sub: int) -> DataFrame:
    """One Lloyd update per subspace: element-wise mean per (m, code)
    on the 1e-6 fixed-point grid (engine-exact). Shuffle volume is
    M x K x d_sub partials per partition, corpus-size-independent."""
    comps = (
        asg.select("m", "code", F.posexplode("sv").alias("pos", "x"))
        .groupBy("m", "code", "pos")
        .agg(
            F.sum(F.floor(F.col("x") * QUANT_SCALE).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "m",
            F.col("code").alias("cid"),
            "pos",
            (F.col("s").cast("double") / (F.lit(QUANT_SCALE) * F.col("n"))).alias(
                "comp"
            ),
        )
    )
    return comps.groupBy("m", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "comp"))), lambda s: s["comp"]
        ).alias("cv")
    )


def pq_train_books(
    e: DataFrame,
    m_sub: int = 4,
    k_sub: int = 8,
    n_iters: int = 1,
    dim: int = 64,
    seed_rows: list | None = None,
) -> dict[int, list]:
    """{m: [cv ordered by cid]} after n_iters deterministic Lloyd
    iterations. ``e`` is (vec_id, v: array<double>). ``seed_rows``:
    pre-collected :func:`_ranked_seed_rows` output to share one seed
    collect with the coarse quantizer.

    Driver-side loop like :func:`ivf_train_rows`: each iteration
    assigns against inlined literals and collects only the
    M × K × d_sub update — no persist, no lineage growth.

    Empty-cluster guard: a code with zero assignments this round keeps
    its previous centroid instead of vanishing. Without this the cid
    space goes sparse and the positional codebook arrays (encode
    argmin, ADC LUT index) silently desynchronize from any engine that
    kept original cids — a divergence that only shows up when the data
    happens to produce an empty code.
    """
    d_sub = dim // m_sub
    e = _spread_for_training(e)
    if seed_rows is None:
        seed_rows = _ranked_seed_rows(e, k_sub)
    # per-subspace seeds = subvector slices of the shared seed vectors
    # (pure row selection, no arithmetic — engine parity preserved)
    by_m = {
        m: [list(v[m * d_sub : (m + 1) * d_sub]) for _, v in seed_rows[:k_sub]]
        for m in range(m_sub)
    }
    es = pq_subvectors(e, m_sub, d_sub)
    for _ in range(n_iters):
        upd = pq_update_codebooks(pq_assign(es, by_m), d_sub)
        upd_rows = {
            (int(r["m"]), int(r["cid"])): list(r["cv"]) for r in upd.collect()
        }
        by_m = {
            m: [upd_rows.get((m, cid), cv) for cid, cv in enumerate(cvs)]
            for m, cvs in by_m.items()
        }
    return by_m


def pq_codebooks(
    e: DataFrame,
    m_sub: int = 4,
    k_sub: int = 8,
    n_iters: int = 1,
    dim: int = 64,
) -> DataFrame:
    """(m, cid, cv) frame view of :func:`pq_train_books`."""
    by_m = pq_train_books(e, m_sub, k_sub, n_iters, dim)
    return e.sparkSession.createDataFrame(
        [(m, cid, cv) for m, cvs in by_m.items() for cid, cv in enumerate(cvs)],
        "m INT, cid INT, cv ARRAY<DOUBLE>",
    )


def pq_encode(
    e: DataFrame,
    by_m: dict[int, list],
    m_sub: int,
    d_sub: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, codes: array<int>, *keep) — the corpus compression step
    as a PURE NARROW MAP: per subspace, an in-row argmin against the
    inlined codebook; no explode, no exchange, nothing but the scan.
    ``keep`` passes extra columns through (e.g. the IVF cell id)."""
    # Stage the subvector slices and their self-dots in their own
    # projections so each is computed once per row; the K-way argmin
    # then only pays K cross-dots per subspace (vs 3K dots when every
    # centroid's d² recomputed <sv,sv> and the constant <c,c>).
    staged = e.select(
        "vec_id",
        *keep,
        *[
            F.slice(F.col("v"), m * d_sub + 1, d_sub).alias(f"_s{m}")
            for m in range(m_sub)
        ],
    ).select(
        "*",
        *[
            F.expr(_dot_sql(f"_s{m}", f"_s{m}")).alias(f"_vv{m}")
            for m in range(m_sub)
        ],
    )

    def code_for_sql(m: int) -> str:
        # identical tree to the former Column-API transform/struct
        # build (same lambda body, same field order), parsed once —
        # the per-m HOF construction was ~25 ms of py4j each (r13)
        return (
            "element_at(array_sort(transform("
            + _cent_struct_sql(by_m[m])
            + f", c -> named_struct('d2', _vv{m} - 2 * "
            + _dot_sql(f"_s{m}", "c.cv")
            + " + c.cc, 'cid', c.cid))), 1).cid"
        )

    codes_sql = (
        "array(" + ", ".join(code_for_sql(m) for m in range(m_sub)) + ")"
    )
    return staged.select(
        "vec_id",
        F.expr(codes_sql).alias("codes"),
        *keep,
    )


def pq_query_luts(
    q: DataFrame, by_m: dict[int, list], m_sub: int, d_sub: int
) -> DataFrame:
    """(query_id, lut: array<array<double>>) — ADC lookup tables built
    IN-PLAN (lut[m][cid] = d2(query subvector m, codebook m cid)), so
    every double comes from the same engine arithmetic the oracle
    replays; the frame is |queries| rows and rides the broadcast."""
    staged = q.select(
        "query_id",
        *[
            F.slice(F.col("qv"), m * d_sub + 1, d_sub).alias(f"_q{m}")
            for m in range(m_sub)
        ],
    ).select(
        "*",
        *[
            F.expr(_dot_sql(f"_q{m}", f"_q{m}")).alias(f"_qv{m}")
            for m in range(m_sub)
        ],
    )
    # M×K _dist2_lit cells as ONE parsed expression (r13): the former
    # per-cell Column build was ~1.5 s of py4j per LUT construction
    lut_sql = "array(" + ", ".join(
        "array(" + ", ".join(
            _dist2_lit_sql(f"_qv{m}", f"_q{m}", cv) for cv in by_m[m]
        ) + ")"
        for m in range(m_sub)
    ) + ")"
    return staged.select("query_id", F.expr(lut_sql).alias("lut"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m_sub: int = 4,
    k_sub: int = 8,
    n_iters: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ/ADC: rank candidates by the sum of
    per-subspace distances to the query, looked up from the broadcast
    LUT — M lookups + M adds per candidate, D never touched.  Output
    (query_id, neighbor_id, rank, adc_d2), adc_d2 ascending."""
    d_sub = dim // m_sub
    e = _spread_for_training(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    by_m = pq_train_books(e, m_sub, k_sub, n_iters, dim)
    codes = pq_encode(e, by_m, m_sub, d_sub)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    luts = pq_query_luts(q, by_m, m_sub, d_sub)
    score = None
    for m in range(m_sub):
        term = F.element_at(
            F.element_at("lut", m + 1),
            F.element_at("codes", m + 1) + 1,
        )
        score = term if score is None else score + term
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            score.alias("adc_d2"),
        )
    )
    return topk_per_query(scored, k, score_col="adc_d2", descending=False)


def train_ivfpq_index(
    e: DataFrame,
    n_centroids: int,
    coarse_iters: int,
    m_sub: int,
    k_sub: int,
    pq_iters: int,
    dim: int,
) -> "tuple[list, dict]":
    """Train the IVF-PQ artifacts — (cent_rows, by_m) — from a
    normalized (vec_id, v) frame. Both quantizers seed from the same
    md5-ranked prefix (one collect) and their Lloyd loops are
    independent, so they train on concurrent Spark jobs (driver
    threads; results deterministic either way). The spread frame is
    persisted for the span of the training collects (each is its own
    job and would otherwise re-scan + re-shuffle the corpus) and
    released before any scoring plan is built — the scoring job
    re-reads the source once, which is also the only behavior that
    exists at 100 TB, where the training sample is cached but the
    full corpus never is."""
    e.persist()
    try:
        seed_rows = _ranked_seed_rows(e, max(n_centroids, k_sub))
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_coarse = pool.submit(
                ivf_train_rows, e, n_centroids, coarse_iters, dim, seed_rows
            )
            f_books = pool.submit(
                pq_train_books, e, m_sub, k_sub, pq_iters, dim, seed_rows
            )
            return f_coarse.result(), f_books.result()
    finally:
        e.unpersist()


def train_ivfpq(
    corpus: DataFrame,
    n_centroids: int,
    coarse_iters: int,
    m_sub: int,
    k_sub: int,
    pq_iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "tuple[list, dict]":
    """:func:`train_ivfpq_index` over a RAW corpus frame — applies the
    same (vec_id, v)-normalization + training spread ``ivfpq_topk``
    uses, so an index trained here feeds ``ivfpq_topk(index=...)``
    bit-identically to its internal training path."""
    e = _spread_for_training(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    return train_ivfpq_index(
        e, n_centroids, coarse_iters, m_sub, k_sub, pq_iters, dim
    )


def save_ivfpq_index(spark, path: str, index: "tuple[list, dict]") -> None:
    """Persist trained IVF-PQ artifacts as two parquet tables
    (centroids: cid → vector; codebooks: (m, code) → sub-vector) so
    the expensive training pass runs ONCE and every downstream job —
    nightly encode, online probe, incremental append — reloads the
    identical quantizers. Doubles round-trip parquet exactly, so a
    reloaded index reproduces assignments bit-for-bit."""
    cent_rows, by_m = index
    spark.createDataFrame(
        [(int(cid), [float(x) for x in v]) for cid, v in cent_rows],
        "cid int, v array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (int(m), int(code), [float(x) for x in c])
            for m, cents in by_m.items()
            for code, c in enumerate(cents)
        ],
        "m int, code int, c array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_ivfpq_index(spark, path: str) -> "tuple[list, dict]":
    """Inverse of :func:`save_ivfpq_index`."""
    cent_rows = [
        (r.cid, list(r.v))
        for r in spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    ]
    by_m: dict[int, list] = {}
    for r in (
        spark.read.parquet(f"{path}/codebooks").orderBy("m", "code").collect()
    ):
        by_m.setdefault(r.m, []).append(list(r.c))
    return cent_rows, by_m


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    coarse_iters: int = 1,
    m_sub: int = 4,
    k_sub: int = 8,
    pq_iters: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: "tuple[list, dict] | None" = None,
) -> DataFrame:
    """IVF-PQ: the composed 100 TB ANN path. The coarse quantizer
    prunes the candidate set to the query's nprobe cells; PQ codes +
    an ADC lookup keep the per-candidate cost at M array reads.

    Plan shape: ONE pass over the corpus computes both the cell id and
    the M codes (a single narrow map — ``pq_encode`` over the
    ``ivf_assign`` output, no join between them), then an equi-join on
    cid against the BROADCAST probe×LUT frame scores only candidates
    in probed cells. The corpus is never shuffled; at scale the cid
    doubles as the storage partition key, so probing n cells is a
    partition-pruned scan of the code table (4-byte codes, not D
    doubles). Output (query_id, neighbor_id, rank, adc_d2) ascending.
    """
    d_sub = dim // m_sub
    e = _spread_for_training(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    if index is not None:
        cent_rows, by_m = index
    else:
        cent_rows, by_m = train_ivfpq_index(
            e, n_centroids, coarse_iters, m_sub, k_sub, pq_iters, dim
        )
    enc = pq_encode(ivf_assign(e, cent_rows), by_m, m_sub, d_sub, keep=("cid",))

    q = queries.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    probes = ivf_assign(q, cent_rows, n=nprobe).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid"
    )
    luts = pq_query_luts(
        q.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")),
        by_m,
        m_sub,
        d_sub,
    )
    probe_luts = probes.join(F.broadcast(luts), on="query_id").select(
        "query_id", "cid", "lut"
    )
    scored = adc_score_candidates(enc, probe_luts, m_sub)
    return topk_per_query(scored, k, score_col="adc_d2", descending=False)


def adc_score_col(m_sub: int) -> Column:
    """The ADC distance expression over an encoded row joined with its
    probe LUT: sum over sub-spaces of ``lut[m][codes[m]]`` — M array
    reads per candidate, no vector math at serve time."""
    score = None
    for m in range(m_sub):
        term = F.element_at(
            F.element_at("lut", m + 1),
            F.element_at("codes", m + 1) + 1,
        )
        score = term if score is None else score + term
    return score


def adc_score_candidates(
    enc: DataFrame, probe_luts: DataFrame, m_sub: int
) -> DataFrame:
    """Score encoded corpus rows against broadcast (query_id, cid, lut)
    probes: equi-join on cid — only candidates in probed cells are ever
    read — then the :func:`adc_score_col` lookup sum. Shared by the
    batch path (:func:`ivfpq_topk`) and the streaming serve path
    (``streaming/ann.py``) so both score bit-identically."""
    return (
        enc.join(F.broadcast(probe_luts), on="cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            adc_score_col(m_sub).alias("adc_d2"),
        )
    )


def encode_corpus(
    corpus: DataFrame,
    index: "tuple[list, dict]",
    m_sub: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes, cid) for the whole corpus under a trained
    index — the SAME single narrow-map pass :func:`ivfpq_topk` builds
    internally, surfaced so serve paths (notably ``streaming/ann.py``)
    can materialize it ONCE and probe it forever instead of
    re-encoding the corpus per query batch."""
    cent_rows, by_m = index
    e = _spread_for_training(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    return pq_encode(
        ivf_assign(e, cent_rows), by_m, m_sub, dim // m_sub, keep=("cid",)
    )


# ---------------------------------------------------------------------------
# Two-level coarse quantizer — the scale path past literal-inline
# assignment. Flat ivf_assign inlines C centroid literals per row:
# O(N·C·dim) scan work, fine to C ≈ a few hundred (the SCALE.md sf10
# ceiling note). Hierarchical assignment picks one of C1 super-cells,
# then one of that cell's C2 sub-cells — O(N·(C1+C2)·dim) for
# C1·C2 effective cells. Measured at sf10 (200k vecs, 16×16 vs flat
# 256): assign 27.5 s → 10.5 s, train 28.9 s → 17.6 s (grouped Lloyd),
# with the gap widening linearly in C. At SemDeDup's C ≈ N/1000, flat
# assignment dies around N ≈ 256k; two-level holds to C1·C2 ≈ 64k
# cells (N ≈ 64M vectors) before a third level would be needed.
# ---------------------------------------------------------------------------


def _grouped_sub_train(
    asg: DataFrame, c2: int, n_iters: int, dim: int
) -> dict[int, list]:
    """Train C2 sub-centroids for EVERY super cell in ONE distributed
    Lloyd loop (per-cell driver loops would pay C1 × n_iters × ~1 s of
    fixed job overhead — measured 41 s vs 18 s at C1=16). Seeds are the
    first C2 vectors per cell by md5 rank; assignment joins the
    training rows to their own cell's candidate centroids (a C2-row
    amplification of the TRAINING SAMPLE only, never the corpus);
    updates sum on the 1e-6 fixed-point grid like ivf_update_centroids.
    Deterministic end-to-end. Returns {super_cid: [(sub_cid, cv), …]}."""
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    cents = (
        asg.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= c2)
        .select(
            F.col("cid").alias("scid"),
            (F.col("_rn") - 1).alias("sub"),
            F.col("v").alias("cv"),
        )
        .persist()
    )
    cents.count()
    for _ in range(n_iters):
        j = asg.join(cents, asg.cid == cents.scid)
        d2 = (
            dot(F.col("v"), F.col("v"))
            - 2 * dot(F.col("v"), F.col("cv"))
            + dot(F.col("cv"), F.col("cv"))
        )
        best = (
            j.select("vec_id", "cid", "v", "sub", d2.alias("_d2"))
            .groupBy("vec_id", "cid", "v")
            .agg(F.min(F.struct(F.col("_d2"), F.col("sub"))).alias("_b"))
            .select("vec_id", "cid", "v", F.col("_b.sub").alias("sub"))
        )
        comps = (
            best.select("cid", "sub", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "sub", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * QUANT_SCALE).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid",
                "sub",
                "pos",
                (
                    F.col("s").cast("double") / (F.lit(QUANT_SCALE) * F.col("n"))
                ).alias("comp"),
            )
        )
        new_cents = (
            comps.groupBy("cid", "sub")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                    lambda s: s["comp"],
                ).alias("cv")
            )
            .select(F.col("cid").alias("scid"), "sub", "cv")
            .persist()
        )
        new_cents.count()
        cents.unpersist()
        cents = new_cents
    rows = cents.collect()
    cents.unpersist()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(int(r.scid), []).append((int(r.sub), list(r.cv)))
    for k in out:
        out[k].sort()
    return out


def two_level_train_rows(
    e: DataFrame,
    c1: int = 16,
    c2: int = 16,
    n_iters: int = 2,
    dim: int = 64,
    hot_split: "tuple[int, int] | None" = None,
) -> tuple[list, dict[int, list]]:
    """(super_rows, sub_by_super): train the two-level quantizer on
    ``e`` (vec_id, v). Pre-sample ``e`` with the caller's cap before
    calling — training cost is O(rows·(C1+C2)·dim) per iteration.
    Driver state is (C1 + C1·C2) × dim doubles — k-bounded.

    ``hot_split=(cap, corpus_n)`` enables BALANCE-AWARE training (the
    round-8 skew finding: at equal C and cap the uniform hierarchy
    capped out 1.5× the vectors flat quantization did, because hot
    super cells crammed the same c2 sub-budget as cold ones). After
    the uniform sub-train, the TRAINING SAMPLE is assigned through the
    trained tree and each sub-cell's corpus load is projected as
    ``sample_count · corpus_n / n_sample``; super cells owning any
    sub-cell projected above ``cap`` re-run the grouped sub-Lloyd at
    2·c2. The extra pass touches only the hot supers' sample slice, so
    the assignment win is untouched (per-row work stays O(c1 + 2·c2))
    and the cid space simply stretches to stride 2·c2 — see
    :func:`two_level_assign`, which derives the stride from the
    trained tree."""
    super_rows = ivf_train_rows(e, c1, n_iters, dim)
    asg = ivf_assign(e, super_rows).persist()
    n_sample = asg.count()
    try:
        sub_by_super = _grouped_sub_train(asg, c2, n_iters, dim)
        if hot_split is not None and n_sample:
            cap, corpus_n = hot_split
            scale = corpus_n / n_sample
            # uniform first pass trains <= c2 subs per super, so the
            # packing stride here is exactly c2
            proj = (
                two_level_assign(asg, super_rows, sub_by_super, c2)
                .groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            hot = sorted(
                {
                    int(r["cid"]) // c2
                    for r in proj
                    if r["n"] * scale > cap
                }
            )
            if hot:
                hot_lit = [int(h) for h in hot]
                resplit = _grouped_sub_train(
                    asg.filter(F.col("cid").isin(hot_lit)),
                    2 * c2,
                    n_iters,
                    dim,
                )
                sub_by_super.update(resplit)
    finally:
        asg.unpersist()
    return super_rows, sub_by_super


def two_level_assign(
    e: DataFrame,
    super_rows: list,
    sub_by_super: dict[int, list],
    c2: int,
) -> DataFrame:
    """(vec_id, v, cid) with cid = super·stride + sub — a narrow map,
    no Exchange: C1 literal dist2 evals pick the super cell, then ONLY
    the chosen cell's sub-centroid literals are evaluated through a
    CASE chain. Super cells that trained no sub-centroids (possible
    under a small training sample) fall back to sub 0 so every vector
    still gets a cell.

    The packing stride is ``max(c2, largest trained sub count)``: a
    uniform tree packs at exactly ``c2`` (the oracle-pinned layout),
    while a balance-aware tree (``two_level_train_rows`` with
    ``hot_split``) stretches to the hot supers' 2·c2 without cid
    collisions."""
    if not super_rows:
        raise ValueError("two_level_assign requires at least one super centroid")
    c2 = max([c2] + [len(rows) for rows in sub_by_super.values()])
    scored_super = F.array(
        *[
            F.struct(
                _dist2_lit(F.col("_vv"), F.col("v"), cv).alias("d2"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in super_rows
        ]
    )
    staged = e.select("vec_id", "v", dot(F.col("v"), F.col("v")).alias("_vv"))
    staged = staged.withColumn("_super", F.array_min(scored_super)["cid"])
    sub_expr = None
    for scid, rows in sorted(sub_by_super.items()):
        scored_sub = F.array(
            *[
                F.struct(
                    _dist2_lit(F.col("_vv"), F.col("v"), cv).alias("d2"),
                    F.lit(int(sub)).alias("cid"),
                )
                for sub, cv in rows
            ]
        )
        pick = F.array_min(scored_sub)["cid"]
        cond = (F.col("_super") == scid, F.lit(int(scid)) * c2 + pick)
        sub_expr = F.when(*cond) if sub_expr is None else sub_expr.when(*cond)
    sub_expr = (
        sub_expr.otherwise(F.col("_super") * c2)
        if sub_expr is not None
        else F.col("_super") * c2
    )
    return staged.select("vec_id", "v", sub_expr.cast("int").alias("cid"))
