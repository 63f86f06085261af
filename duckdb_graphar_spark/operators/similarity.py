"""Similarity search over embedding columns (`array<float>`).

Two paths (SURVEY §2.F):

- **Brute-force top-k** — exact baseline: broadcast the (small) query
  set, score every corpus row with a JVM-side dot product
  (`zip_with` + `aggregate`, no Python), take top-k per query with a
  window.  At 100 TB this is one full scan per query batch — correct,
  embarrassingly parallel, no shuffle except the final top-k.
- **LSH-bucketed top-k** — scale path: random-hyperplane signatures
  bucket the corpus (one shuffle to write, reusable across queries);
  each query probes only its bucket(s), trading recall for a ~2^planes
  reduction in scored candidates.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query →
    (query_id, neighbor_id, cosine_sim, rank[, *carry_cols]).

    Queries are broadcast (they're the small side); scoring is a
    shuffle-free map over corpus partitions; only the per-query top-k
    shuffles (TakeOrderedAndProject-style via window + filter).
    Excludes the query row itself when ids collide.
    Ties broken by neighbor id for determinism.

    ``carry_cols``: extra CORPUS columns to carry through scoring and
    the top-k onto each surviving neighbor row — the attach-attributes
    case (s15's neighbor labels) costs zero extra corpus passes this
    way, where a post-hoc join back to the corpus pays a full re-scan.
    """
    carry = list(carry_cols or [])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    # norms once per corpus row / per query — not once per (row, query) pair
    c = corpus.withColumn("__cn", norm(F.col(vec_col)))
    denom = F.col("__cn") * F.col("__qn")
    sim = F.when(denom > 0, dot(F.col(vec_col), F.col("__qv")) / denom).otherwise(F.lit(0.0))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(sim, 6).alias("cosine_sim"),
            *carry,
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank", *carry)
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_bucket(
    vec: Column, *, dim: int = 64, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (long): bit b = sign(vec · plane_b).
    Planes are a deterministic literal array (broadcast in the plan)."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's hyperplane
    bucket(s).  With `multiprobe`, each query also probes the n_planes
    Hamming-1 neighbor buckets (the standard recall boost — the nearest
    misses are the vectors that fell on the other side of one plane).
    Same output schema as brute_force_topk."""
    cb = corpus.withColumn(
        "__bkt", hyperplane_bucket(F.col(vec_col), dim=dim, n_planes=n_planes, seed=seed)
    ).withColumn("__cn", norm(F.col(vec_col)))
    qbucket = hyperplane_bucket(F.col(query_vec_col), dim=dim, n_planes=n_planes, seed=seed)
    probes = [qbucket] + (
        [qbucket.bitwiseXOR(F.lit(1 << b).cast("long")) for b in range(n_planes)]
        if multiprobe
        else []
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        F.explode(F.array(*probes)).alias("__bkt"),
    ).withColumn("__qn", norm(F.col("__qv")))
    denom = F.col("__cn") * F.col("__qn")
    sim = F.when(denom > 0, dot(F.col(vec_col), F.col("__qv")) / denom).otherwise(F.lit(0.0))
    scored = (
        cb.join(F.broadcast(qb), "__bkt")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(sim, 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: list[list[float]] | None = None,
    dim: int = 64,
    n_cells: int = 16,
    seed: int = 7,
) -> DataFrame:
    """IVF-style ANN: assign corpus rows to their nearest centroid cell
    (one pass), probe the `n_probe` nearest cells per query.

    Centroids default to a deterministic random set; production would
    k-means them offline.  The cell assignment is a JVM-side argmax over
    literal centroid arrays, so the partitioned index is a plain
    DataFrame that can be written out partitioned by cell.
    """
    if centroids is None:
        rng = np.random.default_rng(seed)
        centroids = rng.standard_normal((n_cells, dim)).tolist()

    def nearest_cells(vec: Column, n: int) -> Column:
        dists = F.array(
            *[
                dot(vec, F.array(*[F.lit(float(x)) for x in c]))
                for c in centroids
            ]
        )
        idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        pairs = F.arrays_zip(dists.alias("d"), idx.alias("i"))
        best = F.slice(F.reverse(F.array_sort(pairs)), 1, n)
        return F.transform(best, lambda p: p.getField("i"))

    cb = corpus.withColumn("__cell", nearest_cells(F.col(vec_col), 1)[0]).withColumn(
        "__cn", norm(F.col(vec_col))
    )
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        F.explode(nearest_cells(F.col(query_vec_col), n_probe)).alias("__cell"),
    ).withColumn("__qn", norm(F.col("__qv")))
    denom = F.col("__cn") * F.col("__qn")
    sim = F.when(denom > 0, dot(F.col(vec_col), F.col("__qv")) / denom).otherwise(F.lit(0.0))
    scored = (
        cb.join(F.broadcast(qb), "__cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(sim, 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists →
    (id, rrf_score, n_sources, rank): score(d) = Σ_sources 1/(c + rank_s(d)).
    The standard hybrid-retrieval combiner (BM25 list + embedding list)
    — rank-based, so the sources' incomparable score scales never touch
    each other.

    Determinism: each contribution 1/(c + rank) is one IEEE division of
    exact integers; contributions accumulate as DECIMAL(38,18)
    (order-independent across sources and partitions), and the final
    ordering compares the ROUNDED score with id tiebreak.

    Scale shape: the inputs are already-truncated top-k lists (tiny);
    union + one groupBy + TakeOrderedAndProject.  With corpus-sized
    inputs the same plan holds: one hash shuffle on id, no windows over
    unpartitioned data except the k-row rank stamp."""
    if not rankings:
        raise ValueError("rankings must be non-empty")
    tagged = [
        r.select(
            F.col(id_col).alias("__id"),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col)))
            .cast("decimal(38,18)")
            .alias("__contrib"),
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionAll(t)
    fused = u.groupBy("__id").agg(
        F.round(F.sum("__contrib").cast("double"), 6).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    top = fused.orderBy(F.col("rrf_score").desc(), F.col("__id").asc()).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("__id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("__id").alias(id_col),
        "rrf_score",
        F.col("n_sources").cast("long").alias("n_sources"),
        "rank",
    )


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    method: str = "exact",
) -> DataFrame:
    """Maximum Inner Product Search: exact top-k neighbors per query by
    INNER PRODUCT (not cosine) — the recommender-serving retrieval
    shape, where item popularity lives in the vector norm and cosine
    would erase it.  Returns (query_id, neighbor_id, inner_product,
    rank), ties broken by neighbor id.

    ``method="exact"``: broadcast queries, shuffle-free scoring map
    over corpus partitions, per-query top-k via window — the
    brute-force baseline.

    ``method="augmented"``: the Shrivastava-Li MIPS→NN reduction as
    the scale path: with M = max corpus norm, append
    sqrt(M²-|x|²) to every corpus vector and 0 to the query — then
    inner-product order equals COSINE order on the augmented vectors,
    so any cosine ANN index (LSH buckets, IVF cells) serves MIPS
    unchanged.  Here the augmented route re-scores through the same
    exact scan (this fixture has no index to reuse), verifying the
    reduction: published inner products are identical to the exact
    method, only the candidate ordering machinery differs.  M is one
    map-combinable 1-row aggregate.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    if method == "augmented":
        m2 = (
            corpus.select(
                F.aggregate(
                    F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x
                ).alias("__n2")
            )
            .agg(F.max("__n2"))
            .first()[0]
        )
        if m2 is None:
            raise ValueError("mips_topk(method='augmented'): empty corpus")
        c = corpus.withColumn(
            "__aug",
            F.concat(
                F.col(vec_col),
                F.array(
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            F.lit(float(m2))
                            - F.aggregate(
                                F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x
                            ),
                        )
                    )
                ),
            ),
        )
        qa = q.withColumn(
            "__qa", F.concat(F.col("__qv"), F.array(F.lit(0.0)))
        ).withColumn("__qn", norm(F.col("__qa")))
        ca = c.withColumn("__cn", norm(F.col("__aug")))
        denom = F.col("__cn") * F.col("__qn")
        order_key = F.when(
            denom > 0, dot(F.col("__aug"), F.col("__qa")) / denom
        ).otherwise(F.lit(0.0))
        scored = (
            ca.crossJoin(F.broadcast(qa))
            .filter(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                # published score is the TRUE inner product; the cosine
                # of the augmented pair only orders the candidates
                F.round(dot(F.col(vec_col), F.col("__qv")), 6).alias(
                    "inner_product"
                ),
                order_key.alias("__ord"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("__ord").desc(), F.col("neighbor_id").asc()
        )
    elif method == "exact":
        scored = (
            corpus.crossJoin(F.broadcast(q))
            .filter(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                F.round(dot(F.col(vec_col), F.col("__qv")), 6).alias(
                    "inner_product"
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("inner_product").desc(), F.col("neighbor_id").asc()
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "inner_product", "rank")
    )


def retrieval_metrics(
    approx: DataFrame,
    exact: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval QUALITY of an approximate top-k result
    against an exact ground truth → (query_id, n_hits, recall_at_k,
    reciprocal_rank) — the eval primitive every ANN index ships with
    (the quality gate next to s13's Matryoshka recall, but generic
    over any two ranked result sets).

    ``recall_at_k`` = |approx∩exact|/k and ``reciprocal_rank`` = 1/rank
    of the FIRST approx hit that is exact-relevant (0.0 when none) —
    each one IEEE division of exact small integers, so both metrics
    are bit-stable across engines.  The ground-truth query set is the
    spine: queries the approx side missed entirely report 0 hits
    honestly.

    Scale shape: two rank-filtered projections, one semi-join keyed on
    (query, neighbor) — k·|queries| rows per side, never corpus-sized
    — and one map-combinable groupBy(query)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    a = approx.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(neighbor_col).alias("__n"),
        F.col(rank_col).alias("__r"),
    )
    g = exact.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    )
    hits = a.join(g, ["__q", "__n"], "left_semi")
    per_q = hits.groupBy("__q").agg(
        F.count(F.lit(1)).alias("__hits"), F.min("__r").alias("__first")
    )
    spine = g.select("__q").distinct()
    return (
        spine.join(per_q, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce(F.col("__hits"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("__hits"), F.lit(0)).cast("double") / F.lit(float(k))
            ).alias("recall_at_k"),
            F.when(
                F.col("__first").isNull(), F.lit(0.0)
            ).otherwise(F.lit(1.0) / F.col("__first")).alias("reciprocal_rank"),
        )
    )
