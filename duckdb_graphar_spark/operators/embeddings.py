"""Embedding-column utilities: normalization and int8 quantization.

Training/serving pipelines store embeddings quantized (4× smaller, SIMD
dot products); the quality gate is the reconstruction error, computed
here per vector.  Everything is JVM-side higher-order functions over
``array<float>`` — no Python in the loop, linear scan, no shuffle — so
the operator is a pure map at any scale.

Float parity note: the arrays are cast element-wise to double before
any arithmetic, giving bit-identical IEEE754 results in Spark and the
DuckDB oracle (both round() halves away from zero).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def _sql_double(x: float) -> str:
    """A DOUBLE literal for parsed-SQL interpolation.  repr(float)+'D'
    produces 'infD'/'nanD' for non-finite values, which fail to parse
    (the pre-r12 F.lit form accepted them); emit the explicit CAST
    spelling instead so non-finite centroid/query components keep
    working."""
    v = float(x)
    if math.isfinite(v):
        return repr(v) + "D"
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    return f"CAST('{'' if v > 0 else '-'}Infinity' AS DOUBLE)"


def _quote_ident(name: str) -> str:
    """Backtick-quote a column name for parsed-SQL interpolation,
    doubling embedded backticks (the escaping F.col performs)."""
    return "`" + name.replace("`", "``") + "`"


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    """sqrt(sum(x^2)) over an array column (double)."""
    return F.sqrt(
        F.aggregate(_as_double(vec), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def quantize_int8_stats(
    df: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization quality report.

    scale = max(|x|)/127 (the standard absmax scheme); q_i =
    round(x_i/scale) clamped to [-127,127]; reported per vector:

    - ``dim``            — vector length
    - ``norm``           — L2 norm of the original (round 6)
    - ``scale``          — quantization step (round 6)
    - ``max_abs_err``    — max_i |x_i - q_i*scale| (round 6); bounded by
      scale/2, so the bound itself is checked engine-independently
    - ``err_ok``         — max_abs_err <= scale/2 + 1e-12 (always true
      for a correct quantizer — a hard invariant, not a tolerance knob)

    All-zero vectors get scale 0, zero error.

    Plan note: every intermediate (cast vector, absmax, scale, q) is
    bound to a column via withColumn, NEVER referenced as a raw
    expression from inside a later lambda.  HOF lambdas are interpreted,
    and an expression tree embedded in a lambda body re-evaluates per
    ELEMENT — the original inline form recomputed
    array_max(transform(v, abs)) for each of the d elements of q and err
    (O(d²) per row; measured 8× slower on 128-dim vectors).
    CollapseProject leaves multi-referenced non-cheap expressions
    materialized, so the bound columns evaluate once per row.
    """
    s = df.select(F.col(id_col), F.col(vec_col).alias("__vec"))
    s = s.withColumn("__v", _as_double(F.col("__vec")))
    s = s.withColumn("__absmax", F.array_max(F.transform(F.col("__v"), F.abs)))
    s = s.withColumn("__scale", F.col("__absmax") / F.lit(127.0))
    s = s.withColumn(
        "__q",
        F.transform(
            F.col("__v"),
            lambda x: F.least(
                F.lit(127.0), F.greatest(F.lit(-127.0), F.round(x / F.col("__scale")))
            ),
        ),
    )
    err = F.array_max(
        F.zip_with(F.col("__v"), F.col("__q"), lambda x, qi: F.abs(x - qi * F.col("__scale")))
    )
    s = s.withColumn(
        "__err", F.when(F.col("__absmax") == 0.0, F.lit(0.0)).otherwise(err)
    )
    s = s.withColumn(
        "__norm", F.sqrt(F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x))
    )
    return s.select(
        F.col(id_col),
        F.size(F.col("__vec")).alias("dim"),
        F.round(F.col("__norm"), 6).alias("norm"),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.round(F.col("__err"), 6).alias("max_abs_err"),
        (F.col("__err") <= F.col("__scale") / F.lit(2.0) + F.lit(1e-12)).alias("err_ok"),
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment — the map step of Lloyd's k-means and
    the clustering primitive of SemDeDup-style semantic dedup (Abbas et
    al. 2023: cluster embeddings, then prune near-duplicates within each
    cluster).  Returns (id, cluster, dist2).

    ``centroids`` is a bounded driver-side list of (index, vector) — the
    standard k-means shape (centroids live on the driver between
    iterations; k rows, not data-sized).  Each assignment is a pure
    projection: per centroid, a zip_with of the row vector against a
    literal array; distances accumulate as DECIMAL(38,18) so the sum is
    order-independent and the argmin (struct array_min: distance, then
    centroid index on exact ties) is engine-deterministic — which is
    what lets a SQL oracle verify the assignment bit-for-bit.

    Scale shape: no shuffle, no Python — the full assign step maps over
    scan splits; an iteration's centroid update is one groupBy(cluster)
    mean over this output.
    """
    dim = _check_centroid_dims(centroids)
    # one parsed SQL expression instead of nested Column objects: the
    # Column form cost ~35 driver-side (py4j) calls per centroid —
    # a per-build constant that dominates at bench cadence (k-means
    # re-enters here every iteration) — for an identical tree (same
    # decimal-cast sequence; decimal Add grows precision by 1, so the
    # merge result is cast back to the accumulator type)
    cands = []
    for idx, cvec in centroids:
        carr = "array(" + ", ".join(_sql_double(x) for x in cvec) + ")"
        cands.append(
            "named_struct('d', "
            f"aggregate(zip_with({_quote_ident(vec_col)}, {carr}, "
            "(x, y) -> CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
            "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(38,18))), "
            "CAST(0 AS DECIMAL(38,18)), "
            "(a, x) -> CAST(a + x AS DECIMAL(38,18))), "
            f"'i', {int(idx)})"
        )
    best = _dim_guarded(
        F.expr("array_min(array(" + ", ".join(cands) + "))"),
        F.col(vec_col),
        dim,
    )
    return df.select(
        F.col(id_col),
        best["i"].alias("cluster"),
        F.round(best["d"].cast("double"), 6).alias("dist2"),
    )


def _check_centroid_dims(centroids: list[tuple[int, list[float]]]) -> int:
    """Fail loudly on ragged centroids: zip_with null-pads on length
    mismatch, and a NULL distance struct would win array_min's
    NULLS-FIRST ordering — a silent mis-assignment.  Returns the dim.
    (The data-vs-centroid dim is additionally guarded per row with
    raise_error in the assignment itself.)"""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dims = {len(v) for _, v in centroids}
    if len(dims) != 1:
        raise ValueError(f"centroid vectors have inconsistent dims {sorted(dims)}")
    return dims.pop()


def _dim_guarded(best: Column, vec: Column, dim: int) -> Column:
    """Wrap the argmin struct so a row whose vector length differs from
    the centroid dim raises instead of silently pairing with a
    null-padded zip_with."""
    return F.when(F.size(vec) == F.lit(dim), best).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"kmeans_assign: embedding dim "),
                F.size(vec).cast("string"),
                F.lit(f" != centroid dim {dim}"),
            )
        )
    )


def kmeans_assign_bulk(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`kmeans_assign` semantics with the centroid set attached as
    DATA — one broadcast single-row relation holding
    ``array<struct<i,cvec>>`` — instead of k inlined literal arrays.

    Same decimal accumulation and (distance, index) argmin, so the same
    SQL oracle verifies it bit-for-bit.  The difference is the plan
    shape: the literal form builds an O(k·d) expression tree (fine for
    driver-loop k-means with k ≤ ~16; pathological codegen beyond), while
    this form keeps the tree O(1) and evaluates the k·d arithmetic by
    iterating the centroid ARRAY per row.  Still a pure shuffle-free
    projection — the right assignment shape for SemDeDup-scale k ≈ √n.
    """
    dim = _check_centroid_dims(centroids)
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [([(int(i), [float(x) for x in v]) for i, v in centroids],)],
        "__cents: array<struct<i:int,cvec:array<double>>>",
    )

    def d2(cv: Column) -> Column:
        diff2 = F.zip_with(
            F.col(vec_col),
            cv,
            lambda x, y: ((x.cast("double") - y) * (x.cast("double") - y)).cast(
                "decimal(38,18)"
            ),
        )
        return F.aggregate(
            diff2,
            F.lit(0).cast("decimal(38,18)"),
            lambda a, x: (a + x).cast("decimal(38,18)"),
        )

    best = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(d2(c["cvec"]).alias("d"), c["i"].alias("i")),
        )
    )
    best = _dim_guarded(best, F.col(vec_col), dim)
    return df.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        best["i"].alias("cluster"),
        F.round(best["d"].cast("double"), 6).alias("dist2"),
    )


def seed_centroids(
    df: DataFrame, k: int, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic first-k-by-id seeding (reproducible across engines,
    unlike k-means++ random draws); the bounded k-row collect is the
    normal k-means driver round-trip."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return [(i, list(r[vec_col])) for i, r in enumerate(rows)]


def semdedup(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bulk_assign: bool | None = None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning made
    tractable by clustering — assign every embedding to its nearest
    centroid, then compare pairs ONLY within a cluster.  The all-pairs
    O(n²) cosine sweep becomes O(Σ|cluster|²): with k ≈ √n clusters the
    quadratic term is bounded per cluster, and the pair join is a plain
    shuffled equi-join on the cluster id (AQE splits skewed clusters like
    any other hot key).

    ``bulk_assign`` picks the assignment plan: the k-literal projection
    (:func:`kmeans_assign`) below 17 centroids, the O(1)-expression-tree
    data-attached form (:func:`kmeans_assign_bulk`) above — because the
    scale-correct k ≈ √n grows with the corpus, while literal expression
    trees don't.  ``None`` = auto by that rule.

    Returns one row per pruned pair: (cluster, id_keep, id_drop,
    cosine) with id_keep < id_drop (deterministic keep-lowest-id rule).

    ``max_cluster_size`` is the 100 TB escape hatch: every cluster is
    ranked along ONE deterministic projection direction (decimal-exact,
    engine-reproducible) and cut into contiguous slices of at most
    ``cap`` members; the pair join keys on (cluster, slice).  The pair
    sweep is bounded to O(n·cap·d) and the split itself costs O(n·d) +
    one per-cluster window sort — crucially NOT a secondary
    nearest-seed assignment, whose members×seeds work is
    O(Σ|cluster|²/cap·d) and merely re-buys the quadratic term on the
    degenerate giant-cluster inputs the cap exists for.  Documented
    approximation: pairs straddling a slice boundary are not compared
    (including exact duplicates that land either side of a cut — run
    hash dedup upstream, as SemDeDup deployments do anyway).  ``None``
    (default) keeps the exact within-cluster sweep — s06 uses the
    default, so its results are unchanged.
    """
    from duckdb_graphar_spark.operators.similarity import dot, norm

    if bulk_assign is None:
        bulk_assign = len(centroids) > 16
    assign = kmeans_assign_bulk if bulk_assign else kmeans_assign
    asg = assign(df, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), F.col("cluster")
    )
    # norms bind per ROW before the pair join — cosine() inline would
    # re-fold both norms per PAIR (|pairs|·2·d interpreted steps; the
    # same lesson as brute_force_topk's __cn/__qn)
    e = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(asg, id_col)
        .withColumn("__nrm", norm(F.col(vec_col)))
    )
    # The O(n·k·d) coarse assignment is the single most expensive
    # subtree here, and it appears on BOTH sides of the pair self-join
    # (plus 4 more times through the capped split's seed/sub lineage) —
    # Spark does not CSE across joins, so without pinning it would
    # re-execute per appearance.  A lazy localCheckpoint materializes
    # it once at first action and every other branch reads the cache;
    # n·(d+3) rows of executor-local storage, the standard iterative-
    # pipeline trade.
    e = e.localCheckpoint(eager=False)
    if max_cluster_size is not None:
        if max_cluster_size < 1:
            raise ValueError("max_cluster_size must be >= 1")
        from pyspark.sql import Window

        # PROJECTION-SLICE split, O(n·d): rank each cluster's members
        # along ONE deterministic direction (integer weights
        # w_j = (j·2654435761 mod 97) − 48, accumulated as DECIMAL so
        # the order — and therefore the slicing — is engine-exact) and
        # cut contiguous slices of exactly ≤ cap.  Similar vectors
        # project closely (1-D random-hyperplane locality), so slices
        # approximate semantic sub-clusters at a LINEAR cost — unlike a
        # secondary nearest-seed k-means, whose members×seeds work is
        # O(Σ|cluster|²/cap·d): on the degenerate giant-cluster inputs
        # this cap exists for, that merely re-buys the quadratic term.
        # Documented approximation: pairs straddling a slice boundary
        # are not compared (including an exact duplicate unlucky enough
        # to land either side of a cut — run hash dedup (t04/d05)
        # upstream, as every SemDeDup deployment does anyway).  A
        # degenerate cluster's sort is one window task; at 100 TB slice
        # the coarse k up first (this dial bounds memory, not sort).
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, j: (
                    x.cast("double")
                    * (
                        F.pmod(j.cast("bigint") * F.lit(2654435761), F.lit(97))
                        - 48
                    ).cast("double")
                ).cast("decimal(38,12)"),
            ),
            F.lit(0).cast("decimal(38,12)"),
            lambda acc, v: (acc + v).cast("decimal(38,12)"),
        )
        wr = Window.partitionBy("cluster").orderBy("__proj", id_col)
        e = (
            e.withColumn("__proj", proj)
            .withColumn(
                "__sub",
                F.floor(
                    (F.row_number().over(wr) - 1) / F.lit(max_cluster_size)
                ).cast("long"),
            )
            .drop("__proj")
            .localCheckpoint(eager=False)
        )
    else:
        e = e.withColumn("__sub", F.lit(1))
    a = e.select(
        F.col("cluster"),
        F.col("__sub"),
        F.col(id_col).alias("id_keep"),
        F.col(vec_col).alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    b = e.select(
        F.col("cluster").alias("__cb"),
        F.col("__sub").alias("__subb"),
        F.col(id_col).alias("id_drop"),
        F.col(vec_col).alias("__vb"),
        F.col("__nrm").alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    sim = F.round(
        F.when(denom > 0, dot(F.col("__va"), F.col("__vb")) / denom).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("cluster") == F.col("__cb"))
            & (F.col("__sub") == F.col("__subb"))
            & (F.col("id_keep") < F.col("id_drop")),
        )
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("cluster", "id_keep", "id_drop", "cosine")
    )


def kmeans_update(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The reduce half of a Lloyd's k-means iteration: per-cluster
    element-wise mean of the member vectors → (cluster, n, centroid).
    Together with :func:`kmeans_assign` this is one full distributed
    iteration; the driver loop just feeds the k-row result back in.

    Scale shape: posexplode to (cluster, dim, x) → ONE map-combinable
    groupBy(cluster, dim) — the shuffle carries k·d partial sums, not
    vectors — then a k-row regroup assembles the arrays (sort_array over
    the collected (dim, mean) structs makes the order deterministic;
    collect_list alone is not).  Per-dimension sums accumulate as
    DECIMAL(38,18), so means are aggregation-order-independent and the
    SQL oracle matches exactly.
    """
    asg = kmeans_assign(df, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), F.col("cluster")
    )
    j = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(asg, id_col)
        .select("cluster", F.posexplode(F.col(vec_col)).alias("__pos", "__x"))
    )
    per_dim = j.groupBy("cluster", "__pos").agg(
        F.sum(F.col("__x").cast("double").cast("decimal(38,18)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    mean = F.round(F.col("__s").cast("double") / F.col("__n"), 6)
    return (
        per_dim.select("cluster", "__pos", F.col("__n"), mean.alias("__m"))
        .groupBy("cluster")
        .agg(
            F.max("__n").alias("n"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__m"))),
                lambda s: s.getField("__m"),
            ).alias("centroid"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    n_iters: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bulk_assign: bool | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Full Lloyd's k-means: driver loop over assign → update with
    deterministic first-k seeding (:func:`seed_centroids`).

    Returns ``(final_update_df, history)`` where the DataFrame is the
    last iteration's (cluster, n, centroid) — still lazy, so it composes
    — and ``history`` holds one dict per iteration:
    ``{"iter", "inertia", "n_clusters"}``.  Inertia sums the per-row
    round-6 dist2 as fixed-scale DECIMAL, so it is
    aggregation-order-independent and bit-stable across runs.

    Scale shape: the ONLY driver state is k·d rounded centroid floats
    per iteration (the canonical k-means driver round-trip); each
    iteration is one shuffle-free assignment projection plus the k·d
    partial-sum update shuffle of :func:`kmeans_update`.  A cluster that
    loses every member keeps its previous centroid (deterministic, and
    keeps k stable across iterations).

    Centroids feed back as their ROUND-6 published values — the same
    numbers a SQL oracle can recompute — so a fixed-iteration replay
    matches bit-for-bit.
    """
    if bulk_assign is None:
        bulk_assign = k > 16
    assign = kmeans_assign_bulk if bulk_assign else kmeans_assign
    cents = seed_centroids(df, k, id_col=id_col, vec_col=vec_col)
    history: list[dict] = []
    upd: DataFrame | None = None
    for it in range(n_iters):
        asg = assign(df, cents, id_col=id_col, vec_col=vec_col)
        inertia = (
            asg.agg(
                F.round(
                    F.sum(F.col("dist2").cast("decimal(38,6)")).cast("double"), 6
                ).alias("i")
            ).first()["i"]
            or 0.0
        )
        upd = kmeans_update(df, cents, id_col=id_col, vec_col=vec_col)
        new = {int(r["cluster"]): list(r["centroid"]) for r in upd.collect()}
        cents = [(i, new.get(i, old)) for i, old in cents]
        history.append({"iter": it, "inertia": inertia, "n_clusters": len(new)})
    assert upd is not None
    return upd, history


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): the memory-scale path for
# similarity search — vectors compress to m small code indices against
# per-subspace codebooks; search reads codes, not floats.
# ---------------------------------------------------------------------------


def _check_codebooks(
    codebooks: list[list[tuple[int, list[float]]]]
) -> list[int]:
    """Validate per-subspace codebooks; returns the subspace dims."""
    if not codebooks:
        raise ValueError("codebooks must be non-empty")
    dims = []
    for j, cb in enumerate(codebooks):
        dims.append(_check_centroid_dims(cb))
    return dims


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encode: split each vector into ``m``
    contiguous subvectors, assign each to its nearest codebook entry,
    and report the code tuple plus the exact reconstruction error —
    the PQ quality gate.  Returns (id, codes: array<int>,
    recon_dist2: double round-6).

    Per subspace this is exactly :func:`kmeans_assign`'s decimal-argmin
    discipline (double diffs cast to DECIMAL(38,18), (distance, index)
    tie-break) applied to a bound slice column, so a SQL oracle can
    replay the encode bit-for-bit.  recon_dist2 sums the m per-subspace
    decimal distances EXACTLY before the one double cast.

    Scale shape: a pure shuffle-free projection — codebooks are m·k
    literal arrays (PQ codebooks are small by construction: k ≤ 256 per
    subspace); at 100 TB the encode maps over scan splits and the
    output codes table is ~d/m· smaller than the input floats.
    """
    dims = _check_codebooks(codebooks)
    total = sum(dims)
    s = df.select(F.col(id_col), F.col(vec_col).alias("__vec"))
    # slices bind to columns so the per-code zip_withs reference a bound
    # column, not a slice expression re-evaluated inside the HOF
    start = 1
    for j, d_sub in enumerate(dims):
        s = s.withColumn(f"__sl{j}", F.slice(F.col("__vec"), start, d_sub))
        start += d_sub
    # one parsed SQL expression per subspace instead of nested Column
    # objects: the Column form cost ~35 driver-side (py4j) calls per
    # codebook entry — the dominant per-build constant — for an
    # identical expression tree (same decimal-cast op sequence, same
    # (distance, index) struct tie-break)
    bests = []
    for j, cb in enumerate(codebooks):
        cands = []
        for idx, cvec in cb:
            carr = (
                "array(" + ", ".join(_sql_double(x) for x in cvec) + ")"
            )
            cands.append(
                "named_struct('d', "
                f"aggregate(zip_with(`__sl{j}`, {carr}, "
                "(x, y) -> CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
                "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(38,18))), "
                "CAST(0 AS DECIMAL(38,18)), "
                "(a, x) -> CAST(a + x AS DECIMAL(38,18))), "
                f"'i', {int(idx)})"
            )
        bests.append(F.expr("array_min(array(" + ", ".join(cands) + "))"))
    recon = bests[0]["d"]
    for b in bests[1:]:
        recon = (recon + b["d"]).cast("decimal(38,18)")
    # total-dim guard: a short vector would silently null-pad the last
    # slice (the same failure mode _dim_guarded pins for kmeans_assign)
    guarded = F.when(
        F.size(F.col("__vec")) == F.lit(total),
        F.struct(
            F.array(*[b["i"] for b in bests]).alias("codes"),
            F.round(recon.cast("double"), 6).alias("recon_dist2"),
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("pq_encode: embedding dim "),
                F.size(F.col("__vec")).cast("string"),
                F.lit(f" != codebook total dim {total}"),
            )
        )
    )
    return s.select(
        F.col(id_col),
        guarded["codes"].alias("codes"),
        guarded["recon_dist2"].alias("recon_dist2"),
    )


def pq_train(
    df: DataFrame,
    *,
    m: int = 4,
    k: int = 8,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Train PQ codebooks: per contiguous subspace, run
    :func:`kmeans_fit` on the sliced vectors (deterministic first-k
    seeding, decimal-exact updates).  Returns the codebooks list
    :func:`pq_encode` consumes.  Driver state: m·k·(d/m) floats."""
    first = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    d = int(first["n"])
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    d_sub = d // m
    books = []
    for j in range(m):
        sl = df.select(
            F.col(id_col), F.slice(F.col(vec_col), j * d_sub + 1, d_sub).alias(vec_col)
        )
        upd, _ = kmeans_fit(sl, k, n_iters, id_col=id_col, vec_col=vec_col)
        got = {int(r["cluster"]): list(r["centroid"]) for r in upd.collect()}
        seeds = dict(seed_centroids(sl, k, id_col=id_col, vec_col=vec_col))
        books.append(
            [(i, got.get(i, [float(x) for x in seeds[i]])) for i in range(k)]
        )
    return books


def _adc_table_exprs(
    codebooks: list[list[tuple[int, list[float]]]],
    query: list[float],
    dims: list[int],
) -> list[Column]:
    """The m query-to-codebook distance-table CONSTANT expressions —
    per subspace an array of k decimal scalars built with the exact
    decimal-cast op sequence the encode uses (engine-evaluated, so the
    numbers are the engine's, never Python floats), which is what keeps
    the ADC modes bit-identical and SQL-oracle-replayable.

    Built as ONE parsed SQL expression per subspace rather than nested
    Column objects: the Column form cost ~40 driver-side (py4j) calls
    per table entry — the dominant per-build constant — for an
    identical expression tree."""
    tables = []
    start = 0
    for j, cb in enumerate(codebooks):
        qj = [float(x) for x in query[start : start + dims[j]]]
        start += dims[j]
        qarr = "array(" + ", ".join(_sql_double(x) for x in qj) + ")"
        ents = []
        for idx, cvec in sorted(cb):
            carr = (
                "array(" + ", ".join(_sql_double(x) for x in cvec) + ")"
            )
            ents.append(
                f"aggregate(zip_with({qarr}, {carr}, "
                "(x, y) -> CAST((x - y) * (x - y) AS DECIMAL(38,18))), "
                "CAST(0 AS DECIMAL(38,18)), "
                "(a, x) -> CAST(a + x AS DECIMAL(38,18)))"
            )
        tables.append(F.expr("array(" + ", ".join(ents) + ")"))
    return tables


# auto mode switches to the broadcast table above this many table
# entries (m·k); beyond it the literal plan carries thousands of
# constants through codegen for zero benefit
_ADC_LITERAL_BUDGET = 256


def pq_adc_topk(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    query: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table_mode: str = "auto",
) -> DataFrame:
    """Asymmetric-distance top-k: approximate nearest neighbours of
    ``query`` using ONLY the PQ codes — per subspace a k-entry
    query-to-codebook distance table is precomputed driver-side
    (m·k decimal scalars), and each row's approximate distance is m
    table lookups summed exactly.  Returns (id, approx_dist2) the k
    closest, ties on id.

    This is the PQ search path: at 100 TB the scan reads the compact
    codes table; the per-row work is O(m) element_at lookups into
    literal arrays — no floats from the corpus are touched.  Here the
    encode is inlined (fixture stores raw vectors); a deployment would
    persist :func:`pq_encode`'s output and scan that instead.

    The distance tables are CONSTANT expressions built from query and
    codebook literals with the exact decimal-cast op sequence the
    encode uses — Catalyst constant-folds them with its own cast
    semantics, so the numbers are the engine's, not Python's, and a SQL
    oracle using the same literal arithmetic replays them bit-for-bit.

    ``table_mode`` picks how the tables reach the scan:

    - ``"literal"`` — inlined constant arrays: O(m·k·d/m) plan
      literals.  Right for fixture-sized codebooks (m·k ≤ ~256).
    - ``"broadcast"`` — the SAME constant expressions are evaluated
      once on a 1-row job, collected as exact decimals (m·k scalars of
      driver state), and re-attached as one broadcast row of
      ``array<array<decimal>>``; per-row work stays m element_at
      lookups but the scan plan is O(1) regardless of k.  Bit-identical
      to literal mode by construction (decimals round-trip exactly).
      The production shape at k=256/m=16, where the literal plan would
      carry 4096 table constants.
    - ``"auto"`` (default) — broadcast above ``m·k > 256``.
    """
    dims = _check_codebooks(codebooks)
    if sum(dims) != len(query):
        raise ValueError("query dim != codebook total dim")
    if table_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown table_mode {table_mode!r}")
    for j, cb in enumerate(codebooks):
        if sorted(i for i, _ in cb) != list(range(len(cb))):
            # the element_at(table, code+1) lookup positions entries by
            # index — a gap would silently look up the wrong centroid
            raise ValueError(f"codebook {j} indices must be exactly 0..k-1")
    n_entries = sum(len(cb) for cb in codebooks)
    if table_mode == "auto":
        table_mode = "literal" if n_entries <= _ADC_LITERAL_BUDGET else "broadcast"
    enc = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)
    table_exprs = _adc_table_exprs(codebooks, query, dims)
    # evaluate the constant table expressions ENGINE-side exactly once
    # on a 1-row job (so the numbers are the engine's decimal-cast
    # sequence, never Python floats) — BOTH modes then attach the
    # resulting m·k exact decimals.  Embedding the unfolded aggregate
    # expressions per mode was a double cost: ~1.3k driver-side column
    # constructions per build (the dominant per-rep constant at bench
    # scale) and a per-row re-evaluation hazard, for identical values.
    spark = df.sparkSession
    row = spark.range(1).select(
        *[table_exprs[j].alias(f"__t{j}") for j in range(len(table_exprs))]
    ).first()
    tabs = [[d for d in row[f"__t{j}"]] for j in range(len(table_exprs))]
    if table_mode == "literal":
        # inlined constant arrays of PLAIN decimal literals — the
        # lookup values are bit-identical to broadcast mode because
        # both come from the same 1-row evaluation above
        table_lits = [
            F.array(*[F.lit(x).cast("decimal(38,18)") for x in tab])
            for tab in tabs
        ]
        approx = F.element_at(table_lits[0], F.col("codes")[0] + 1)
        for j in range(1, len(table_lits)):
            approx = (
                approx + F.element_at(table_lits[j], F.col("codes")[j] + 1)
            ).cast("decimal(38,18)")
    else:
        tabs_df = spark.createDataFrame(
            [(tabs,)], "__tabs: array<array<decimal(38,18)>>"
        )
        enc = enc.crossJoin(F.broadcast(tabs_df))
        approx = F.element_at(
            F.element_at(F.col("__tabs"), 1), F.col("codes")[0] + 1
        )
        for j in range(1, len(table_exprs)):
            approx = (
                approx
                + F.element_at(
                    F.element_at(F.col("__tabs"), j + 1), F.col("codes")[j] + 1
                )
            ).cast("decimal(38,18)")
    return (
        enc.select(F.col(id_col), F.round(approx.cast("double"), 6).alias("approx_dist2"))
        .orderBy("approx_dist2", id_col)
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    coarse_centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    query: list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table_mode: str = "auto",
) -> DataFrame:
    """IVFADC search (Jégou et al. 2011 §IV) — the composition the two
    halves exist for: a coarse inverted-file probe (`kmeans_assign`
    cells) narrows the corpus to ``n_probe`` cells, then
    :func:`pq_adc_topk` scores ONLY those candidates from their codes.
    Returns (id, approx_dist2), the k closest by asymmetric distance.

    The probe list is computed ENGINE-side (one 1-row job over the
    query literal with the same decimal-argmin arithmetic the corpus
    assignment uses), not in Python floats — so a SQL oracle replaying
    the identical expressions derives the identical cells, and the
    whole search chain stays bit-replayable.

    Scale shape: cell assignment is a shuffle-free projection (persist
    it in a deployment — it's the inverted file); the probe filter is a
    left-semi join on the bounded probed-cell id set; ADC then touches
    codes only.  Total per-query work ≈ |corpus|·n_probe/n_cells code
    lookups — the IVF recall/cost dial."""
    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    dim = _check_centroid_dims(coarse_centroids)
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != coarse centroid dim {dim}")
    spark = df.sparkSession

    qarr = F.array(*[F.lit(float(x)) for x in query])
    cands = []
    for idx, cvec in coarse_centroids:
        carr = F.array(*[F.lit(float(x)) for x in cvec])
        diff2 = F.zip_with(
            qarr, carr, lambda x, y: ((x - y) * (x - y)).cast("decimal(38,18)")
        )
        d2 = F.aggregate(
            diff2,
            F.lit(0).cast("decimal(38,18)"),
            lambda a, x: (a + x).cast("decimal(38,18)"),
        )
        cands.append(F.struct(d2.alias("d"), F.lit(int(idx)).alias("i")))
    probe_expr = F.transform(
        F.slice(F.array_sort(F.array(*cands)), 1, n_probe), lambda s: s["i"]
    )
    probes = [int(x) for x in spark.range(1).select(probe_expr.alias("p")).first()["p"]]

    asg = kmeans_assign(df, coarse_centroids, id_col=id_col, vec_col=vec_col)
    cand_rows = df.join(
        asg.filter(F.col("cluster").isin(probes)).select(id_col), id_col, "left_semi"
    )
    return pq_adc_topk(
        cand_rows, codebooks, query, k=k, id_col=id_col, vec_col=vec_col,
        table_mode=table_mode,
    )


def matryoshka_recall(
    df: DataFrame,
    query: list[float],
    *,
    k: int = 10,
    prefix_dims: tuple[int, ...] = (8, 16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation QA (Kusupati et al. 2022): for each
    prefix dimensionality, how much of the FULL-dimension exact top-k
    does a truncated-embedding search recover → (prefix_dim, n_overlap,
    recall).  The measurement that decides how far MRL embeddings can
    be truncated before retrieval quality pays.

    Each per-dim search is :func:`kmeans_assign`'s decimal-argmin
    discipline over the sliced vectors (exact, engine-replayable
    distances; (distance, id) ordering), cut with TakeOrdered(k).
    Driver state: the (#prefixes+1)·k candidate ids — the bounded
    k-row pattern; the corpus is scanned once per dim, shuffle-free
    except the top-k reduction."""
    dim = len(query)
    for d in prefix_dims:
        if not 0 < d <= dim:
            raise ValueError(f"prefix dim {d} outside (0, {dim}]")

    def topk_ids(d: int) -> list[int]:
        qarr = F.array(*[F.lit(float(x)) for x in query[:d]])
        diff2 = F.zip_with(
            F.slice(F.col(vec_col), 1, d),
            qarr,
            lambda x, y: ((x.cast("double") - y) * (x.cast("double") - y)).cast(
                "decimal(38,18)"
            ),
        )
        dist = F.aggregate(
            diff2,
            F.lit(0).cast("decimal(38,18)"),
            lambda a, x: (a + x).cast("decimal(38,18)"),
        )
        rows = (
            df.select(F.col(id_col).alias("__id"), dist.alias("__d"))
            .orderBy("__d", "__id")
            .limit(k)
            .collect()
        )
        return [int(r["__id"]) for r in rows]

    full = set(topk_ids(dim))
    out = []
    for d in prefix_dims:
        got = set(topk_ids(d))
        n_overlap = len(full & got)
        out.append((int(d), n_overlap, round(n_overlap / k, 6)))
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "prefix_dim long, n_overlap long, recall double"
    )


def binary_quantize(
    df: DataFrame,
    *,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Binary SIGN quantization: each float packs to one bit
    (component > 0), 32 bits per LONG word → (id, words array<long>
    of length ⌈dim/32⌉).  32× smaller than float32 — the compression
    tier below int8 (:func:`quantize_int8_stats`) and PQ codes; at
    100 TB the packed corpus is what fits in memory, and Hamming
    distance over the words (XOR + POPCOUNT, pure JVM integer ops)
    is the fastest distance any index can evaluate.

    Bits are little-endian within each word (component 32w+i → bit i
    of word w); sign ties at exactly 0.0 quantize to 0 on every
    engine (strict >)."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    n_words = (dim + 31) // 32
    words = []
    for w in range(n_words):
        width = min(32, dim - 32 * w)
        words.append(
            f"aggregate(zip_with(slice({vec_col}, {32 * w + 1}, {width}),"
            f" sequence(0, {width - 1}),"
            " (v, i) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), i),"
            " CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a + b)"
        )
    return df.select(
        F.col(id_col),
        F.array(*[F.expr(e) for e in words]).alias("words"),
    )


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact Hamming top-k over sign-quantized vectors → (query_id,
    neighbor_id, hamming, rank): both sides pack via
    :func:`binary_quantize`, the tiny packed query set BROADCASTS, the
    distance is Σ_w popcount(corpus_word XOR query_word) — integer-only
    whole-stage-codegen arithmetic, no floats anywhere, so ranks are
    deterministic (ties break neighbor id ASC) and the plan is one
    shuffle-free scoring map + a per-query window over k·|queries|
    candidates.

    ``exclude_self`` drops corpus rows whose id equals the query id —
    meaningful ONLY when queries are drawn from the corpus (the
    s18/s19 shape).  When the two id spaces are unrelated, pass
    ``exclude_self=False``: an accidental id collision would otherwise
    silently drop a legitimate neighbor."""
    from pyspark.sql import Window

    cw = binary_quantize(corpus, dim=dim, vec_col=vec_col, id_col=id_col)
    qw = binary_quantize(
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.col(query_vec_col).alias(vec_col),
        ),
        dim=dim,
        vec_col=vec_col,
        id_col="__qid",
    ).withColumnRenamed("words", "__qwords")
    scored = cw.crossJoin(F.broadcast(qw))
    if exclude_self:
        scored = scored.filter(F.col(id_col) != F.col("__qid"))
    ham = F.expr(
        "aggregate(zip_with(words, __qwords, (x, y) -> bit_count(x ^ y)),"
        " 0, (a, b) -> a + b)"
    )
    w = Window.partitionBy("__qid").orderBy("__ham", F.col(id_col).asc())
    return (
        scored.withColumn("__ham", ham)
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.col("__ham").cast("int").alias("hamming"),
            F.col("__rank").alias("rank"),
        )
    )


def hamming_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """TWO-STAGE retrieval: binary Hamming prefilter to ``m``
    candidates per query (:func:`hamming_topk` — XOR+POPCOUNT over the
    32×-compressed sign bits), then EXACT cosine re-ranking of only
    those candidates to the final top-``k`` → (query_id, neighbor_id,
    hamming, cosine_sim, rank).

    This is the production retrieval shape at 100 TB: stage 1 touches
    only packed words (the corpus that fits in memory) with integer
    arithmetic; stage 2 fetches float vectors for m·|queries| rows —
    a candidate-sized JOIN back to the corpus, not a corpus scan.
    Against brute force the float work drops from |corpus|·|queries|
    dot products to m·|queries|.  Both stages are deterministic
    ((distance, id) ties), so the pipeline replays exactly in SQL —
    recall vs exact cosine is measurable but APPROXIMATE by design
    (a true neighbor whose sign pattern is distant can miss stage 1)."""
    from duckdb_graphar_spark.operators.similarity import dot, norm
    from pyspark.sql import Window

    if k < 1 or m < k:
        raise ValueError("need m >= k >= 1")
    cand = hamming_topk(
        corpus,
        queries,
        k=m,
        dim=dim,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        exclude_self=exclude_self,
    ).select("query_id", "neighbor_id", "hamming")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    denom = F.col("__cn") * F.col("__qn")
    sim = F.when(
        denom > 0, dot(F.col("__cv"), F.col("__qv")) / denom
    ).otherwise(F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(sim, 6).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sq8_codes(
    vec: Column, los: list[float], his: list[float]
) -> Column:
    """Per-DIMENSION uint8 scalar quantization (asymmetric min/max
    scheme — the per-VECTOR absmax twin is :func:`quantize_int8_stats`):
    ``code_i = clamp(floor((x_i - lo_i) * 255 / (hi_i - lo_i)), 0, 255)``,
    constant dimensions (hi == lo) code to 0.

    Exactness: min/max of floats are exact, and the code is one IEEE
    multiply-then-divide + floor on doubles — the same op sequence in
    any engine, so codes replay bit-identically in SQL with no
    rounding step anywhere."""
    lo_arr = F.array(*[F.lit(float(v)).cast("double") for v in los])
    hi_arr = F.array(*[F.lit(float(v)).cast("double") for v in his])
    zipped = F.arrays_zip(
        _as_double(vec).alias("x"), lo_arr.alias("lo"), hi_arr.alias("hi")
    )
    return F.transform(
        zipped,
        lambda e: F.when(
            e["hi"] > e["lo"],
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.floor((e["x"] - e["lo"]) * F.lit(255.0) / (e["hi"] - e["lo"])),
                ),
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("long"),
    )


def sq8_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    m: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """TWO-STAGE retrieval over SCALAR-QUANTIZED vectors: per-dimension
    uint8 codes (4× smaller than float32, 8× than float64), an
    INTEGER dot-product scan to ``m`` candidates per query, then exact
    cosine re-ranking to the final top-``k`` →
    (query_id, neighbor_id, sq_score, cosine_sim, rank).

    The per-dimension min/max stats are one map-combinable aggregate
    (``dim`` rows collected — bounded like a centroid collect) baked
    into the plan as literal arrays; stage 1 is then a pure
    integer-arithmetic broadcast scan (codes ≤ 255, a 64-dim score
    ≤ 64·255² < 2³¹ — no overflow in long), and stage 2 fetches float
    vectors for only m·|queries| candidate rows.  This is the
    IVF-free SQ baseline every vector store ships (FAISS SQ8,
    pgvector halfvec-style): at 100 TB the code table is what scans,
    the float table is what a candidate-sized join touches.
    Deterministic ((score, id) ties both stages) — replays exactly in
    SQL; recall vs exact cosine is approximate BY DESIGN (quantization
    can reorder near-ties across the stage-1 cut)."""
    from duckdb_graphar_spark.operators.similarity import dot, norm

    if k < 1 or m < k:
        raise ValueError("need m >= k >= 1")
    stats = (
        corpus.select(F.posexplode(_as_double(F.col(vec_col))).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )
    if len(stats) != dim:
        raise ValueError(f"corpus dimension {len(stats)} != declared {dim}")
    by_i = {r["i"]: (r["lo"], r["hi"]) for r in stats}
    los = [by_i[i][0] for i in range(dim)]
    his = [by_i[i][1] for i in range(dim)]

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        sq8_codes(F.col(vec_col), los, his).alias("__cc"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qv"),
        sq8_codes(F.col(query_vec_col), los, his).alias("__qc"),
    )
    pair = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pair = pair.filter(F.col("neighbor_id") != F.col("query_id"))
    score = F.aggregate(
        F.zip_with(F.col("__qc"), F.col("__cc"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("sq_score").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        pair.withColumn("sq_score", score)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= m)
    )
    denom = norm(F.col("__cv")) * norm(F.col("__qv"))
    sim = F.when(
        denom > 0, dot(F.col("__cv"), F.col("__qv")) / denom
    ).otherwise(F.lit(0.0))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            "sq_score",
            F.round(sim, 6).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def gram_matrix(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    upper_only: bool = True,
) -> DataFrame:
    """EXACT Gram matrix G[i,j] = Σ_rows x_i·x_j over an embedding
    column → (i, j, value) — the d×d statistic PCA/whitening/ZCA and
    covariance-based outlier screens are built from, and the classic
    "reduce a 100 TB matrix to a d² summary" shape: each partition
    folds its rows into d² per-partition partial sums (map-side
    combine), the shuffle carries only (i, j) keyed partials, and the
    driver never sees more than d² rows.

    Implementation is a double posexplode (n·d² product rows feeding a
    hash aggregate — pure JVM codegen, combinable); each product is one
    IEEE double multiply of float-to-double-cast inputs, accumulated as
    DECIMAL(38,18) so the sum is exact and aggregation-order-
    independent (the q01 discipline), then rounded to 9 at the end.
    ``upper_only`` emits i ≤ j (G is symmetric).  Ragged rows
    contribute only their own dims (posexplode is per-row) — callers
    wanting strict rectangularity should validate d upstream."""
    # both explodes happen in one pass: the outer posexplode yields
    # (i, x_i) and keeps the row's own vector alongside, the inner one
    # expands transform's per-i product array — no self-join
    prods = df.select(
        F.posexplode(_as_double(F.col(vec_col))).alias("i", "__xi"),
        _as_double(F.col(vec_col)).alias("__v"),
    ).select(
        "i",
        F.posexplode(
            F.transform(F.col("__v"), lambda xj: F.col("__xi") * xj)
        ).alias("j", "__p"),
    )
    if upper_only:
        prods = prods.filter(F.col("i") <= F.col("j"))
    return (
        prods.groupBy("i", "j")
        .agg(
            F.round(
                F.sum(F.col("__p").cast("decimal(38,18)")).cast("double"), 9
            ).alias("value")
        )
    )


def random_projection(
    df: DataFrame,
    *,
    dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss RANDOM PROJECTION with a deterministic
    Rademacher (±1) matrix → (id, r, y): output component r is
    Σ_j s(r,j)·x_j / √out_dim, the cheap dimensionality reduction run
    before ANN indexing / clustering at scale (Achlioptas 2003: ±1
    entries preserve pairwise distances with the same JL guarantee as
    Gaussian matrices, and the projection is integer-weight exact).

    The matrix is CONTENT-ADDRESSED, not sampled: s(r,j) = +1 iff
    ((r·2654435761 + j·40503 + 7) mod 97) is even — replayable as the
    same integer arithmetic in SQL (the t36/s16 determinism
    discipline), and embedded as ±1 LITERAL arrays (out_dim × dim
    known driver-side, the kmeans_assign plan shape).  Per-component
    products accumulate as DECIMAL(38,18) so sums are aggregation-
    order-independent; ``out_dim`` must be a perfect square so
    1/√out_dim is an exact power-of-two-free rational the oracle can
    write literally (default 16 → ÷4).

    Scale shape: pure map, no shuffle, no Python — O(out_dim·dim) work
    per row against broadcast-free literals."""
    if dim < 1 or out_dim < 1:
        raise ValueError("dim and out_dim must be >= 1")
    root = int(out_dim**0.5)
    if root * root != out_dim:
        raise ValueError(
            "out_dim must be a perfect square (exact 1/sqrt scaling)"
        )
    comps = []
    for r in range(out_dim):
        signs = F.array(
            *[
                F.lit(
                    1 if ((r * 2654435761 + j * 40503 + 7) % 97) % 2 == 0 else -1
                )
                for j in range(dim)
            ]
        )
        acc = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                signs,
                lambda x, s: (x.cast("double") * s).cast("decimal(38,18)"),
            ),
            F.lit(0).cast("decimal(38,18)"),
            lambda a, x: (a + x).cast("decimal(38,18)"),
        )
        comps.append(F.round(acc.cast("double") / F.lit(float(root)), 6))
    return df.select(
        F.col(id_col), F.posexplode(F.array(*comps)).alias("r", "y")
    )
