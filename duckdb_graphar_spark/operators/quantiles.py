"""Exact distributed quantiles (percentile_disc) without a global sort.

The naive exact quantile sorts the column on one task (`Window.orderBy`
with no partition) — a non-starter at 100 TB.  `exact_quantiles` gets
the same answer with bounded driver state, the value-domain twin of
`packing.pack_offsets`' two-phase scan:

1. ``groupBy(value).count()`` — the only corpus-sized shuffle, and it's
   map-combinable, so the shuffle carries one row per DISTINCT value
   after partial aggregation (a price column at 100 TB has millions of
   distinct values, not trillions of rows);
2. range-bucket the distinct values (min/max probe + fixed-width
   buckets), per-bucket count sums → ``n_buckets`` rows to the driver,
   turned into exclusive prefix offsets and broadcast back;
3. parallel per-bucket window cumsum gives every distinct value its
   global inclusive rank range; the p-quantile is the minimal value
   whose cumulative count reaches the target rank — a map-side filter
   plus a tiny min aggregate per requested prob.

Target-rank arithmetic matches DuckDB's ``quantile_disc`` exactly:
element at 0-based index floor((n-1)·p) of the sorted multiset, with
(n-1)·p computed in EXACT decimal arithmetic (`fractions.Fraction` on
the driver; DuckDB parses ``0.99`` as DECIMAL, so its product is exact
too — a double multiply could floor the wrong way when the true product
is an integer).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window, functions as F


def _validated(probs: list[float]) -> None:
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"prob {p} outside [0, 1]")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    *,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` → one row per prob:
    (prob, value, target_rank, n).  NULLs are excluded (SQL aggregate
    semantics); ``value`` is the element at sorted 0-based index
    floor((n-1)·p) — DuckDB ``quantile_disc`` / ANSI
    ``percentile_disc`` semantics."""
    _validated(probs)
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism

    # LAZY localCheckpoint (not cache, not eager): the corpus-sized
    # scan+shuffle behind the distinct-value table runs ONCE — the
    # bounds probe is the first action, so it materializes the blocks
    # in the same pass (eager=True paid a dedicated up-front job: the
    # round-8 bench read it as +60% on the sf0.1 floor); the bucket-sum
    # collect and the caller's final action reuse them.  Unlike a
    # never-unpersisted cache, the blocks are released by the
    # ContextCleaner once the returned frame is unreachable.
    vc = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    bounds = vc.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).first()
    empty_schema = "prob double, value double, target_rank long, n long"
    if bounds.lo is None:
        return spark.createDataFrame([], empty_schema)
    lo, hi = float(bounds.lo), float(bounds.hi)
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    b = vc.withColumn(
        "__bucket",
        F.least(
            F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("long"),
    )

    # phase 1: per-bucket count sums — n_buckets rows, map-combinable
    sums = {
        r["__bucket"]: int(r["s"])
        for r in b.groupBy("__bucket").agg(F.sum("__c").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for k in sorted(sums):
        prefix[k] = acc
        acc += sums[k]
    n = acc
    prefix_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in prefix.items()],
            "__bucket long, __pre long",
        )
    )

    # phase 2: parallel within-bucket cumsum → global inclusive rank
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(prefix_df, "__bucket").withColumn(
        "__cum", F.col("__pre") + F.sum("__c").over(w)
    )

    # exact decimal target ranks (matches DuckDB's DECIMAL literal math)
    targets = [
        (float(p), int((n - 1) * Fraction(str(p))) + 1) for p in probs
    ]
    tdf = F.broadcast(
        spark.createDataFrame(targets, "prob double, target_rank long")
    )
    return (
        cum.crossJoin(tdf)
        .filter(F.col("__cum") >= F.col("target_rank"))
        .groupBy("prob")
        .agg(
            F.min("__v").alias("value"),
            # constant within the group (joined on prob) — min is just
            # the determinism-by-construction spelling
            F.min("target_rank").alias("target_rank"),
        )
        .select("prob", "value", "target_rank", F.lit(n).cast("long").alias("n"))
    )


def exact_quantiles_cont(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    *,
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact CONTINUOUS (linearly interpolated) quantiles → one row per
    prob: (prob, value, n) — ANSI ``percentile_cont`` semantics, the
    interpolating sibling of :func:`exact_quantiles`: at 0-based
    position pos = (n−1)·p, value = v⌊pos⌋ + frac·(v⌊pos⌋₊₁ − v⌊pos⌋).

    Same two-phase rank machinery (distinct-value counts → bucketed
    prefix sums → per-bucket cumsum), so no global sort and bounded
    driver state; the two bracketing order statistics per prob are two
    filters over the SAME ranked frame.  Float discipline: pos is an
    exact ``Fraction`` on the driver (DuckDB's DECIMAL literal math),
    ``frac`` converts to double once (correctly rounded on both
    engines), and the interpolation is the same multiply-add either
    engine evaluates — an oracle spelling the identical formula matches
    bit-for-bit, unlike engine-native quantile_cont implementations
    whose internal arithmetic is unspecified."""
    _validated(probs)
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism

    # LAZY localCheckpoint (not cache, not eager): same discipline as
    # exact_quantiles — the bounds probe materializes the blocks in its
    # own pass (no dedicated up-front job), the ContextCleaner releases
    # them when the returned frame is unreachable (a bare .cache() held
    # executor memory for the whole session).
    vc = (
        df.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    bounds = vc.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).first()
    if bounds.lo is None:
        return spark.createDataFrame([], "prob double, value double, n long")
    lo, hi = float(bounds.lo), float(bounds.hi)
    width = (hi - lo) / n_buckets if hi > lo else 1.0
    b = vc.withColumn(
        "__bucket",
        F.least(
            F.floor((F.col("__v") - F.lit(lo)) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("long"),
    )
    sums = {
        r["__bucket"]: int(r["s"])
        for r in b.groupBy("__bucket").agg(F.sum("__c").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for k in sorted(sums):
        prefix[k] = acc
        acc += sums[k]
    n = acc
    prefix_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in prefix.items()],
            "__bucket long, __pre long",
        )
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(prefix_df, "__bucket").withColumn(
        "__cum", F.col("__pre") + F.sum("__c").over(w)
    )

    # per prob: the two bracketing 1-based inclusive ranks + exact frac
    targets = []
    for p in probs:
        pos = (n - 1) * Fraction(str(p))
        lo_rank = int(pos) + 1
        frac = float(pos - int(pos))
        hi_rank = min(lo_rank + 1, n) if frac > 0 else lo_rank
        targets.append((float(p), lo_rank, hi_rank, frac))
    tdf = F.broadcast(
        spark.createDataFrame(
            targets, "prob double, __rlo long, __rhi long, __frac double"
        )
    )
    lo_vals = (
        cum.crossJoin(tdf)
        .filter(F.col("__cum") >= F.col("__rlo"))
        .groupBy("prob")
        .agg(F.min("__v").alias("__vlo"), F.min("__frac").alias("__frac"))
    )
    hi_vals = (
        cum.crossJoin(tdf.select("prob", "__rhi"))
        .filter(F.col("__cum") >= F.col("__rhi"))
        .groupBy("prob")
        .agg(F.min("__v").alias("__vhi"))
    )
    return (
        lo_vals.join(hi_vals, "prob")
        .select(
            "prob",
            (
                F.col("__vlo")
                + F.col("__frac") * (F.col("__vhi") - F.col("__vlo"))
            ).alias("value"),
            F.lit(n).cast("long").alias("n"),
        )
    )


def grouped_quantile_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    prob: float | list[float],
    *,
    n_buckets: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """PER-GROUP exact discrete quantile → one row per group:
    (*group_cols, value, target_rank, n) — :func:`exact_quantiles`
    generalized over a grouping key, with the same percentile_disc
    semantics (element at sorted 0-based index floor((n_g−1)·p) within
    each group).

    ``prob`` may be a LIST of probabilities: all of them share ONE
    machinery pass — one (group, value) count shuffle, one bounds
    collect, one bucket-sum collect, one cumsum — and only the
    broadcast target-rank table fans out (|groups|·|probs| rows).  The
    output then carries a ``prob`` column (one row per group × prob).
    Callers needing several fences on the same data (winsorization's
    p05/p95) should pass them together rather than calling per-prob:
    at 100 TB the value-count shuffle is the cost and it's paid once.

    ``weight_col`` selects the WEIGHTED quantile instead: each row
    counts ``w`` times, i.e. the value at weighted rank
    floor((W_g−1)·p)+1 where W_g is the group's total weight — exactly
    the unweighted semantics on the expanded multiset, without
    expanding it (the per-(group, value) aggregate sums weights
    instead of counting rows; nothing else changes).  Weights must be
    a POSITIVE integral column (exact rank arithmetic): the type is
    checked at plan time, positivity in-plan via raise_error — no
    extra validation job on the clean path.

    The naive plan is ``row_number() OVER (PARTITION BY group ORDER BY
    v)`` — one sorted buffer per group, i.e. a hot group's entire value
    set on one task.  Here each group's rank scan uses the two-phase
    machinery instead: distinct (group, value) counts (map-combinable),
    per-(group, bucket) sums collected to the driver (bounded by
    |groups|·n_buckets — the group key must be LOW-CARDINALITY, the
    dimension-like contract every centroid/bucket collect here shares),
    broadcast prefix offsets, parallel within-(group, bucket) window
    cumsums, one filter per group at its exact decimal target rank.

    NULL values are excluded (SQL aggregate semantics); empty groups
    do not appear.  A NULL GROUP KEY is a real group (PARTITION BY
    semantics, matching the oracle): all stamp joins below are
    null-safe (``eqNullSafe``), so the NULL-key group survives to the
    output instead of silently vanishing at the first equi-join."""
    scalar = not isinstance(prob, (list, tuple))
    probs = [prob] if scalar else list(prob)
    if not probs:
        raise ValueError("prob list must be non-empty")
    if len(set(probs)) != len(probs):
        raise ValueError("prob list must not contain duplicates")
    _validated(probs)
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    gcols = [F.col(c) for c in group_cols]

    if weight_col is None:
        w_expr = F.lit(1).cast("long")
    else:
        from pyspark.sql import types as T

        wfield = {f.name: f.dataType for f in df.schema.fields}.get(weight_col)
        if wfield is None:
            raise ValueError(f"weight_col {weight_col!r} not in schema")
        if not isinstance(
            wfield, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            raise TypeError(
                f"weight_col {weight_col!r} must be an integral type "
                f"(quantize real weights upstream), got {wfield}"
            )
        w_expr = (
            F.when(
                F.col(weight_col) <= 0,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "grouped_quantile_disc: non-positive weight in "
                            f"{weight_col!r}: "
                        ),
                        F.col(weight_col).cast("string"),
                    )
                ),
            )
            .otherwise(F.col(weight_col))
            .cast("long")
        )

    vc = (
        df.select(
            *gcols,
            F.col(value_col).cast("double").alias("__v"),
            w_expr.alias("__w"),
        )
        .filter(F.col("__v").isNotNull())
        .groupBy(*group_cols, "__v")
        .agg(F.sum("__w").alias("__c"))
        .localCheckpoint(eager=False)
    )
    bounds = {
        tuple(r[c] for c in group_cols): (float(r["lo"]), float(r["hi"]))
        for r in vc.groupBy(*group_cols)
        .agg(F.min("__v").alias("lo"), F.max("__v").alias("hi"))
        .collect()
    }
    if not bounds:
        empty_schema = df.select(*gcols).schema
        if not scalar:
            empty_schema = empty_schema.add("prob", "double")
        empty_schema = (
            empty_schema.add("value", "double")
            .add("target_rank", "long")
            .add("n", "long")
        )
        return spark.createDataFrame([], empty_schema)
    bdf = F.broadcast(
        spark.createDataFrame(
            [(*k, lo, (hi - lo) / n_buckets if hi > lo else 1.0) for k, (lo, hi) in bounds.items()],
            df.select(*gcols).schema.add("__lo", "double").add("__w", "double"),
        )
    )
    def _ns_join(left: DataFrame, right: DataFrame, cols: list[str]) -> DataFrame:
        # null-safe equi-join on `cols`, right-side duplicates dropped —
        # a plain name-list join discards NULL keys, erasing the
        # NULL-key group the groupBys above legitimately produced
        cond = None
        for c in cols:
            t = left[c].eqNullSafe(right[c])
            cond = t if cond is None else (cond & t)
        out = left.join(right, cond)
        for c in cols:
            out = out.drop(right[c])
        return out

    b = _ns_join(vc, bdf, group_cols).withColumn(
        "__bucket",
        F.least(
            F.floor((F.col("__v") - F.col("__lo")) / F.col("__w")),
            F.lit(n_buckets - 1),
        ).cast("long"),
    )

    sums: dict[tuple, dict[int, int]] = {}
    for r in (
        b.groupBy(*group_cols, "__bucket").agg(F.sum("__c").alias("s")).collect()
    ):
        k = tuple(r[c] for c in group_cols)
        sums.setdefault(k, {})[r["__bucket"]] = int(r["s"])
    prefix_rows, target_rows = [], []
    for k, per in sums.items():
        acc = 0
        for bk in sorted(per):
            prefix_rows.append((*k, bk, acc))
            acc += per[bk]
        n_g = acc
        for p in probs:
            target_rows.append(
                (*k, float(p), int((n_g - 1) * Fraction(str(p))) + 1, n_g)
            )
    prefix_df = F.broadcast(
        spark.createDataFrame(
            prefix_rows,
            df.select(*gcols).schema.add("__bucket", "long").add("__pre", "long"),
        )
    )
    target_df = F.broadcast(
        spark.createDataFrame(
            target_rows,
            df.select(*gcols)
            .schema.add("prob", "double")
            .add("target_rank", "long")
            .add("n", "long"),
        )
    )

    w = (
        Window.partitionBy(*group_cols, "__bucket")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = _ns_join(b, prefix_df, [*group_cols, "__bucket"]).withColumn(
        "__cum", F.col("__pre") + F.sum("__c").over(w)
    )
    out = (
        _ns_join(cum, target_df, group_cols)
        .filter(F.col("__cum") >= F.col("target_rank"))
        .groupBy(*group_cols, "prob")
        .agg(
            F.min("__v").alias("value"),
            F.min("target_rank").alias("target_rank"),
            F.min("n").alias("n"),
        )
    )
    if scalar:
        return out.drop("prob")
    return out.select(*group_cols, "prob", "value", "target_rank", "n")
