"""ANALYZE-style table statistics collection.

The reference exposes no statistics (`GetStatistics` returns nullptr,
`src/storage/graphar_table_entry.cpp:26-28` — SURVEY §4); a real
warehouse needs per-column stats to feed cost-based decisions and data
quality gates.  `table_stats` computes them in ONE scan of the table.

Scale notes: multiple exact COUNT(DISTINCT) aggregates in one pass make
Catalyst plan an Expand — the input is replicated (k+1)× through a
single shuffle whose keys are the distinct values, all map-combinable.
That is the standard exact plan; at 100 TB the knob is
``exact_ndv=False``, which switches to `approx_count_distinct` (HLL++,
plain partial aggregation, no Expand) — exactly what Spark's own
`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` runs.  min/max/nulls
are always plain map-combinable aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_stats(
    df: DataFrame, columns: list[str], *, exact_ndv: bool = True
) -> DataFrame:
    """Per-column profile of numeric columns → one row per column:
    (col_name, n_nulls, n_distinct, min_v, max_v).  min/max are cast to
    double (callers profile numeric columns; a string column would want
    a separate path).  ``exact_ndv=False`` swaps exact distinct counts
    for HLL++ estimates — the 100 TB configuration."""
    if not columns:
        raise ValueError("columns must be non-empty")
    ndv = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__nn_{c}"),
            ndv(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in columns
    )
    return row.selectExpr(
        f"stack({len(columns)}, {stack_args}) "
        "as (col_name, n_nulls, n_distinct, min_v, max_v)"
    )


def exact_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
    *,
    scale: int = 100,
) -> DataFrame:
    """Engine-exact Pearson correlation per group → (groups..., n,
    corr): both inputs are fixed-point LONGs per row (ROUND(v·scale) —
    exact for values with ≤ log10(scale) decimals), the five moment
    sums (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact integers/decimals
    (order-independent — the property `corr()` aggregates lack), and
    the final value is ONE double expression over those exact sums.
    Correlation is affine-invariant, so the fixed-point scaling cancels
    exactly; round-6 published.

    Scale shape: a single map-combinable groupBy carrying five numeric
    partials per group — the cheapest possible statistic at 100 TB, and
    bit-reproducible across engines, partitionings, and retries,
    which `corr()`'s streaming float accumulation is not."""
    xs = F.round(F.col(x_col) * scale).cast("long")
    ys = F.round(F.col(y_col) * scale).cast("long")
    g = (
        df.select(*group_cols, xs.alias("__x"), ys.alias("__y"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__x").alias("__sx"),
            F.sum("__y").alias("__sy"),
            F.sum((F.col("__x") * F.col("__y")).cast("decimal(38,0)")).alias("__sxy"),
            F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,0)")).alias("__sxx"),
            F.sum((F.col("__y") * F.col("__y")).cast("decimal(38,0)")).alias("__syy"),
        )
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx, syy = F.col("__sxx").cast("double"), F.col("__syy").cast("double")
    cov = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return g.select(
        *group_cols,
        "n",
        F.round(
            F.when(den > 0, cov / F.sqrt(den)).otherwise(F.lit(None)), 6
        ).alias("corr"),
    )


def _poisson1_cum_hex(max_k: int = 6) -> list[str]:
    """Cumulative Poisson(1) pmf thresholds as 8-hex-digit strings:
    a uniform md5 prefix below threshold k ⇒ weight ≤ k.  Deterministic
    module-level constants, identical in the SQL oracle."""
    import math

    cum, acc, out = 0.0, math.exp(-1.0), []
    fact = 1.0
    for k in range(max_k):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        out.append(format(int(cum * 16**8), "08x"))
    return out


POISSON1_THRESHOLDS = _poisson1_cum_hex()


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    key_cols: list[str],
    *,
    n_replicates: int = 20,
    seed: str = "bs",
    scale: int = 10_000,
    tail_rank: int = 2,
) -> DataFrame:
    """Deterministic Poisson bootstrap confidence interval for the
    per-group mean → (groups..., n, est_mean, ci_lo, ci_hi).

    Classic online-bootstrap construction (Poisson(1) row weights per
    replicate — Chamandy et al., "Estimating Uncertainty for Massive
    Data Streams"), made engine-replayable: replicate b's weight for a
    row is a CASE over the first 8 hex digits of ``md5(seed·b, key)``
    against precomputed Poisson(1) cumulative thresholds — so the
    resample is content-addressed (stable under repartitioning,
    retries, and engines) instead of `rand()`-dependent.  ci_lo/ci_hi
    are the ``tail_rank``-th smallest/largest replicate means.

    Scale shape: ONE map-combinable groupBy computing 2·B+2 numeric
    partials (weighted fixed-point sums — exact integers, so replicate
    means are order-independent); the replicate array, sort, and rank
    picks are row-local on B doubles per group.  The corpus is touched
    once, there is no B× data explosion, and no driver state exists."""
    if n_replicates < 2 * tail_rank:
        raise ValueError("n_replicates too small for tail_rank")
    xs = F.round(F.col(value_col) * scale).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(xs).alias("__sx"),
    ]
    for b in range(n_replicates):
        pre = F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.lit(f"{seed}{b}"),
                    *[F.col(k).cast("string") for k in key_cols],
                )
            ),
            1,
            8,
        )
        w = F.lit(len(POISSON1_THRESHOLDS))
        for k in reversed(range(len(POISSON1_THRESHOLDS))):
            w = F.when(pre < POISSON1_THRESHOLDS[k], F.lit(k)).otherwise(w)
        w = w.cast("long")
        aggs.append(F.sum(w).alias(f"__sw{b}"))
        aggs.append(F.sum((w * xs).cast("decimal(38,0)")).alias(f"__swx{b}"))
    g = df.groupBy(*group_cols).agg(*aggs)
    means = [
        F.when(
            F.col(f"__sw{b}") > 0,
            (F.col(f"__swx{b}").cast("double") / F.col(f"__sw{b}").cast("double"))
            / F.lit(float(scale)),
        )
        for b in range(n_replicates)
    ]
    arr = F.array_sort(F.filter(F.array(*means), lambda x: x.isNotNull()))
    return g.select(
        *group_cols,
        "n",
        F.round(
            (F.col("__sx").cast("double") / F.col("n").cast("double"))
            / F.lit(float(scale)),
            6,
        ).alias("est_mean"),
        F.round(F.element_at(arr, tail_rank), 6).alias("ci_lo"),
        F.round(F.element_at(arr, -tail_rank), 6).alias("ci_hi"),
    )


def value_histogram(
    df: DataFrame,
    *,
    n_bins: int = 20,
    key_col: str = "event_type",
    val_col: str = "value",
) -> DataFrame:
    """EXACT equal-width histogram per key with data-derived bounds
    (the BI/profiling shape `approx_percentile` sketches can't give
    exactly): pass 1 computes per-key min/max (map-combinable), pass 2
    bins every value into ``n_bins`` equal-width buckets over
    [min, max] — bin = min(n_bins-1, floor((v-mn)·n_bins/(mx-mn))),
    degenerate keys (mx == mn) collapse to bin 0.  Empty bins are
    omitted (sparse output).

    Exactness discipline: the bin expression is pure IEEE double
    arithmetic in a FIXED operation order — (v-mn), ×n_bins, ÷(mx-mn),
    floor — so any engine replaying the same order lands every value
    in the same bin, boundary values included.

    Scale shape: two map-combinable aggregates + one broadcast join of
    the k-row extrema table; the data is scanned twice but never
    shuffled by value."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    ext = df.groupBy(key_col).agg(
        F.min(val_col).alias("__mn"), F.max(val_col).alias("__mx")
    )
    j = df.join(F.broadcast(ext), key_col)
    bin_ = (
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    ((F.col(val_col) - F.col("__mn")) * F.lit(n_bins))
                    / (F.col("__mx") - F.col("__mn"))
                ),
            )
        )
        .cast("long")
    )
    return j.groupBy(F.col(key_col), bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
