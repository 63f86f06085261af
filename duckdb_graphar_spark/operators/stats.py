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
