"""As-of (point-in-time) join — the canonical timeseries operator Spark
has no built-in for.

Semantics (match DuckDB's `ASOF JOIN`): for each left row, attach the
single right row with the same key and the greatest right-timestamp
``<=`` the left timestamp; left rows with no prior right row are kept
with nulls (left variant) or dropped (inner variant).

Implementation is the UNION + ORDERED CARRY-FORWARD composition, not a
range join:

    tag left/right rows, union them, window over
    (key ORDER BY ts, right-before-left tiebreak) carrying the last
    right payload forward, keep the left rows.

Scale design (100 TB): exactly ONE shuffle (the window partitioning on
the key) regardless of timestamp distribution.  A range join
(`l.ts >= r.ts`) would be a broadcast-nested-loop or an interval
explosion; per-key `applyInPandas` merge-asof would move every byte
through Python.  The union keeps everything JVM-side: Tungsten sort
within partitions + `last(..., ignorenulls)` over a growing frame is
whole-stage-codegen'd.  Skewed keys behave like any window skew (one
key = one partition's sort run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: left enriched with the latest right_cols whose
    ``right_ts <= left_ts`` per ``on`` key.

    ``how``: 'left' keeps unmatched left rows (null payload), 'inner'
    drops them — mirroring DuckDB `ASOF [LEFT] JOIN`.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    lcols = left.columns
    # __side orders right rows BEFORE left rows at equal timestamps so a
    # right row with ts == left ts is visible to that left row (ASOF's
    # `>=` contract)
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
        F.struct(*right_cols).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        carried = carried.filter(F.col("__match").isNotNull())
    out_cols = [F.col(f"__l.{c}").alias(c) for c in lcols] + [
        F.col(f"__match.{c}").alias(c) for c in right_cols
    ]
    return carried.select(*out_cols)
