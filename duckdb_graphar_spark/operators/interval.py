"""Bucketized point-in-interval join.

Spark (like most engines) plans a raw ``p BETWEEN s AND e`` join as a
nested-loop over the cross product (BroadcastNestedLoopJoin when one
side is small, else a full cartesian) — O(|P|·|I|), a scale-killer the
moment neither side broadcasts.  The classic fix is bucket
decomposition: pick a bucket width, assign every point to exactly ONE
bucket, expand every interval to the buckets it overlaps, then run a
plain shuffled EQUI-join on the bucket id with the BETWEEN predicate as
a residual filter.  Cost becomes O(|P| + |I|·expansion + matches) with
one hash-partitioned shuffle — the same plan shape DuckDB's IEJoin /
Flink's interval join achieve natively.

Because a point lands in exactly one bucket and that bucket is always
within the expanded set of any interval containing the point, every
qualifying (point, interval) pair meets exactly once: no dedup pass.

Pick ``bucket_size`` near the typical interval length: expansion per
interval is ``len/bucket_size + 1`` rows, while too-large buckets put
unrelated rows in one hash cell.  Skewed buckets (hot time ranges) are
split by AQE skew-join handling like any other equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_size: int,
    closed: str = "both",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (``closed`` picks the boundary semantics:
    "both" | "left" | "right" | "neither").

    The three key columns must be integral (cast dates to epoch days,
    timestamps to epoch seconds, first).  Output = point columns +
    interval columns; names must not collide.
    """
    if bucket_size <= 0:
        raise ValueError("bucket_size must be positive")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column name collision between sides: {sorted(overlap)}")

    def bucket(c: str) -> F.Column:
        # floor division (not long-cast truncation) so negative domains
        # bucket consistently
        return F.floor(F.col(c).cast("long") / F.lit(bucket_size)).cast("long")

    p = points.withColumn("__pb", bucket(point_col))
    i = intervals.withColumn(
        "__ib", F.explode(F.sequence(bucket(start_col), bucket(end_col)))
    )
    lo = F.col(point_col) >= F.col(start_col) if closed in ("both", "left") else F.col(point_col) > F.col(start_col)
    hi = F.col(point_col) <= F.col(end_col) if closed in ("both", "right") else F.col(point_col) < F.col(end_col)
    return (
        p.join(i, (F.col("__pb") == F.col("__ib")) & lo & hi)
        .drop("__pb", "__ib")
    )
