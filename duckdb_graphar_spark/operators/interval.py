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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_size: int,
    on: tuple[str, str] | None = None,
) -> DataFrame:
    """Interval×interval OVERLAP join (closed intervals:
    ``l.start <= r.end AND r.start <= l.end``), bucket-decomposed like
    :func:`interval_join` so it plans as a shuffled EQUI-join instead of
    the nested loop Spark gives the raw pair of inequalities.

    Both sides explode to their covered buckets, but a pair of
    overlapping intervals shares SEVERAL buckets — instead of a
    corpus-sized ``distinct``, each qualifying pair is emitted in exactly
    ONE canonical bucket: the bucket of ``greatest(l.start, r.start)``
    (the overlap's first instant, guaranteed to lie in both intervals'
    bucket ranges).  No dedup pass, one shuffle.

    ``on`` optionally adds an equality key (left_col, right_col) — the
    realistic 100 TB shape (overlaps per user/session); without it the
    result itself is quadratic in overlapping density, which no plan
    fixes.  Key columns join the shuffle key, so buckets only co-locate
    rows of the same entity.
    """
    if bucket_size <= 0:
        raise ValueError("bucket_size must be positive")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column name collision between sides: {sorted(overlap)}")

    def bucket(c) -> F.Column:
        return F.floor(c.cast("long") / F.lit(bucket_size)).cast("long")

    l = left.withColumn(
        "__lb", F.explode(F.sequence(bucket(F.col(left_start)), bucket(F.col(left_end))))
    )
    r = right.withColumn(
        "__rb",
        F.explode(F.sequence(bucket(F.col(right_start)), bucket(F.col(right_end)))),
    )
    cond = (
        (F.col("__lb") == F.col("__rb"))
        & (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        # canonical bucket: emit the pair only where the overlap starts
        & (F.col("__lb") == bucket(F.greatest(F.col(left_start), F.col(right_start))))
    )
    if on is not None:
        cond = cond & (F.col(on[0]) == F.col(on[1]))
    return l.join(r, cond).drop("__lb", "__rb")
