"""Bucketized interval join: exactness vs a naive BETWEEN join, boundary
semantics, pair uniqueness, and the scale contract (equi-join plan, no
nested loop)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from duckdb_graphar_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, i * 37 % 500) for i in range(400)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(j, j * 53 % 480, j * 53 % 480 + j % 40) for j in range(120)],
        "iid long, s long, e long",
    )
    return points, intervals


def test_matches_naive_between_join(spark, frames):
    points, intervals = frames
    got = interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_size=16
    )
    naive = points.join(
        intervals, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
    )
    key = lambda df: sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())
    pairs = key(got)
    assert pairs == key(naive)
    # each qualifying pair appears exactly once (bucket decomposition
    # must not duplicate across expanded buckets)
    assert len(pairs) == len(set(pairs))
    assert len(pairs) > 100  # non-trivial fixture


@pytest.mark.parametrize(
    "closed,expect",
    [("both", {10, 20}), ("left", {10}), ("right", {20}), ("neither", set())],
)
def test_boundary_semantics(spark, closed, expect):
    points = spark.createDataFrame([(10, 10), (20, 20), (30, 30)], "pid long, p long")
    intervals = spark.createDataFrame([(1, 10, 20)], "iid long, s long, e long")
    got = interval_join(
        points,
        intervals,
        point_col="p",
        start_col="s",
        end_col="e",
        bucket_size=5,
        closed=closed,
    )
    assert {r.p for r in got.collect()} == expect


def test_negative_domain_buckets_floor(spark):
    # truncation-toward-zero would put -1 and 1 in the same bucket and
    # still work, but a point at -12 with bucket 10 must land in bucket
    # -2, matching an interval [-15,-11] expanded to [-2,-2]
    points = spark.createDataFrame([(0, -12)], "pid long, p long")
    intervals = spark.createDataFrame([(1, -15, -11)], "iid long, s long, e long")
    got = interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_size=10
    )
    assert got.count() == 1


def test_column_collision_rejected(spark, frames):
    points, _ = frames
    with pytest.raises(ValueError, match="collision"):
        interval_join(
            points,
            points.withColumnRenamed("pid", "iid"),
            point_col="p",
            start_col="p",
            end_col="p",
            bucket_size=4,
        )
    with pytest.raises(ValueError, match="bucket_size"):
        interval_join(
            points,
            frames[1],
            point_col="p",
            start_col="s",
            end_col="e",
            bucket_size=0,
        )


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    points, intervals = frames
    got = interval_join(
        points, intervals, point_col="p", start_col="s", end_col="e", bucket_size=16
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- interval-overlap join ---


@pytest.fixture(scope="module")
def overlap_frames(spark):
    import random

    rng = random.Random(11)
    mk = lambda n, pref: [
        (f"{pref}{i}", i % 5, rng.randrange(0, 300), rng.randrange(0, 25))
        for i in range(n)
    ]
    a = spark.createDataFrame(
        [(k, key, s, s + d) for k, key, s, d in mk(120, "a")],
        "ak string, akey long, als long, ale long",
    )
    b = spark.createDataFrame(
        [(k, key, s, s + d) for k, key, s, d in mk(150, "b")],
        "bk string, bkey long, brs long, bre long",
    )
    return a, b


def _naive_overlap(a_rows, b_rows, keyed):
    out = set()
    for ar in a_rows:
        for br in b_rows:
            if keyed and ar.akey != br.bkey:
                continue
            if ar.als <= br.bre and br.brs <= ar.ale:
                out.add((ar.ak, br.bk))
    return out


@pytest.mark.parametrize("bucket_size", [1, 7, 64, 1000])
def test_overlap_join_exact_and_unique(spark, overlap_frames, bucket_size):
    from duckdb_graphar_spark.operators.interval import interval_overlap_join

    a, b = overlap_frames
    got = interval_overlap_join(
        a, b, left_start="als", left_end="ale", right_start="brs",
        right_end="bre", bucket_size=bucket_size, on=("akey", "bkey"),
    ).select("ak", "bk").collect()
    pairs = [(r.ak, r.bk) for r in got]
    assert len(pairs) == len(set(pairs))  # canonical bucket => no dups
    assert set(pairs) == _naive_overlap(a.collect(), b.collect(), keyed=True)


def test_overlap_join_unkeyed(spark, overlap_frames):
    from duckdb_graphar_spark.operators.interval import interval_overlap_join

    a, b = overlap_frames
    got = interval_overlap_join(
        a, b, left_start="als", left_end="ale", right_start="brs",
        right_end="bre", bucket_size=16,
    ).select("ak", "bk").collect()
    pairs = [(r.ak, r.bk) for r in got]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_overlap(a.collect(), b.collect(), keyed=False)


def test_overlap_join_plans_equi(spark, overlap_frames):
    from duckdb_graphar_spark.operators.interval import interval_overlap_join

    a, b = overlap_frames
    plan = (
        interval_overlap_join(
            a, b, left_start="als", left_end="ale", right_start="brs",
            right_end="bre", bucket_size=16, on=("akey", "bkey"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
