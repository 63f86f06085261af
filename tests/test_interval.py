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
