"""Salting utilities: result parity with unsalted ops + the partitioning
contract (shuffle key includes the salt column)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators import skew as K


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 90% of rows share key 0 — the hot-key shape salting exists for
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 3).alias("val"),
    )


@pytest.fixture(scope="module")
def dim_df(spark):
    return spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("n_"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(spark, skewed_df, dim_df):
    plain = sorted(
        tuple(r) for r in skewed_df.join(dim_df, "k").select("k", "val", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in K.salted_join(skewed_df, dim_df, "k", salt=8)
        .select("k", "val", "name")
        .collect()
    )
    assert salted == plain


def test_salted_left_join_matches_plain(spark, skewed_df, dim_df):
    dim_half = dim_df.filter(F.col("k") % 2 == 0)
    plain = sorted(
        tuple(r)
        for r in skewed_df.join(dim_half, "k", "left").select("k", "val", "name").collect()
    )
    salted = sorted(
        tuple(r)
        for r in K.salted_join(skewed_df, dim_half, "k", how="left", salt=8)
        .select("k", "val", "name")
        .collect()
    )
    assert salted == plain


def test_salted_join_shuffles_on_key_plus_salt(spark, skewed_df, dim_df):
    """The whole point: with a non-broadcastable build side, the exchange
    must hash on (k, __salt) so a hot k spreads over `salt` partitions
    instead of one.  (When the build side broadcasts there is no shuffle
    and salting is moot — forced off here to pin the shuffle shape.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = K.salted_join(skewed_df, dim_df, "k", salt=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert any("__salt" in l and "k#" in l for l in exchanges), exchanges
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_rejects_right_join(skewed_df, dim_df):
    with pytest.raises(ValueError):
        K.salted_join(skewed_df, dim_df, "k", how="right")


def test_salted_collect_list_matches_plain(spark, skewed_df):
    plain = {
        r["k"]: sorted(r["values"])
        for r in skewed_df.groupBy("k")
        .agg(F.collect_list("val").alias("values"))
        .collect()
    }
    salted = {
        r["k"]: list(r["values"])
        for r in K.salted_collect_list(skewed_df, "k", "val", salt=8).collect()
    }
    assert salted == plain
