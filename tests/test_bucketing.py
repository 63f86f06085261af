"""Bucketed layouts: the join-without-shuffle contract and result parity."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark import bucketing as B
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    B.write_bucketed(o, "bkt_orders", "o_custkey", n_buckets=8)
    B.write_bucketed(c, "bkt_customer", "o_custkey", n_buckets=8)
    yield "bkt_orders", "bkt_customer"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Both sides bucketed by the join key: the pre-paid write-time
    shuffle must eliminate every read-time exchange."""
    to, tc = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = B.bucketed(spark, to).join(B.bucketed(spark, tc), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    """groupBy on the bucket key reuses the storage partitioning."""
    to, _ = bucketed_pair
    df = B.bucketed(spark, to).groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain(spark, bucketed_pair):
    to, tc = bucketed_pair
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    c = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet")).withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = sorted(
        tuple(r)
        for r in o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment").collect()
    )
    bkt = sorted(
        tuple(r)
        for r in B.bucketed(spark, to)
        .join(B.bucketed(spark, tc), "o_custkey")
        .select("o_orderkey", "c_mktsegment")
        .collect()
    )
    assert bkt == plain
