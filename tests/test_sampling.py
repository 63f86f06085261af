"""Deterministic sampling: reproducibility across repartitionings, split
completeness, and stratum bounds."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators import sampling as S
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_hash_sample_stable_under_repartition(docs):
    a = sorted(r["doc_id"] for r in S.hash_sample(docs, "text", rate_16ths=4).collect())
    b = sorted(
        r["doc_id"]
        for r in S.hash_sample(docs.repartition(7), "text", rate_16ths=4).collect()
    )
    assert a == b and len(a) > 0


def test_hash_sample_rate_roughly_holds(docs):
    n = docs.count()
    k = S.hash_sample(docs, "text", rate_16ths=4).count()
    assert 0.15 < k / n < 0.35  # ~4/16 = 25%


def test_hash_sample_full_rate_is_identity(docs):
    # 16/16 must return EVERY row (ADVICE r1: the hex-string compare kept
    # only hashes starting with '0')
    assert S.hash_sample(docs, "text", rate_16ths=16).count() == docs.count()


def test_hash_split_partitions_everything(docs):
    out = S.hash_split(docs, "text")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"test", "valid", "train"}
    assert counts["train"] > counts["valid"] > counts["test"] > 0


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        S.hash_split(docs, "text", splits=[("a", 3), ("b", 3)])


def test_stratified_take_bounds_and_determinism(spark, docs):
    lang = docs.withColumn("bucket", F.col("doc_id") % 5)
    take = S.stratified_take(lang, "bucket", n_per_key=7, order_col="text")
    per = take.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 7 for r in per)
    again = S.stratified_take(lang.repartition(9), "bucket", n_per_key=7, order_col="text")
    assert sorted(r["doc_id"] for r in take.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mixture_sample_uniform_budget(spark, docs):
    out = S.mixture_sample(
        docs, domain_col="source", size_col="n_chars", key_col="text", rate_col="rate"
    )
    rows = out.collect()
    assert len(rows) > 0
    # rate is constant per domain, integral, in (0, 4096]
    per = {}
    for r in rows:
        per.setdefault(r.source, set()).add(r.rate)
    assert all(len(v) == 1 for v in per.values())
    assert all(0 < next(iter(v)) <= 4096 for v in per.values())
    # content-addressed: identical row set under any partitioning
    again = S.mixture_sample(
        docs.repartition(11), domain_col="source", size_col="n_chars", key_col="text"
    )
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again.collect())


def test_mixture_sample_thins_oversized_domain(spark):
    rows = [(i, "big", "x%d" % i, 100) for i in range(600)] + [
        (1000 + i, "small", "y%d" % i, 100) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, n_chars long")
    out = S.mixture_sample(
        df, domain_col="source", size_col="n_chars", key_col="text", rate_col="rate"
    )
    got = {r[0]: (r[1], r[2]) for r in
           out.groupBy("source").agg(F.count("*"), F.min("rate")).collect()}
    # small domain under budget -> kept whole (rate 4096); big domain
    # thinned toward the uniform half-share (62000/(2*60000) ~ 0.52)
    assert got["small"] == (20, 4096)
    rate_big = got["big"][1]
    assert rate_big == (620 * 100 * 4096) // (2 * 600 * 100)
    assert 0 < got["big"][0] < 600


def test_mixture_sample_rejects_bad_granularity(docs):
    with pytest.raises(ValueError):
        S.mixture_sample(
            docs, domain_col="source", size_col="n_chars", key_col="text", granularity=100
        )


def test_training_shuffle_is_permutation(spark):
    from duckdb_graphar_spark.operators.sampling import training_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = training_shuffle(df, seed="e0")
    ranks = [r.shuffle_rank for r in out.collect()]
    assert sorted(ranks) == list(range(500))
    # deterministic under repartitioning
    again = training_shuffle(df.repartition(7), seed="e0")
    assert {(r.doc_id, r.shuffle_rank) for r in again.collect()} == {
        (r.doc_id, r.shuffle_rank) for r in out.collect()
    }
    # a different epoch seed produces a different permutation
    other = training_shuffle(df, seed="e1")
    assert {(r.doc_id, r.shuffle_rank) for r in other.collect()} != {
        (r.doc_id, r.shuffle_rank) for r in out.collect()
    }


def test_weighted_sample_favors_heavy_and_is_deterministic(spark):
    from duckdb_graphar_spark.operators.sampling import weighted_sample

    rows = [(i, 1000 if i < 50 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_sample(df, 20).collect()
    assert [r.rank for r in got] == list(range(1, 21))
    # weight 1000 vs 1: the heavy class should dominate the top-20
    heavy = sum(1 for r in got if r.weight == 1000)
    assert heavy >= 15
    # bit-reproducible
    again = weighted_sample(df, 20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # different seed -> different permutation (almost surely)
    other = weighted_sample(df, 20, seed="epoch1").collect()
    assert [r.doc_id for r in other] != [r.doc_id for r in got]


def test_weighted_sample_excludes_nonpositive_and_guards_k(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(0, 0), (1, -5), (2, 10)], "doc_id long, n_chars long"
    )
    got = weighted_sample(df, 10).collect()
    assert [r.doc_id for r in got] == [2]
    with _pt.raises(ValueError, match="k must be"):
        weighted_sample(df, 0)
