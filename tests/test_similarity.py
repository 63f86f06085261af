"""Similarity-search tests against numpy exact ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_graphar_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _np_topk(vecs, ids, qv, qid, k):
    sims = vecs @ qv / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(qv))
    mask = ids != qid
    order = np.lexsort((ids[mask], -np.round(sims[mask], 6)))
    return [(int(ids[mask][i]), round(float(sims[mask][i]), 6)) for i in order[:k]]


def test_brute_force_topk_exact(spark, emb):
    pdf = emb.toPandas()
    vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].values
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.brute_force_topk(emb, queries, k=5)
    got = {
        qid: [(r.neighbor_id, r.cosine_sim) for r in rows]
        for qid, rows in _group(out.orderBy("query_id", "rank").collect())
    }
    for qid in range(3):
        exp = _np_topk(vecs, ids, vecs[ids == qid][0], qid, 5)
        assert got[qid] == exp, qid


def _group(rows):
    from itertools import groupby

    return [(k, list(g)) for k, g in groupby(rows, key=lambda r: r.query_id)]


def test_lsh_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = S.brute_force_topk(emb, queries, k=10)
    approx = S.lsh_topk(emb, queries, k=10, n_planes=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, recall  # 4 planes → 16 buckets over small corpus


def test_ivf_topk_runs(spark, emb):
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.ivf_topk(emb, queries, k=5, n_probe=4, n_cells=8)
    rows = out.collect()
    assert len(rows) > 0
    assert {r.query_id for r in rows} <= {0, 1}


def test_rrf_fuse_hand_checked(spark):
    from duckdb_graphar_spark.operators.similarity import rrf_fuse

    r1 = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank long")
    r2 = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank long")
    got = {r.doc_id: (r.rrf_score, r.n_sources, r.rank) for r in rrf_fuse([r1, r2], k=4).collect()}
    import pytest as _pt

    # doc 20: 1/62 + 1/61 is the largest mass; singles follow by rank
    assert got[20][0] == _pt.approx(round(1 / 62 + 1 / 61, 6), abs=1e-6)
    assert got[20][1] == 2 and got[20][2] == 1
    assert got[10] == (_pt.approx(round(1 / 61, 6), abs=1e-6), 1, 2)
    assert got[40][2] == 3  # 1/62 beats 1/63
    assert got[30][2] == 4


def test_mips_augmented_reduction_matches_exact(spark):
    """The Shrivastava-Li norm-augmentation must reproduce the exact
    inner-product ranking: |x_aug| = M for every corpus vector, so
    augmented-cosine order == dot-product order per query."""
    from duckdb_graphar_spark.operators.similarity import mips_topk

    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1 + i % 3, 8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    exact = [tuple(r) for r in mips_topk(df, q, k=5).collect()]
    aug = [tuple(r) for r in mips_topk(df, q, k=5, method="augmented").collect()]
    assert exact == aug
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown method"):
        mips_topk(df, q, method="nope").collect()


def test_mips_differs_from_cosine_when_norms_matter(spark):
    """A long vector loses under cosine but wins under inner product —
    the metric's whole point."""
    from duckdb_graphar_spark.operators.similarity import mips_topk

    rows = [
        (0, [1.0, 0.0]),       # query
        (1, [0.9, 0.1]),       # near-parallel, short
        (2, [10.0, -3.0]),     # long, less aligned
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding AS query_vec")
    got = {r.rank: r.neighbor_id for r in mips_topk(df, q, k=2).collect()}
    assert got == {1: 2, 2: 1}  # inner product ranks the long vector first


def test_retrieval_metrics_hand_checked(spark):
    """recall@k and MRR against a 2-query hand-built pair of result
    sets: q1's approx hits 2 of 3 relevant with first hit at rank 2;
    q2's approx misses entirely; a ground-truth-only query (q3, absent
    from approx) reports 0 honestly."""
    from duckdb_graphar_spark.operators.similarity import retrieval_metrics

    approx = spark.createDataFrame(
        [
            (1, 10, 1), (1, 11, 2), (1, 12, 3),
            (2, 30, 1), (2, 31, 2), (2, 32, 3),
        ],
        "query_id long, neighbor_id long, rank int",
    )
    exact = spark.createDataFrame(
        [
            (1, 11, 1), (1, 12, 2), (1, 99, 3),
            (2, 40, 1), (2, 41, 2), (2, 42, 3),
            (3, 50, 1), (3, 51, 2), (3, 52, 3),
        ],
        "query_id long, neighbor_id long, rank int",
    )
    got = {
        r.query_id: (r.n_hits, r.recall_at_k, r.reciprocal_rank)
        for r in retrieval_metrics(approx, exact, k=3).collect()
    }
    assert got[1] == (2, 2 / 3, 1 / 2)  # hits at ranks 2,3 -> first=2
    assert got[2] == (0, 0.0, 0.0)
    assert got[3] == (0, 0.0, 0.0)


def test_retrieval_metrics_rank_filter_and_guard(spark):
    """Entries beyond k on EITHER side are ignored; k<1 raises."""
    import pytest as _pt

    from duckdb_graphar_spark.operators.similarity import retrieval_metrics

    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 5)], "query_id long, neighbor_id long, rank int"
    )
    exact = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 4)], "query_id long, neighbor_id long, rank int"
    )
    got = retrieval_metrics(approx, exact, k=2).collect()[0]
    # approx@<=2 = {10}; exact@<=2 = {11} -> no hits
    assert (got.n_hits, got.reciprocal_rank) == (0, 0.0)
    with _pt.raises(ValueError, match="k must be"):
        retrieval_metrics(approx, exact, k=0)
