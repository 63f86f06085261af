"""Int8 quantization stats: invariants and edge cases."""

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators.embeddings import quantize_int8_stats


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0, 0.0]),
            (2, [-1.0, 0.5, 127.0]),
            (3, [1e-8, -1e-8]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_invariants(vecs):
    rows = {r.vec_id: r for r in quantize_int8_stats(vecs).collect()}
    assert rows[0].dim == 2 and abs(rows[0].norm - 5.0) < 1e-9
    # reconstruction error bounded by half a quantization step, always
    assert all(r.err_ok for r in rows.values())
    for r in rows.values():
        assert r.max_abs_err <= r.scale / 2 + 1e-9


def test_zero_vector(vecs):
    r = {x.vec_id: x for x in quantize_int8_stats(vecs).collect()}[1]
    assert r.scale == 0.0 and r.max_abs_err == 0.0 and r.norm == 0.0 and r.err_ok


def test_scale_is_absmax_over_127(vecs):
    r = {x.vec_id: x for x in quantize_int8_stats(vecs).collect()}[2]
    assert math.isclose(r.scale, 1.0, rel_tol=1e-9)  # absmax 127 → step 1.0


# --- kmeans assignment: literal vs bulk plan equivalence + dim guards ---


@pytest.fixture(scope="module")
def emb_corpus(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_bulk_assign_matches_literal(emb_corpus):
    from duckdb_graphar_spark.operators.embeddings import (
        kmeans_assign,
        kmeans_assign_bulk,
        seed_centroids,
    )

    cents = seed_centroids(emb_corpus, 12)
    lit = sorted(map(tuple, kmeans_assign(emb_corpus, cents).collect()))
    bulk = sorted(map(tuple, kmeans_assign_bulk(emb_corpus, cents).collect()))
    assert lit == bulk


def test_bulk_assign_plan_is_flat_and_shuffle_free(emb_corpus):
    """The bulk form must not grow the plan with k, and must not shuffle."""
    from duckdb_graphar_spark.operators.embeddings import (
        kmeans_assign_bulk,
        seed_centroids,
    )

    plan = (
        kmeans_assign_bulk(emb_corpus, seed_centroids(emb_corpus, 17))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan  # pure projection + broadcast
    assert len(plan) < 20_000  # literal form with k=17,d=8 would be far larger


def test_ragged_centroids_raise(emb_corpus):
    from duckdb_graphar_spark.operators.embeddings import (
        kmeans_assign,
        kmeans_assign_bulk,
    )

    bad = [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])]
    with pytest.raises(ValueError, match="inconsistent dims"):
        kmeans_assign(emb_corpus, bad)
    with pytest.raises(ValueError, match="inconsistent dims"):
        kmeans_assign_bulk(emb_corpus, bad)


def test_data_vs_centroid_dim_mismatch_raises(spark):
    from duckdb_graphar_spark.operators.embeddings import kmeans_assign_bulk

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="embedding dim"):
        kmeans_assign_bulk(df, [(0, [1.0, 2.0])]).collect()


def test_kmeans_fit_inertia_nonincreasing(emb_corpus):
    from duckdb_graphar_spark.operators.embeddings import kmeans_fit

    final, hist = kmeans_fit(emb_corpus, 5, 3)
    assert len(hist) == 3
    inertias = [h["inertia"] for h in hist]
    assert all(b <= a + 1e-6 for a, b in zip(inertias, inertias[1:]))
    rows = final.collect()
    assert sum(r.n for r in rows) == emb_corpus.count()
    assert all(len(r.centroid) == 8 for r in rows)


def test_kmeans_fit_empty_cluster_keeps_seed(spark):
    from duckdb_graphar_spark.operators.embeddings import kmeans_fit

    # two tight blobs, k=3: the third seed (inside blob B) loses every
    # member to a closer updated centroid by iter 2 but must survive
    df = spark.createDataFrame(
        [(i, [0.0, 0.0] if i % 2 == 0 else [10.0, 10.0]) for i in range(20)]
        + [(100, [10.1, 10.1])],
        "vec_id long, embedding array<float>",
    )
    final, hist = kmeans_fit(df, 3, 2)
    assert hist[-1]["n_clusters"] <= 3  # may collapse; must not crash


def test_matryoshka_recall_full_dim_is_one(spark):
    import numpy as np

    from duckdb_graphar_spark.operators.embeddings import matryoshka_recall

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    out = {
        r.prefix_dim: (r.n_overlap, r.recall)
        for r in matryoshka_recall(df, q, k=5, prefix_dims=(16, 4)).collect()
    }
    assert out[16] == (5, 1.0)  # full-dim prefix == full search
    assert 0 <= out[4][0] <= 5

    # numpy cross-check of the 4-dim prefix search
    d4 = ((vecs[:, :4].astype(np.float32).astype(np.float64)
           - np.array(q[:4])) ** 2).sum(axis=1)
    top4 = set(np.lexsort((np.arange(40), d4))[:5])
    dfull = ((vecs.astype(np.float32).astype(np.float64) - np.array(q)) ** 2).sum(axis=1)
    topf = set(np.lexsort((np.arange(40), dfull))[:5])
    assert out[4][0] == len(top4 & topf)


def test_matryoshka_recall_rejects_bad_dim(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.embeddings import matryoshka_recall

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with _pt.raises(ValueError, match="prefix dim"):
        matryoshka_recall(df, [1.0, 2.0], prefix_dims=(4,))


def test_semdedup_max_cluster_size_splits_and_keeps_exact_dups(spark):
    """The capped variant (projection-slice split): (1) default None is
    unchanged; (2) capped output is a subset of the uncapped output;
    (3) exact duplicates share a projection value, so they sit adjacent
    in the (proj, id) slice order and co-locate unless a cut lands
    between them — in this fixture (12 members, cap 4, cuts at ranks
    4|5 and 8|9, dup pairs at ranks 1-2/3-4/…/11-12) every pair lands
    inside a slice, deterministically.  The general boundary-loss
    approximation is the operator's documented contract."""
    from duckdb_graphar_spark.operators.embeddings import semdedup

    # one coarse cluster around (1,0), 12 members: 6 pairs of exact
    # duplicates spread across the id range, plus slight jitter dims
    rows = []
    for i in range(6):
        v = [1.0, 0.01 * i]
        rows.append((2 * i, v))
        rows.append((2 * i + 1, list(v)))  # exact duplicate
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]

    uncapped = {
        (r.id_keep, r.id_drop)
        for r in semdedup(df, cents, threshold=0.999999).collect()
    }
    capped = {
        (r.id_keep, r.id_drop)
        for r in semdedup(
            df, cents, threshold=0.999999, max_cluster_size=4
        ).collect()
    }
    assert capped <= uncapped
    # every exact-duplicate pair survives the split
    for i in range(6):
        assert (2 * i, 2 * i + 1) in capped
    with __import__("pytest").raises(ValueError, match="max_cluster_size"):
        semdedup(df, cents, max_cluster_size=0)


def test_binary_quantize_packing_and_hamming(spark):
    """Known bit patterns: component 32w+i sets bit i of word w
    (little-endian); strict > 0 so zeros quantize to 0; Hamming over a
    hand-checkable pair; odd dims pack into a short final word."""
    from duckdb_graphar_spark.operators.embeddings import (
        binary_quantize,
        hamming_topk,
    )

    v1 = [1.0] + [0.0] * 63              # bit 0 of word 0
    v2 = [0.0] * 33 + [5.0] + [0.0] * 30  # bit 1 of word 1
    v3 = [-1.0] * 64                      # all zero words
    df = spark.createDataFrame(
        [(1, v1), (2, v2), (3, v3)], "vec_id long, embedding array<float>"
    )
    w = {r.vec_id: r.words for r in binary_quantize(df, dim=64).collect()}
    assert w[1] == [1, 0] and w[2] == [0, 2] and w[3] == [0, 0]

    q = spark.createDataFrame(
        [(1, v1)], "query_id long, query_vec array<float>"
    )
    got = {
        r.neighbor_id: (r.hamming, r.rank)
        for r in hamming_topk(df, q, k=5, dim=64).collect()
    }
    # v1 vs v3: 1 bit differs; v1 vs v2: 2 bits differ; self excluded
    assert got[3] == (1, 1) and got[2] == (2, 2) and 1 not in got

    short = spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert binary_quantize(short, dim=3).collect()[0].words == [5]


def test_hamming_rerank_candidate_bound_and_recall(spark):
    """Stage-2 output must be a subset of stage-1's m candidates; with
    m = corpus size the pipeline equals brute-force cosine exactly;
    m < k raises."""
    import numpy as np

    from duckdb_graphar_spark.operators.embeddings import (
        hamming_rerank_topk,
        hamming_topk,
    )
    from duckdb_graphar_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 64)).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame(
        [(0, vecs[0].tolist())], "query_id long, query_vec array<float>"
    )
    cand = {
        r.neighbor_id for r in hamming_topk(df, q, k=10, dim=64).collect()
    }
    got = hamming_rerank_topk(df, q, k=3, m=10, dim=64).collect()
    assert {r.neighbor_id for r in got} <= cand
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2, 3]

    full = hamming_rerank_topk(df, q, k=3, m=29, dim=64).collect()
    brute = brute_force_topk(df, q, k=3).collect()
    assert {(r.neighbor_id, r.cosine_sim) for r in full} == {
        (r.neighbor_id, r.cosine_sim) for r in brute
    }

    try:
        hamming_rerank_topk(df, q, k=5, m=3, dim=64)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_gram_matrix_matches_numpy(spark):
    import numpy as np

    from duckdb_graphar_spark.operators.embeddings import gram_matrix

    rng = np.random.default_rng(7)
    X = rng.normal(size=(20, 5)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {(r.i, r.j): r.value for r in gram_matrix(df).collect()}
    G = X.astype(np.float64).T @ X.astype(np.float64)
    assert set(got) == {(i, j) for i in range(5) for j in range(5) if i <= j}
    for (i, j), v in got.items():
        assert abs(v - G[i, j]) < 1e-6


def test_gram_matrix_full_square(spark):
    from duckdb_graphar_spark.operators.embeddings import gram_matrix

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    got = {(r.i, r.j): r.value for r in gram_matrix(df, upper_only=False).collect()}
    assert got == {(0, 0): 10.0, (0, 1): 14.0, (1, 0): 14.0, (1, 1): 20.0}


def test_sq8_codes_known_values(spark):
    """Hand-checked codes: lo=0, hi=10 per dim -> x=5 codes to
    floor(5*255/10)=127; x=hi codes to 255; constant dim codes to 0."""
    from duckdb_graphar_spark.operators.embeddings import sq8_codes

    df = spark.createDataFrame(
        [([0.0, 5.0, 3.0],), ([10.0, 0.0, 3.0],)], "v array<float>"
    )
    rows = df.select(
        sq8_codes(F.col("v"), [0.0, 0.0, 3.0], [10.0, 10.0, 3.0]).alias("c")
    ).collect()
    assert rows[0].c == [0, 127, 0]
    assert rows[1].c == [255, 0, 0]


def test_sq8_rerank_exact_on_separable_corpus(spark):
    """On a well-separated corpus the SQ prefilter keeps the true
    neighbors and the rerank returns the exact cosine order."""
    import numpy as np

    from duckdb_graphar_spark.operators.embeddings import sq8_rerank_topk

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 8))
    rows = []
    for i in range(40):
        v = base[i % 4] + rng.normal(scale=0.01, size=8)
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sq8_rerank_topk(corpus, q, k=3, m=10, dim=8).collect()
    assert [r.rank for r in got] == [1, 2, 3]
    # top-3 must be same-cluster ids (i % 4 == 0), none the query itself
    assert all(r.neighbor_id % 4 == 0 and r.neighbor_id != 0 for r in got)
    assert all(r.cosine_sim > 0.99 for r in got)


def test_sq8_rerank_guards(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.embeddings import sq8_rerank_topk

    df = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    q = df.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    with _pt.raises(ValueError, match="m >= k"):
        sq8_rerank_topk(df, q, k=5, m=2, dim=2)
    with _pt.raises(ValueError, match="dimension"):
        sq8_rerank_topk(df, q, k=1, m=1, dim=64)
