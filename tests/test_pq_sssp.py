"""Unit tests for product quantization and weighted SSSP — reference
implementations are independent numpy/pure-Python reconstructions, not
the operators' own code paths."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _emb_df(spark, n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype(np.float64),
    )


def _books(df, m, d_sub, k=4):
    from duckdb_graphar_spark.operators.embeddings import seed_centroids

    seeds = seed_centroids(df, k)
    return [
        [(i, v[j * d_sub : (j + 1) * d_sub]) for i, v in seeds] for j in range(m)
    ]


def test_pq_encode_matches_numpy(spark):
    from duckdb_graphar_spark.operators.embeddings import pq_encode

    df, vecs = _emb_df(spark)
    m, d_sub = 2, 4
    books = _books(df, m, d_sub)
    got = {
        r["vec_id"]: (list(r["codes"]), r["recon_dist2"])
        for r in pq_encode(df, books).collect()
    }
    cents = [np.array([c for _, c in cb], dtype=np.float64) for cb in books]
    for i, v in enumerate(vecs):
        codes, recon = [], 0.0
        for j in range(m):
            sl = v[j * d_sub : (j + 1) * d_sub]
            d2 = ((cents[j] - sl) ** 2).sum(axis=1)
            codes.append(int(d2.argmin()))
            recon += float(d2.min())
        assert got[i][0] == codes, f"vec {i} codes"
        assert got[i][1] == pytest.approx(recon, abs=2e-6), f"vec {i} recon"


def test_pq_encode_short_vector_raises(spark):
    from duckdb_graphar_spark.operators.embeddings import pq_encode

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    books = [[(0, [0.0, 0.0]), (1, [1.0, 1.0])]] * 2  # total dim 4 != 3
    with pytest.raises(Exception, match="pq_encode"):
        pq_encode(df, books).collect()


def test_pq_adc_rejects_gapped_codebook(spark):
    from duckdb_graphar_spark.operators.embeddings import pq_adc_topk

    df, _ = _emb_df(spark, n=4)
    bad = [[(0, [0.0] * 4), (2, [1.0] * 4)], [(0, [0.0] * 4), (1, [1.0] * 4)]]
    with pytest.raises(ValueError, match="0..k-1"):
        pq_adc_topk(df, bad, [0.0] * 8)


def test_pq_adc_exact_codebook_vectors_rank_first(spark):
    """A query equal to a stored vector must rank that vector's reconstruction
    distance first (approx dist to itself = dist between its PQ cells and the
    query's — zero when the query IS a codebook seed)."""
    from duckdb_graphar_spark.operators.embeddings import pq_adc_topk, seed_centroids

    df, vecs = _emb_df(spark)
    books = _books(df, 2, 4)
    q = [float(x) for x in vecs[0]]  # vec 0 is seed 0 in every subspace
    top = pq_adc_topk(df, books, q, k=3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["approx_dist2"] == 0.0


def test_pq_train_uses_lloyd_slices(spark):
    """pq_train's codebooks equal kmeans_fit run manually on each slice."""
    from duckdb_graphar_spark.operators.embeddings import kmeans_fit, pq_train

    df, _ = _emb_df(spark, n=40)
    books = pq_train(df, m=2, k=3, n_iters=2)
    for j in range(2):
        sl = df.select(
            "vec_id", F.slice("embedding", j * 4 + 1, 4).alias("embedding")
        )
        upd, _ = kmeans_fit(sl, 3, 2)
        want = {int(r["cluster"]): list(r["centroid"]) for r in upd.collect()}
        got = dict(books[j])
        assert got == {i: want[i] for i in got}


def test_pq_train_rejects_indivisible_dim(spark):
    from duckdb_graphar_spark.operators.embeddings import pq_train

    df, _ = _emb_df(spark, n=10, d=6)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=4, k=2)


# ---------------------------------------------------------------------------
# SSSP
# ---------------------------------------------------------------------------


def _bellman_ford_ref(edges, src, n_iters):
    dist = {src: 0}
    for _ in range(n_iters):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_sssp_matches_reference_on_random_graph(spark):
    from duckdb_graphar_spark.operators.graph import sssp

    rng = np.random.default_rng(11)
    n = 80
    edges = [
        (int(rng.integers(n)), int(rng.integers(n)), int(rng.integers(1, 9)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["id"]: r["dist"]
        for r in sssp(df, 5, n_iters=5, src_col="src", dst_col="dst").collect()
    }
    assert got == _bellman_ford_ref(edges, 5, 5)


def test_sssp_horizon_limits_paths(spark):
    """A vertex 3 hops out is unreachable at n_iters=2 but reached at 3;
    a shorter-weight longer-hop path wins only once the horizon allows it."""
    from duckdb_graphar_spark.operators.graph import sssp

    edges = [(0, 1, 10), (1, 2, 10), (0, 3, 1), (3, 4, 1), (4, 2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    kw = dict(src_col="src", dst_col="dst")
    two = {r["id"]: r["dist"] for r in sssp(df, 0, n_iters=2, **kw).collect()}
    assert two[2] == 20  # direct 2-hop path; cheap 3-hop path out of horizon
    three = {r["id"]: r["dist"] for r in sssp(df, 0, n_iters=3, **kw).collect()}
    assert three[2] == 3


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def _kcore_ref(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_matches_reference(spark):
    from duckdb_graphar_spark.operators.graph import kcore

    rng = np.random.default_rng(7)
    pairs = [
        (int(rng.integers(50)), int(rng.integers(50))) for _ in range(260)
    ]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["id"]: r["degree"]
        for r in kcore(df, 3, n_iters=3, src_col="src", dst_col="dst").collect()
    }
    assert got == _kcore_ref(pairs, 3, 3)


def test_kcore_peels_fringe(spark):
    """A triangle with a pendant chain: the chain peels off round by
    round, the triangle survives any number of rounds at k=2."""
    from duckdb_graphar_spark.operators.graph import kcore

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["id"]: r["degree"]
        for r in kcore(df, 2, n_iters=3, src_col="src", dst_col="dst").collect()
    }
    assert got == {0: 2, 1: 2, 2: 2}


def _kcore_ref_converged(pairs, k):
    """Pure-Python TRUE k-core: peel until fixpoint."""
    prev = None
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while prev != edges:
        prev = edges
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_until_stable_is_true_core(spark):
    """until_stable must reach the converged k-core on a graph that
    NEEDS more than the default 3 rounds: a long pendant chain hanging
    off a triangle peels one vertex per round, so n_iters=3 returns
    chain remnants while until_stable (cap 50) matches the pure-Python
    fixpoint peeler exactly."""
    from duckdb_graphar_spark.operators.graph import kcore

    chain = [(i, i + 1) for i in range(3, 9)]  # 3-4-5-6-7-8 pendant chain
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)] + chain
    df = spark.createDataFrame(pairs, "src long, dst long")
    kw = dict(src_col="src", dst_col="dst")
    fixed = {
        r["id"]: r["degree"] for r in kcore(df, 2, n_iters=3, **kw).collect()
    }
    assert set(fixed) != {0, 1, 2}  # 3 rounds are NOT enough here
    stable = {
        r["id"]: r["degree"]
        for r in kcore(df, 2, n_iters=50, until_stable=True, **kw).collect()
    }
    assert stable == _kcore_ref_converged(pairs, 2) == {0: 2, 1: 2, 2: 2}


def test_kcore_until_stable_matches_reference_random(spark):
    """Property check on a random graph: until_stable == pure-Python
    fixpoint peeler."""
    from duckdb_graphar_spark.operators.graph import kcore

    rng = np.random.default_rng(23)
    pairs = [(int(rng.integers(40)), int(rng.integers(40))) for _ in range(120)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["id"]: r["degree"]
        for r in kcore(
            df, 3, n_iters=100, until_stable=True, src_col="src", dst_col="dst"
        ).collect()
    }
    assert got == _kcore_ref_converged(pairs, 3)


# ---------------------------------------------------------------------------
# tf-idf cosine pairs
# ---------------------------------------------------------------------------


def test_tfidf_cosine_identical_docs_hit_one(spark):
    from duckdb_graphar_spark.operators.text import tfidf_cosine_pairs

    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["id_a"], r["id_b"], r["cosine"])
        for r in tfidf_cosine_pairs(df, threshold=0.99).collect()
    ]
    assert got == [(1, 2, 1.0)]


def test_tfidf_cosine_max_df_drops_stopword_postings(spark):
    """A stopword present in every doc links otherwise-disjoint docs;
    the df cap removes it BEFORE the posting self-join, so those pairs
    never materialize."""
    from duckdb_graphar_spark.operators.text import tfidf_cosine_pairs

    rows = [(1, "the cat"), (2, "the dog"), (3, "the bird")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = tfidf_cosine_pairs(df, threshold=0.0).count()
    capped = tfidf_cosine_pairs(df, threshold=0.0, max_df_frac=0.5).count()
    assert uncapped == 3 and capped == 0


def test_tfidf_cosine_ngram_terms(spark):
    """ngram=2 scores over word bigrams: docs sharing all their words
    but in different ORDER are orthogonal under bigrams (no common
    bigram), while identical docs still hit 1.0; a doc with fewer than
    n words has no terms and never pairs."""
    from duckdb_graphar_spark.operators.text import tfidf_cosine_pairs

    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "gamma beta alpha"),
        (4, "alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in tfidf_cosine_pairs(df, threshold=0.0, ngram=2).collect()
    }
    assert got == {(1, 2, 1.0)}


def test_tfidf_cosine_rejects_bad_ngram(spark):
    import pytest as _pytest

    from duckdb_graphar_spark.operators.text import tfidf_cosine_pairs

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="ngram"):
        tfidf_cosine_pairs(df, ngram=0)


def test_ivfpq_equals_adc_over_probed_cells(spark):
    """IVFADC == pq_adc_topk restricted to the rows whose numpy coarse
    assignment lands in the numpy-derived probe cells."""
    from duckdb_graphar_spark.operators.embeddings import (
        ivfpq_topk,
        kmeans_assign,
        pq_adc_topk,
        seed_centroids,
    )

    df, vecs = _emb_df(spark, n=80, d=8, seed=9)
    coarse = seed_centroids(df, 4)
    books = _books(df, m=2, d_sub=4, k=4)
    q = [float(x) for x in vecs[3]]

    got = [(r.vec_id, r.approx_dist2) for r in
           ivfpq_topk(df, coarse, books, q, k=5, n_probe=2).collect()]

    # numpy probe cells
    cents = np.array([v for _, v in coarse])
    qd = ((cents - np.array(q)) ** 2).sum(axis=1)
    probes = sorted(np.argsort(qd, kind="stable")[:2].tolist())

    asg = {r.vec_id: r.cluster for r in kmeans_assign(df, coarse).collect()}
    cand_ids = [i for i, c in asg.items() if c in probes]
    sub = df.where(df.vec_id.isin(cand_ids))
    exp = [(r.vec_id, r.approx_dist2) for r in
           pq_adc_topk(sub, books, q, k=5).collect()]
    assert got == exp
    assert all(asg[i] in probes for i, _ in got)


def test_ivfpq_validation(spark):
    from duckdb_graphar_spark.operators.embeddings import ivfpq_topk, seed_centroids

    df, vecs = _emb_df(spark, n=20, d=8, seed=1)
    coarse = seed_centroids(df, 2)
    books = _books(df, m=2, d_sub=4, k=2)
    import pytest as _pt

    with _pt.raises(ValueError, match="n_probe"):
        ivfpq_topk(df, coarse, books, [0.0] * 8, n_probe=0)
    with _pt.raises(ValueError, match="query dim"):
        ivfpq_topk(df, coarse, books, [0.0] * 7)


def test_pq_adc_broadcast_mode_bit_identical(spark):
    """The broadcast-table ADC path must return exactly the literal
    path's rows: the tables are the same constant expressions evaluated
    engine-side and round-tripped as exact decimals."""
    from duckdb_graphar_spark.operators.embeddings import pq_adc_topk

    df, vecs = _emb_df(spark)
    m, d_sub = 2, 4
    books = _books(df, m, d_sub)
    q = [float(x) for x in vecs[0]]
    lit = pq_adc_topk(df, books, q, k=7, table_mode="literal").collect()
    bc = pq_adc_topk(df, books, q, k=7, table_mode="broadcast").collect()
    assert [tuple(r) for r in lit] == [tuple(r) for r in bc]


def test_pq_adc_auto_picks_broadcast_above_budget(spark):
    """auto mode must switch to broadcast above the literal budget;
    an explicit bad mode raises."""
    from duckdb_graphar_spark.operators.embeddings import pq_adc_topk

    df, vecs = _emb_df(spark)
    q = [float(x) for x in vecs[0]]
    with pytest.raises(ValueError, match="table_mode"):
        pq_adc_topk(df, _books(df, 2, 4), q, table_mode="nope")


def test_kcore_until_stable_cap_raises(spark):
    """Exiting until_stable through the safety cap instead of the
    fixpoint must raise — a non-converged subgraph must not masquerade
    as the true k-core."""
    import pytest as _pt

    from duckdb_graphar_spark.operators.graph import kcore

    # a long chain peels one vertex per end per round: cap 1 cannot converge
    edges = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with _pt.raises(RuntimeError, match="safety cap"):
        kcore(df, 2, n_iters=1, until_stable=True, src_col="src", dst_col="dst")
