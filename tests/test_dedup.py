"""Dedup operator tests with planted duplicate clusters."""

import pytest
from pyspark.sql import functions as F

from duckdb_graphar_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away today",
        "spark shuffles data between stages when wide dependencies appear in the plan",
        "minhash signatures approximate jaccard similarity of shingle sets quite well",
        "completely unrelated text about cooking pasta with tomatoes and fresh basil leaves",
    ]
    rows = []
    did = 0
    for i, t in enumerate(base):
        rows.append((did, t)); did += 1
        # exact duplicate
        rows.append((did, t)); did += 1
        # near duplicate: one word changed
        rows.append((did, t.replace("the", "a", 1) if "the" in t else t + " extra")); did += 1
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = D.exact_dedup(docs, ["text"])
    # 4 texts duplicated once + 4 near-dups (unique) = 8 distinct hashes
    assert out.count() == 8
    assert out.filter(F.col("dup_count") == 2).count() == 4


def test_minhash_lsh_finds_near_dups(docs):
    pairs = D.minhash_lsh_pairs(docs, num_hashes=64, bands=32, k=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # exact-dup pairs must always be candidates
    for a in (0, 3, 6, 9):
        assert (a, a + 1) in got


def test_ngram_jaccard_verifies(docs):
    pairs = D.minhash_lsh_pairs(docs, num_hashes=64, bands=32, k=2)
    verified = D.ngram_jaccard_pairs(docs, pairs, k=2, threshold=0.5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in verified.collect()}
    for a in (0, 3, 6, 9):
        assert rows[(a, a + 1)] == 1.0  # exact dups
    # near-dup pair (0,2) should clear 0.5 on 2-shingles
    assert any(a == 0 and b == 2 for (a, b) in rows)


def test_minhash_dedup_clusters(docs):
    out = D.minhash_dedup(docs, num_hashes=64, bands=32, k=2, threshold=0.5)
    labels = {r.doc_id: r.cluster_id for r in out.collect()}
    assert len(labels) == 12
    # each triple (base, exact dup, near dup) lands in one cluster keyed by min id
    for base in (0, 3, 6, 9):
        assert labels[base] == labels[base + 1] == labels[base + 2] == base


def test_simhash_pairs(docs):
    pairs = D.simhash_pairs(docs, max_hamming=6, k=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for a in (0, 3, 6, 9):
        assert (a, a + 1) in got  # exact dups at hamming 0


def test_simhash_pairs_cap_above_bucket_sizes_is_exact(docs):
    uncapped = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_pairs(docs, max_hamming=6, k=2).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_pairs(
            docs, max_hamming=6, k=2, max_bucket_size=1000
        ).collect()
    }
    assert capped == uncapped


def test_simhash_pairs_cap_bounds_degenerate_bucket(spark):
    # 40 identical docs -> one fingerprint, every block bucket holds all
    # 40.  cap=10 -> 4 slices per bucket; emitted pairs are within-slice
    # only: a subset of the full clique, and every slice still pairs its
    # own members (the identical fingerprints keep hamming 0).
    rows = [(i, "same words repeated here for everyone") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    capped = D.simhash_pairs(d, max_hamming=6, k=2, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    full = {(a, b) for a in range(40) for b in range(a + 1, 40)}
    assert got <= full
    # each ≤10-member slice contributes its internal clique: 4 slices of
    # 10 -> at least C(10,2)*4 = 180 distinct pairs survive the cap
    assert len(got) >= 180
    # sanity: uncapped finds the whole clique
    assert D.simhash_pairs(d, max_hamming=6, k=2).count() == len(full)


def test_simhash_pairs_rejects_bad_cap(docs):
    with pytest.raises(ValueError, match="max_bucket_size"):
        D.simhash_pairs(docs, max_bucket_size=1)


def test_bitmap_jaccard_matches_array_exact(docs):
    from duckdb_graphar_spark.operators.text import token_count

    sh = docs.filter(token_count(F.col("text")) >= 2).select(
        "doc_id", D.shingles(F.col("text"), 2).alias("s")
    )
    # reference: per-pair array_intersect/array_union arithmetic
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    want = {
        (r.id_a, r.id_b, round(r.j, 9))
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", jac)
        .filter(F.col("j") >= 0.5)
        .collect()
    }
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in D.bitmap_jaccard_pairs(
            sh, id_col="doc_id", set_col="s", threshold=0.5
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bitmap_jaccard_vocab_guard(docs):
    sh = docs.select("doc_id", D.shingles(F.col("text"), 2).alias("s"))
    with pytest.raises(ValueError, match="max_vocab"):
        D.bitmap_jaccard_pairs(sh, id_col="doc_id", set_col="s", max_vocab=3)


def test_connected_components_chain(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 7, 8, 9]], "v long")
    out = {r.v: r.label for r in D.connected_components(edges, verts).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}


def test_embedding_near_dup(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16).astype("float32")
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),  # same direction → cosine ~1
        (2, [float(x) for x in rng.standard_normal(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = D.embedding_near_dup_pairs(df, threshold=0.99, n_planes=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and len(got) == 1


def test_embedding_exact_pairs_superset_of_lsh(spark):
    import numpy as np
    from pyspark.sql import types as T

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + rng.standard_normal(8) * 0.01]),  # near-dup of 0
        (2, [float(x) for x in rng.standard_normal(8)]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    exact = {(r.id_a, r.id_b) for r in D.embedding_exact_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in exact and (0, 2) not in exact
    lsh = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dup_pairs(df, threshold=0.95, n_planes=4).collect()
    }
    assert lsh <= exact  # LSH pruning may lose pairs, never invent them


def test_cc_driver_path_matches_distributed(spark):
    """The adaptive driver union-find fast path and the distributed
    min-label propagation agree on labels."""
    from duckdb_graphar_spark.operators.dedup import connected_components

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    v = spark.range(250).select(F.col("id").alias("v"))
    fast = {r["v"]: r["label"] for r in connected_components(e, v).collect()}
    # min-label propagation moves labels one hop per round — give the
    # distributed path enough rounds to fully converge on long chains
    slow = {
        r["v"]: r["label"]
        for r in connected_components(e, v, driver_threshold=0, max_iters=100).collect()
    }
    assert fast == slow
    assert len(fast) == 250


def test_canonical_keep_best(spark):
    from duckdb_graphar_spark.operators.dedup import canonical_keep_best

    df = spark.createDataFrame(
        [
            (0, "Hello,  World!", 14),
            (1, "hello world", 11),        # same canonical form, shorter
            (2, "hello world extended", 20),
            (3, "HELLO--WORLD", 12),       # same canonical form again
        ],
        "doc_id long, text string, n_chars long",
    )
    got = {r.canon_sha: r for r in canonical_keep_best(df).collect()}
    assert len(got) == 2
    by_keeper = {r.keeper_id: r for r in got.values()}
    # 'hello world' group: doc 0 wins on n_chars=14; 2 dups
    assert by_keeper[0].n_dups == 2 and by_keeper[0].best_quality == 14
    assert by_keeper[2].n_dups == 0


def test_canonical_keep_best_tie_prefers_smallest_id(spark):
    from duckdb_graphar_spark.operators.dedup import canonical_keep_best

    df = spark.createDataFrame(
        [(5, "a b", 3), (2, "A B", 3), (9, "a-b", 3)],
        "doc_id long, text string, n_chars long",
    )
    rows = canonical_keep_best(df).collect()
    assert len(rows) == 1 and rows[0].keeper_id == 2 and rows[0].n_dups == 2


def test_fuzzy_word_pairs_hand_computed(spark):
    from duckdb_graphar_spark.operators.dedup import fuzzy_word_pairs

    df = spark.createDataFrame(
        [
            (0, "color colour theme theme thema"),
            (1, "color theory"),
        ],
        "doc_id long, text string",
    )
    got = {(r.w1, r.w2): (r.dist, r.c1, r.c2) for r in fuzzy_word_pairs(df).collect()}
    # colour/color: dist 1, same first char, lengths 6/5 -> in band
    assert got[("color", "colour")] == (1, 2, 1)
    # thema/theme: dist 1
    assert got[("thema", "theme")] == (1, 1, 2)
    # theory/theme: dist 3 -> filtered; color/theme: different first char
    assert ("theme", "theory") not in got
    assert len(got) == 2


def test_fuzzy_word_pairs_rejects_bad_dist(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.dedup import fuzzy_word_pairs

    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    with _pt.raises(ValueError, match="max_dist"):
        fuzzy_word_pairs(df, max_dist=0)


def test_jaccard_join_exact_boundary_and_prune(spark):
    """A pair at EXACTLY J = 0.95 (38 shared / 40 union) must survive —
    the integer threshold (i*den >= num*union) has no float fuzz; a
    just-below pair must not; tau=1 keeps only identical token sets."""
    from duckdb_graphar_spark.operators.dedup import jaccard_similarity_join

    shared = " ".join(f"t{i:02d}" for i in range(38))
    rows = [
        (1, shared + " onlya"),          # 39 tokens
        (2, shared + " onlyb"),          # 39 tokens, J(1,2) = 38/40 = 0.95
        (3, " ".join(f"t{i:02d}" for i in range(30)) + " x y z"),  # J(1,3) < 0.95
        (4, shared + " onlya"),          # identical set to doc 1
        (5, ""),                          # empty: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in jaccard_similarity_join(df, threshold_num=95).collect()
    }
    assert got[(1, 2)] == (38, 0.95)
    assert got[(1, 4)][1] == 1.0 and got[(2, 4)] == (38, 0.95)
    assert all(a != 3 and b != 3 for a, b in got)

    exact_only = {
        (r.doc_a, r.doc_b)
        for r in jaccard_similarity_join(
            df, threshold_num=1, threshold_den=1
        ).collect()
    }
    assert exact_only == {(1, 4)}


def test_jaccard_join_rejects_bad_threshold(spark):
    from duckdb_graphar_spark.operators.dedup import jaccard_similarity_join

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for num, den in [(0, 100), (101, 100), (1, 0)]:
        try:
            jaccard_similarity_join(df, threshold_num=num, threshold_den=den)
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_jaccard_join_shingle_mode(spark):
    """Shingle mode: identical texts join at J=1 regardless of word
    structure; a one-char edit on an 8+-char text drops shared
    shingles but near-identical long texts still pass 0.5; sub-k texts
    drop out; shingles are case-sensitive raw substrings (unlike word
    mode's lower())."""
    from duckdb_graphar_spark.operators.dedup import jaccard_similarity_join

    base = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = [
        (1, base),
        (2, base),            # identical
        (3, base[:-1] + "!"), # tail edit: most shingles shared
        (4, "short"),          # < 8 chars: no shingles
        (5, base.upper()),     # case-different: disjoint shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_similarity_join(
            df, threshold_num=1, threshold_den=2, shingle_len=8
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.5 <= got[(1, 3)] < 1.0 and 0.5 <= got[(2, 3)] < 1.0
    assert not any(4 in p or 5 in p for p in got)

    try:
        jaccard_similarity_join(df, shingle_len=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_cluster_split_no_leakage(spark):
    """Every member of a near-dup cluster lands on the SAME side;
    unpaired docs split by their own id; bad train_pct raises."""
    from duckdb_graphar_spark.operators.dedup import cluster_split

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: (r.cluster_rep, r.split) for r in
           cluster_split(docs, pairs, train_pct=50).collect()}
    assert len(got) == 20
    # clusters {0,1,2}, {5,6}, {10,11} are split-constant with min-id reps
    for cluster in ([0, 1, 2], [5, 6], [10, 11]):
        reps = {got[d][0] for d in cluster}
        sides = {got[d][1] for d in cluster}
        assert reps == {min(cluster)} and len(sides) == 1
    # unpaired docs are their own rep
    assert got[7][0] == 7 and got[19][0] == 19
    # a 50% split of 20 docs lands both sides non-empty (deterministic)
    assert {s for _, s in got.values()} == {"train", "test"}

    try:
        cluster_split(docs, pairs, train_pct=0)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_cc_distributed_converges_on_long_chain(spark):
    """A 500-edge chain has diameter 500 ≫ max_iters=20: plain
    neighbor-min (one hop per round) would silently return partial
    labels here — the pointer-doubling shortcut converges in O(log D)
    and the result is exact."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(500)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(501)], "v long")
    out = D.connected_components(edges, verts, driver_threshold=0, max_iters=20)
    assert {r.label for r in out.collect()} == {0}


def test_cc_distributed_raises_on_exhaustion(spark):
    """Exact-or-raise: partial labels would corrupt every consumer (a
    Borůvka round would pick an intra-component edge and build a
    cycle), so exhausting max_iters is an error, not a result."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(201)], "v long")
    with pytest.raises(ValueError, match="did not converge"):
        D.connected_components(edges, verts, driver_threshold=0, max_iters=2)
