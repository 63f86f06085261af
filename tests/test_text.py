"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from duckdb_graphar_spark.operators import text as X


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "the cat and the dog of a house went to a tree"),
        (1, "der Hund und die Katze das ist gut und der Baum"),
        (2, "le chat et la maison les arbres des fleurs et le chien"),
        (3, "el gato y la casa que los perros una flor"),
        (4, ""),
        (5, "!!! ??? ###"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(df):
    out = {r.doc_id: r.n for r in df.select("doc_id", X.token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 12 and out[4] == 0 and out[5] == 3


def test_lang_id(df):
    out = {r.doc_id: r.l for r in df.select("doc_id", X.lang_id(F.col("text")).alias("l")).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "es"
    assert out[4] == "und"


def test_punct_ratio(df):
    out = {r.doc_id: r.p for r in df.select("doc_id", X.punct_ratio(F.col("text")).alias("p")).collect()}
    assert out[0] == 0.0
    assert out[5] > 0.5


def test_fingerprint_stability(spark):
    a = spark.createDataFrame([(0, "Hello   World")], "id long, text string")
    b = spark.createDataFrame([(0, "hello world")], "id long, text string")
    fa = a.select(X.fingerprint(F.col("text")).alias("f")).collect()[0].f
    fb = b.select(X.fingerprint(F.col("text")).alias("f")).collect()[0].f
    assert fa == fb and len(fa) == 32


def test_analyze_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = X.analyze(docs)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row.n_tokens > 0 and 0 <= row.quality <= 1 and len(row.fingerprint) == 32


def test_duplicate_ngram_coverage(spark):
    rows = [
        (0, "a b c d e"),
        (1, "a b c x y"),   # shares 3-gram "a b c" with doc 0
        (2, "p q r s"),     # no shared grams
        (3, "zz"),          # shorter than n -> zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in X.duplicate_ngram_coverage(df, n=3).collect()}
    assert out[0].n_grams == 3 and out[0].n_dup_grams == 1
    assert abs(out[0].dup_frac - round(1 / 3, 6)) < 1e-9
    assert out[1].n_dup_grams == 1
    assert out[2].n_dup_grams == 0
    assert out[3].n_grams == 0 and out[3].dup_frac == 0.0
    # within-doc repeats don't count as cross-doc duplicates (distinct
    # per doc before the corpus count)
    solo = spark.createDataFrame([(7, "m m m m m m")], "doc_id long, text string")
    r7 = X.duplicate_ngram_coverage(solo, n=3).collect()[0]
    assert r7.n_grams == 1 and r7.n_dup_grams == 0


def test_repetition_stats(spark):
    rows = [
        (0, "go go go go"),        # modal bigram "go go" x3, 1 distinct token
        (1, "a b c d"),            # all bigrams unique
        (2, ""),                   # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in X.repetition_stats(df).collect()}
    assert out[0].n_tokens == 4 and out[0].top_bigram_n == 3
    assert abs(out[0].top_bigram_frac - 1.5) < 1e-9
    assert abs(out[0].uniq_token_ratio - 0.25) < 1e-9
    assert out[1].top_bigram_n == 1 and abs(out[1].top_bigram_frac - 0.5) < 1e-9
    assert out[2].n_tokens == 0 and out[2].top_bigram_frac == 0.0


def test_contamination(spark):
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e"),   # "a b c"/"b c d" overlap eval doc 100
            (1, "x y z w"),     # clean
            (2, "zz"),          # zero grams
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "a b c d q")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in X.contamination(corpus, eval_df, n=3, threshold=0.5).collect()}
    assert out[0].n_grams == 3 and out[0].n_hit == 2
    assert abs(out[0].hit_frac - round(2 / 3, 6)) < 1e-9 and out[0].contaminated
    assert out[1].n_hit == 0 and not out[1].contaminated
    assert out[2].n_grams == 0 and out[2].hit_frac == 0.0 and not out[2].contaminated


# --- round-3 operators: PII scrub, chunk dedup, deciles, skip-grams ---


def test_pii_scrub_counts_and_redaction(spark):
    from duckdb_graphar_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail a@b.co and c.d+x@e.org, ip 10.0.0.1, call 555-123-4567"),
            (1, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (rows[0].n_emails, rows[0].n_ipv4, rows[0].n_phones) == (2, 1, 1)
    assert (rows[1].n_emails, rows[1].n_ipv4, rows[1].n_phones) == (0, 0, 0)
    import hashlib

    exp = "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    assert rows[0].clean_sha == hashlib.sha256(exp.encode()).hexdigest()


def test_chunk_dedup_finds_shared_chunk(spark):
    from duckdb_graphar_spark.operators.text import chunk_dedup

    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(0, shared + " tail words here"), (1, shared), (2, "all unique words only")],
        "doc_id long, text string",
    )
    import hashlib

    rows = {r.chunk_sha: r for r in chunk_dedup(df).collect()}
    h = hashlib.md5(shared.encode()).hexdigest()
    assert h in rows and rows[h].n_docs == 2 and rows[h].n_occurrences == 2
    assert len(rows) == 1  # tails/unique chunks are not duplicated


def test_quality_deciles_partitions_per_lang(spark):
    from duckdb_graphar_spark.operators.text import quality_deciles

    docs = [(i, "word " * (5 + i) + "end", "en" if i % 2 else "de") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = quality_deciles(df).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, 0)
        per_lang[r.lang] += r.n_docs
        assert 1 <= r.decile <= 10 and r.min_score <= r.max_score
    assert per_lang == {"en": 20, "de": 20}


def test_skipgram_topk_hand_checked(spark):
    from duckdb_graphar_spark.operators.text import skipgram_topk

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b"), (2, "x")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): r.cnt for r in skipgram_topk(df, k=10).collect()}
    # doc0 pairs (window 3): ab, ac, bc; doc1: ab; doc2: none
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_bm25_matches_pure_python(spark):
    from duckdb_graphar_spark.operators.text import bm25_topk

    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana banana"),
        (2, "cherry date elderberry fig grape"),
        (3, "apple apple apple apple banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = ["apple", "banana"]
    got = {r.doc_id: (r.bm25, r.n_terms, r.rank) for r in bm25_topk(df, q, k=4).collect()}

    # pure-Python BM25 with the same ratio idf
    docs = {i: t.split(" ") for i, t in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfreq = {t: sum(1 for d in docs.values() if t in d) for t in q}
    k1, b = 1.2, 0.75

    def score(d):
        s = 0.0
        for t in q:
            tf = docs[d].count(t)
            if tf == 0:
                continue
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(docs[d]) / avgdl))
        return round(s, 6)

    expect = sorted(
        ((score(d), d) for d in docs if score(d) > 0), key=lambda x: (-x[0], x[1])
    )
    assert set(got) == {d for _, d in expect}
    for rank, (s, d) in enumerate(expect, start=1):
        assert got[d][0] == pytest.approx(s, abs=1e-6)
        assert got[d][2] == rank
    # doc 2 matches no query term → absent
    assert 2 not in got


def test_token_freq_spectrum_hand_checked(spark):
    from duckdb_graphar_spark.operators.text import token_freq_spectrum

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c b")], "doc_id long, text string"
    )
    # freqs: a=3, b=2, c=1 → spectrum {1: 1 token, 2: 1, 3: 1}
    got = {r.freq: (r.n_tokens, r.mass) for r in token_freq_spectrum(df).collect()}
    assert got == {1: (1, 1), 2: (1, 2), 3: (1, 3)}


def test_bpe_train_matches_pure_python(spark):
    from duckdb_graphar_spark.operators.text import bpe_train

    docs = [
        (0, "low lower lowest"),
        (1, "new newer newest low"),
        (2, "wide wider widest new new"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r.rank, r.pair, r.weight) for r in
           bpe_train(df, n_merges=4).orderBy("rank").collect()]

    # pure-Python reference BPE over word frequencies
    from collections import Counter

    wf = Counter(w for _, t in docs for w in t.split(" ") if w)
    syms = {w: list(w) for w in wf}
    expect = []
    for r in range(1, 5):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), wt = best
        expect.append((r, f"{a} {b}", wt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    assert got == expect


def test_bpe_train_greedy_leftmost(spark):
    from duckdb_graphar_spark.operators.text import bpe_train

    # 'aaa' x2: round 1 merges (a,a) with weight 2*2=4 (leftmost-first:
    # "a a a" -> "aa a", so the pair count NEXT round is (aa,a))
    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    got = [(r.rank, r.pair, r.weight) for r in
           bpe_train(df, n_merges=2).orderBy("rank").collect()]
    assert got == [(1, "a a", 4), (2, "aa a", 2)]


def test_bpe_train_validation(spark):
    from duckdb_graphar_spark.operators.text import bpe_train

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        bpe_train(df, n_merges=0)
    # single-char vocab: no pairs -> empty merge table
    assert bpe_train(df, n_merges=2).count() == 0


def test_bpe_apply_hand_computed(spark):
    """Apply known merges to a tiny corpus: 'l o' then 'lo w' turns
    'low low lower' into tokens [low, low, low+e+r]."""
    from duckdb_graphar_spark.operators.text import bpe_apply

    df = spark.createDataFrame(
        [(0, "low low lower"), (1, "slow")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bpe_apply(df, ["l o", "lo w"]).collect()}
    # doc 0: 'low'->'low' (1 token) twice; 'lower' -> low,e,r (3 tokens)
    assert got[0].n_chars == 11 and got[0].n_tokens == 5
    assert got[0].compression == round(11 / 5, 6)
    # doc 1: 'slow' -> s,lo,w? 'l o' merges to 'lo'; 'lo w' needs acc to
    # END in symbol 'lo' -> s lo w folds: s+lo (no, pair is lo,w)...
    # fold: acc='s', x='l'->'s l'; x='o': acc ends ' l' -> 's lo';
    # x='w': acc ends 'lo' -> 's low'? NO: merge2=(lo,w), acc ends
    # ' lo' -> append w without space -> 's low' = 2 tokens
    assert got[1].n_tokens == 2 and got[1].n_chars == 4


def test_bpe_apply_rejects_bad_merge(spark):
    from duckdb_graphar_spark.operators.text import bpe_apply

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="merge"):
        bpe_apply(df, ["abc"])


def test_feature_hashing_deterministic_and_signed(spark):
    from duckdb_graphar_spark.operators.text import _FH_MOD, feature_hash_vectors

    df = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "cat")], "doc_id long, text string"
    )
    rows1 = sorted(
        (r.doc_id, r.bucket, r.value)
        for r in feature_hash_vectors(df, dim=8).collect()
    )
    rows2 = sorted(
        (r.doc_id, r.bucket, r.value)
        for r in feature_hash_vectors(df, dim=8).collect()
    )
    assert rows1 == rows2

    def href(w):
        h = 0
        for ch in w:
            h = (h * 31 + ord(ch)) % _FH_MOD
        return h

    def entry(w, c, dim=8):
        h = href(w)
        b = h % dim
        s = 1 if ((h - b) // dim) % 2 == 0 else -1
        return b, s * c

    expect = {}
    for did, text in [(0, "cat cat dog"), (1, "cat")]:
        counts = {}
        for w in text.split():
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            b, v = entry(w, c)
            expect[(did, b)] = expect.get((did, b), 0) + v
    expect = sorted((d, b, v) for (d, b), v in expect.items() if v != 0)
    assert rows1 == expect


def test_feature_hashing_rejects_small_dim(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.text import feature_hash_vectors

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pt.raises(ValueError, match="dim"):
        feature_hash_vectors(df, dim=1)


def test_pmi_collocations_hand_computed(spark):
    """'new york' appears 3x as a bigram and nowhere independently ->
    top PMI; 'the cat'/'the dog' mix -> lower PMI."""
    import math

    from duckdb_graphar_spark.operators.text import pmi_collocations

    docs = [(i, "new york is big and the cat saw the dog") for i in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, min_count=3).collect()
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in rows}
    n = 30  # 10 tokens x 3 docs
    b = 27  # 9 bigrams x 3 docs
    cab, ca, cb = 3, 3, 3
    expect = round(math.log((cab * n * n) / (b * ca * cb)), 6)
    assert got[("new", "york")] == (3, expect)
    # ranking deterministic: all pairs have same counts here, so PMI
    # equal and (w1, w2) tie-break orders rows
    assert rows == sorted(rows, key=lambda r: (-r.pmi, r.w1, r.w2))


def test_sentence_dedup_stats_hand_computed(spark):
    from duckdb_graphar_spark.operators.text import sentence_dedup_stats

    df = spark.createDataFrame(
        [
            (0, "Buy now. Great deal. Buy now. The end"),
            (1, "One sentence only"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in sentence_dedup_stats(df).collect()}
    assert (got[0].n_sentences, got[0].n_distinct) == (4, 3)
    assert abs(got[0].dup_frac - 0.25) < 1e-9
    assert (got[1].n_sentences, got[1].n_distinct, got[1].dup_frac) == (1, 1, 0.0)


def test_char_ngram_profile_counts_and_short_text_guard(spark):
    from duckdb_graphar_spark.operators.text import char_ngram_profile

    df = spark.createDataFrame(
        [(0, "en", "ababa"), (1, "en", "ab"), (2, "fr", "zzz")],
        "doc_id long, lang string, text string",
    )
    got = {(r.lang, r.ngram): (r.cnt, r.rank) for r in char_ngram_profile(df).collect()}
    # 'ababa' → aba, bab, aba; 'ab' too short (no descending-sequence blowup)
    assert got == {("en", "aba"): (2, 1), ("en", "bab"): (1, 2), ("fr", "zzz"): (1, 1)}


def test_classify_language_separates_and_tiebreaks(spark):
    """Two synthetic 'languages' with disjoint trigram inventories
    classify themselves perfectly; a doc equidistant between two
    profiles predicts the lexicographically smaller language."""
    from duckdb_graphar_spark.operators.text import classify_language

    rows = [
        (1, "aa", "aaaaaaaaaa"),
        (2, "aa", "aaaaaaa"),
        (3, "bb", "bbbbbbbbbb"),
        (4, "bb", "bbbbbbb"),
        # mixed text: its own 'zz' profile (all four grams) outscores
        # the single-gram hits on 'aa'/'bb' -> self-classifies
        (5, "zz", "aaabbb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r.lang, r.pred_lang): r.n_docs
        for r in classify_language(df, n=3, k=5).collect()
    }
    assert got[("aa", "aa")] == 2 and got[("bb", "bb")] == 2
    assert got[("zz", "zz")] == 1
    assert sum(got.values()) == 5  # every doc classified exactly once


def test_classify_language_short_text_guard(spark):
    """Texts shorter than n contribute no grams and drop out of the
    confusion matrix (no crash on the descending-sequence corner)."""
    from duckdb_graphar_spark.operators.text import classify_language

    df = spark.createDataFrame(
        [(1, "aa", "aaaa"), (2, "aa", "x")],
        "doc_id long, lang string, text string",
    )
    got = classify_language(df, n=3, k=5).collect()
    assert len(got) == 1 and got[0].n_docs == 1


def test_winnow_shared_substring_guarantee(spark):
    """Two documents sharing a substring of length >= w+k-1 (= 8 at
    k=5, w=4) MUST share at least one fingerprint; a short text
    (grams < w) still yields one whole-window fingerprint; text
    shorter than k yields nothing."""
    from duckdb_graphar_spark.operators.text import winnow_fingerprints

    shared = "xqzwvjkp"  # 8 chars, length w+k-1
    rows = [
        (1, "aaaa" + shared + "bbbb"),
        (2, "cccc" + shared + "dddd"),
        (3, "hello"),   # exactly k chars: 1 gram, 1 clamped window
        (4, "hi"),      # < k: no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] & fps[2], "shared >= w+k-1 substring must share a fingerprint"
    assert len(fps[3]) == 1
    assert 4 not in fps


def test_winnow_density_and_determinism(spark):
    """Fingerprint count is far below gram count (the 2/(w+1) density
    point of winnowing) and repeated runs are identical."""
    from duckdb_graphar_spark.operators.text import winnow_fingerprints

    text = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    a = sorted(r.fingerprint for r in winnow_fingerprints(df).collect())
    b = sorted(r.fingerprint for r in winnow_fingerprints(df).collect())
    assert a == b
    n_grams = len(text) - 4
    assert len(a) < n_grams / 2  # dedup + density keep the set small


def test_gopher_flags_rule_by_rule(spark):
    from duckdb_graphar_spark.operators.text import gopher_quality_flags

    rows = [
        (1, "the cat sat on the mat and that was that with style"),  # passes
        (2, "ab cd"),                                # too few words
        (3, "the of " + "a " * 20),                  # mean word len < 3
        (4, "### the ### of ### and ### #x " * 3),   # symbol ratio high
        (5, "the of 11 22 33 44 55 66 77 88"),       # alpha fraction low
        (6, "zebra quartz vivid jumps boxed wharf"), # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].pass_gopher
    assert not got[2].ok_word_count and not got[2].pass_gopher
    assert not got[3].ok_mean_word_len
    assert not got[4].ok_symbol_ratio
    assert not got[5].ok_alpha_words
    assert not got[6].ok_stopwords and got[6].ok_alpha_words
    # integer rational check: doc 1 has n_words=12 -> bounds via
    # cross-multiplication, not float division
    assert got[1].n_words == 12 and got[1].n_stop_hits >= 2


def test_fingerprint_decontam_partial_copy(spark):
    """An eval doc embedding a >= w+k-1-char substring of a training
    doc gets hits; a disjoint doc gets none; the >10% flag gates on
    integer arithmetic; a full copy is ~100% contaminated."""
    from duckdb_graphar_spark.operators.text import (
        fingerprint_decontamination,
    )

    train_text = "the quick brown fox jumps over the lazy dog repeatedly"
    corpus = spark.createDataFrame(
        [(0, train_text)], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame(
        [
            (1, train_text),                                   # full copy
            (2, "zzz " + train_text[10:30] + " qqq 0123456"),  # partial copy
            (3, "completely unrelated material 987654321x"),   # clean
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in fingerprint_decontamination(corpus, eval_df).collect()
    }
    assert got[1].hit_frac > 0.9 and got[1].contaminated
    assert got[2].n_hit > 0 and got[2].contaminated
    assert got[3].n_hit == 0 and not got[3].contaminated


def test_canonicalize_url_cases(spark):
    """Every normalization rule hand-checked, including the dangling-
    delimiter cleanups the utm removal exposes."""
    from duckdb_graphar_spark.operators.text import canonicalize_url

    cases = [
        ("HTTPS://WWW.Example.COM/A/B#frag", "example.com/a/b"),
        ("http://example.com/a/", "example.com/a"),
        ("https://example.com/a?utm_source=x", "example.com/a"),
        ("https://example.com/a?utm_a=1&utm_b=2", "example.com/a"),
        ("https://example.com/a?id=3&utm_a=1&utm_b=2", "example.com/a?id=3"),
        ("https://example.com/a?utm_a=1&id=3", "example.com/a?id=3"),
        ("www.example.com/x", "example.com/x"),
        # www elsewhere in the host is preserved; only the leading label drops
        ("https://www.www2.example.com/", "www2.example.com"),
        ("https://example.com/?utm_x=", "example.com"),
        # delimiter-anchored: a param NAME merely ending in utm_* must
        # survive intact (the unanchored pattern corrupted it to ?xb=2)
        ("https://example.com/a?xutm_source=1&b=2", "example.com/a?xutm_source=1&b=2"),
        # consecutive run mid-string, one anchored match eats it all
        ("https://example.com/a?utm_a=1&utm_b=2&id=3", "example.com/a?id=3"),
        ("https://example.com/a?id=3&utm_a=1&utm_b=2&utm_c=4", "example.com/a?id=3"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_canonicalize_url_idempotent(spark):
    """Canonicalization is a dedup KEY, so it must be a projection:
    canon(canon(u)) == canon(u).  Checked over a combinatorial corpus
    of scheme x www x case x path-slash x query/utm-position x fragment
    variants (4*2*3*3*9*2 = 1296 URLs) in one Spark job."""
    from duckdb_graphar_spark.operators.text import canonicalize_url

    schemes = ["https://", "http://", "HTTPS://", ""]
    wwws = ["www.", ""]
    hosts = ["Example.COM", "www2.site.org", "xutm.example.net"]
    paths = ["/a/b", "/a/", ""]
    queries = [
        "", "?utm_source=x", "?utm_a=1&utm_b=2", "?id=3&utm_a=1&utm_b=2",
        "?utm_a=1&id=3", "?xutm_source=1&b=2", "?utm_x=", "?a=1&b=2",
        "?utm_a=1&id=3&utm_b=4",
    ]
    frags = ["", "#frag"]
    urls = [
        s + w + h + p + q + f
        for s in schemes for w in wwws for h in hosts
        for p in paths for q in queries for f in frags
    ]
    assert len(urls) == 1296
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url(F.col("url"))
    # null-safe inequality: '<>' would silently drop a row where BOTH
    # sides regressed to NULL (a nulled-out dedup key is the worst case)
    bad = (
        df.select(
            "url",
            once.alias("c1"),
            canonicalize_url(once).alias("c2"),
        )
        .filter("NOT (c1 <=> c2) OR c1 IS NULL")
        .collect()
    )
    assert not bad, bad[:5]
