"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side `pyspark.sql.functions` (codegen'd,
no Python UDFs), so they run inside WholeStageCodegen and scale linearly
with input splits.  Every operator is also expressible in ANSI SQL for
DuckDB-oracle verification (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic.  Deterministic and SQL-expressible (regexp counts).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (long)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    via a tokenizer-style regex (a cheap proxy for a real BPE vocab)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    words = stopwords or _LANG_MARKERS["en"]
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + low punctuation +
    reasonable mean word length.  Deterministic; tune weights freely."""
    n_tok = token_count(text)
    mean_word = F.when(n_tok > 0, F.length(text).cast("double") / n_tok.cast("double")).otherwise(
        F.lit(0.0)
    )
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.5)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    word_ok = F.when((mean_word >= 3.0) & (mean_word <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + word_ok).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-marker language heuristic → 'en'/'de'/'fr'/'es'/'und'.

    Counts per-language marker words (token-boundary regex) and picks the
    argmax; ties / zero hits → 'und'.  Pure JVM expressions (greatest +
    chained when), so it codegens; SQL-expressible for the oracle.
    """
    lower = F.lower(text)

    def hits(words: list[str]) -> Column:
        pat = r"\b(" + "|".join(words) + r")\b"
        return F.size(F.regexp_extract_all(lower, F.lit(pat), F.lit(0)))

    counts = {lang: hits(words) for lang, words in _LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # deterministic priority order on ties: en, de, fr, es
    for lang in ["es", "fr", "de", "en"]:
        out = F.when((best > 0) & (counts[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 is bit-identical in Spark and DuckDB)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def _word_ngrams(tokens: Column, n: int) -> Column:
    """Sliding word n-grams (space-joined) over a token array; empty
    array when the doc has fewer than ``n`` tokens.

    Built as n−1 chained zip_withs over the n shifted slices, not a
    per-index `transform` with a slice+join body: HOF lambdas are
    interpreted, so a slice inside the lambda pays full dispatch per
    OUTPUT gram, while here each slice tree is evaluated once per row
    as a zip_with argument and the lambda bodies are bare two-variable
    concats (measured ~3× on the bigram consumer)."""
    n_out = F.size(tokens) - (n - 1)
    acc = F.slice(tokens, 1, n_out)
    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(tokens, i + 1, n_out), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(n_out > 0, acc).otherwise(F.array().cast("array<string>"))


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(__id, __g) — each doc's DISTINCT word n-grams, exploded.

    The distinctness is load-bearing, not cosmetic:
    duplicate_ngram_coverage's uniq block infers "df==1 ⇒ max(__id) is
    the gram's sole owning doc", which only holds if no doc emits the
    same gram twice.  The array_distinct is fused here so the invariant
    is structurally enforced rather than maintained two statements away.
    """
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col).alias("__id"), _word_ngrams(toks, n).alias("__gs")
    ).select("__id", F.explode(F.array_distinct("__gs")).alias("__g"))


def duplicate_ngram_coverage(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicate n-gram coverage — the corpus-level
    repetition signal behind substring-dedup pipelines ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022): for
    each document, the fraction of its distinct word n-grams that also
    appear in at least one OTHER document.

    Returns (id, n_grams, n_dup_grams, dup_frac) for every input row
    (zero-gram docs report 0 / 0 / 0.0).

    Scale shape: NO gram-keyed join.  A per-doc gram is "duplicate" iff
    its corpus doc-frequency is ≥2, so n_dup = n_grams − n_unique, and
    both counts come from aggregations alone: (1) groupBy(id) counts the
    doc's distinct grams; (2) groupBy(gram) computes doc-frequency — a
    gram with df==1 names its single owning doc, so a groupBy(owner)
    over the df==1 grams counts each doc's unique grams.  That keeps
    exactly ONE corpus-sized shuffle (the gram one); the alternative
    `grams ⋈ freq(gram)` plan re-shuffles every exploded gram string a
    second time and is ~2-3× slower.  All three aggs are map-combinable,
    no driver state, nothing corpus-sized is broadcast.
    """
    grams = _distinct_grams(df, id_col, text_col, n)
    # NOTE: totals deliberately re-aggregates the exploded grams rather
    # than computing size(array_distinct(...)) row-locally — the n-gram
    # transform is an interpreted HOF lambda, and every extra column
    # reference re-evaluates it (measured 8.4s vs 2.2s at sf0.1 when the
    # scalar form referenced it from both a filter and a projection).
    totals = grams.groupBy("__id").agg(F.count(F.lit(1)).alias("n_grams"))
    # df==1 ⇒ max(__id) IS the one owning doc (grams are per-doc distinct)
    uniq = (
        grams.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__df"), F.max("__id").alias("__owner"))
        .filter(F.col("__df") == 1)
        .groupBy(F.col("__owner").alias("__id"))
        .agg(F.count(F.lit(1)).alias("__n_uniq"))
    )
    per_doc = (
        totals.join(uniq, "__id", "left")
        .select(
            "__id",
            "n_grams",
            (F.col("n_grams") - F.coalesce("__n_uniq", F.lit(0))).alias("n_dup_grams"),
        )
    )
    # NULL-SAFE join-back: a NULL doc id is a legitimate group (the
    # q94/q98 discipline) and gets its real counts; a plain name-list
    # left join would also make Catalyst infer isnotnull(doc_id) and
    # push it into ONE of the two gram-aggregate chains (totals — the
    # filter rides its group key; uniq's key is max(id), unpushable),
    # splitting the shared distinct-grams exchange into two full
    # corpus passes (scripts/audit_corpus_passes.py).
    pd_r = per_doc.withColumnRenamed("__id", "__r_id")
    return (
        df.select(F.col(id_col))
        .join(pd_r, F.col(id_col).eqNullSafe(F.col("__r_id")), "left")
        .drop("__r_id")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.round(
                F.coalesce(
                    F.col("n_dup_grams") / F.col("n_grams").cast("double"), F.lit(0.0)
                ),
                6,
            ).alias("dup_frac"),
        )
    )


def contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    n-grams with an evaluation set (the GPT-3 §C / PaLM-style 13-gram
    overlap check; ``n`` is a parameter because the test fixtures have
    short docs).

    Returns (id, n_grams, n_hit, hit_frac, contaminated) for every
    corpus row: distinct per-doc n-grams, how many occur anywhere in the
    eval set, their fraction, and whether it crosses ``threshold``.

    Scale shape: the EVAL side is the small one by construction (benchmarks
    are ~10⁴–10⁶ grams vs a 100 TB corpus), so its distinct-gram set is
    broadcast and the corpus-side join is map-side — the corpus is
    touched exactly once with no corpus-keyed shuffle except the final
    per-doc groupBy(id).
    """
    toks = F.split(F.col(text_col), " ")
    eval_grams = (
        eval_df.select(F.explode(_word_ngrams(toks, n)).alias("__g"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("__id"), _word_ngrams(toks, n).alias("__gs")
    ).select("__id", F.explode(F.array_distinct("__gs")).alias("__g"))
    # one pass over the corpus grams: broadcast left join marks hits, a
    # single map-combinable groupBy(id) counts totals AND hits together
    # (a separate left-semi branch would explode + shuffle the corpus
    # gram table twice)
    per_doc = (
        corpus_grams.join(
            F.broadcast(eval_grams.withColumn("__hit", F.lit(1))), "__g", "left"
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    frac = F.coalesce(
        F.col("n_hit") / F.col("n_grams").cast("double"), F.lit(0.0)
    )
    return (
        corpus.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(frac, 6).alias("hit_frac"),
            (frac >= threshold).alias("contaminated"),
        )
    )


def repetition_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality filters,
    Rae et al. 2021 §A1.1): most-frequent-bigram mass and distinct-token
    ratio.  Boilerplate and degenerate generations score high on the
    former and low on the latter.

    Returns (id, n_tokens, top_bigram_n, top_bigram_frac, uniq_token_ratio).
    top_bigram_frac = occurrences of the modal bigram × 2 / n_tokens.

    Scale shape: BOTH statistics are per-document, so the whole operator
    is a shuffle-free projection.  The modal-bigram count is computed
    row-locally — sort the doc's bigram array (JVM codegen) and take the
    longest equal-run with one HOF aggregate — instead of the obvious
    explode → groupBy(doc, bigram) → groupBy(doc) plan: that shape
    shuffles a corpus-sized gram table whose (doc, bigram) key is nearly
    unique per row, so map-side combine does nothing and the exchange is
    pure overhead.  Measured at sf1 (50k docs): 9.7 s shuffled vs 4.2 s
    row-local, identical results; and the row-local plan's cost stays a
    strict per-partition map at any corpus size.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("__id"),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.when(
            F.size(toks) > 0,
            F.size(F.array_distinct(toks)) / F.size(toks).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("__uniq"),
        F.array_sort(_word_ngrams(toks, 2)).alias("__sbgs"),
    )
    # longest run of equal adjacent elements in the sorted bigram array =
    # occurrences of the modal bigram; state is (prev, current run, best)
    top = F.aggregate(
        F.col("__sbgs"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return base.withColumn("top_bigram_n", top).select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "top_bigram_n",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("top_bigram_n") * 2 / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_bigram_frac"),
        F.round(F.col("__uniq"), 6).alias("uniq_token_ratio"),
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_tokens_bpe": bpe_ish_token_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "quality": quality_score(t),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def bigram_lm_score(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-LM fluency score (the log-free cousin of CCNet-style
    perplexity filtering, Wenzek et al. 2020): train a bigram transition
    model ON the corpus itself — P(w2|w1) = c(w1 w2) / c(w1 ·) — and
    score each document by its mean transition probability.  Boilerplate
    and templated text score high (predictable transitions), word-salad
    and OCR noise score low; thresholding the score is the quality gate.

    Returns (id, n_bigrams, mean_trans_p); docs with <2 tokens get 0/0.0.

    Engine-stable by construction: every probability is an exact-integer
    ratio evaluated with one IEEE division (bit-identical across
    engines, unlike log/exp), and the per-doc mean sums fixed-scale
    decimals so partial-aggregation order can't change the result.

    Scale shape: one corpus-sized explode → groupBy(gram); the context
    totals derive from that AGGREGATED table (no second corpus pass);
    probabilities join back on the gram key and reduce per doc.  No
    driver state, nothing corpus-sized on one node.
    """
    toks = F.split(F.col(text_col), " ")
    # Source contract: the model trains on IDENTIFIED documents only
    # (doc_id is the corpus primary key — same contract as tfidf_topk /
    # the t15/t20/t27 reworks).  The explicit filter matters for plan
    # reuse: the final left join-back infers isnotnull(doc_id) on the
    # per-doc branch ONLY, which made that branch's explode subtree
    # canonically unequal to the model branches' — a third full corpus
    # read.  Null-id docs still appear in the OUTPUT (the join-back
    # left side is the unfiltered df) with the same 0/0.0 they always
    # got (a NULL key never equi-joins).
    src = df.filter(F.col(id_col).isNotNull())
    bg = src.select(
        F.col(id_col).alias("__id"), _word_ngrams(toks, 2).alias("__gs")
    ).select("__id", F.explode("__gs").alias("__g"))
    # __g is non-null by construction (ngram concat of split tokens) and
    # so is its substring_index w1 prefix; both explicit filters are
    # semantic no-ops that unify the constraints DIFFERENT consumers
    # infer (the probability join infers isnotnull(__g); the ctx join
    # infers isnotnull(substring_index(__g,' ',1)) and pushes it into
    # the model branches only) — without them the shared explode
    # subtree splits and the corpus text is read twice (the q102
    # exchange-reuse trap).
    bg = bg.filter(
        F.col("__g").isNotNull()
        & F.substring_index(F.col("__g"), " ", 1).isNotNull()
    )
    # per-(doc, gram) counts FIRST: corpus counts and the per-doc
    # reduction both derive from this one aggregate, so its exchange is
    # the single corpus-sized shuffle — aggregating straight to
    # groupBy(__g) pruned doc_id out of that branch's scan and split
    # the shared explode subtree into two full corpus reads
    # (scripts/audit_corpus_passes.py: 3 passes before, 2 after); the
    # (doc, gram) combine also shrinks the explode before the shuffle.
    tf2 = bg.groupBy("__id", "__g").agg(F.count(F.lit(1)).alias("__c"))
    cbg = tf2.groupBy("__g").agg(F.sum("__c").alias("__cg"))
    ctx = (
        cbg.withColumn("__w1", F.substring_index("__g", " ", 1))
        .groupBy("__w1")
        .agg(F.sum("__cg").alias("__cctx"))
    )
    p = cbg.withColumn("__w1", F.substring_index("__g", " ", 1)).join(ctx, "__w1").select(
        "__g", (F.col("__cg").cast("double") / F.col("__cctx")).alias("__p")
    )
    per = (
        tf2.join(p, "__g")
        .groupBy("__id")
        .agg(
            F.sum("__c").cast("long").alias("n_bigrams"),
            # fixed-scale decimal sum → double → /n: order-independent.
            # Operand types are PINNED so the product stays exact at
            # scale 18: p ≤ 1 fits decimal(19,18), counts fit (10,0),
            # product = (30,18) — a bare (38,18) × long multiply
            # overflows precision 38 and Spark silently RESCALES to
            # fewer fraction digits (the r12 t19 rework's first attempt
            # hash-mismatched exactly there).  Summing p·c per distinct
            # (doc, gram) equals the old per-occurrence decimal sum
            # bit-for-bit.
            (
                F.sum(
                    F.col("__p").cast("decimal(19,18)")
                    * F.col("__c").cast("decimal(10,0)")
                )
                .cast("double")
                / F.sum("__c")
            ).alias("__mean"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per.withColumnRenamed("__id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce("__mean", F.lit(0.0)), 6).alias("mean_trans_p"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF →
    (id, term, tfidf, rank) — the per-doc keyword signal used for topic
    bucketing / domain tagging in data-mixing pipelines.

    idf is the RAW ratio N/df(t) (no log): score = (c_dt · N) /
    (len_d · df_t) is then a single IEEE division of exact integers, so
    the ranking is bit-deterministic across engines — a log idf would
    make near-tie order depend on the engine's ln rounding.  Ties break
    by term ascending.

    Scale shape: one corpus explode → groupBy(doc, term); doc lengths
    AND document frequencies both derive from that aggregated table; the
    final window partitions by doc.  The df(t) join key is the vocab —
    AQE broadcasts it when small, shuffles when not.
    """
    from pyspark.sql import Window

    # source contract (the t27 recipe): TF-IDF terms are only defined
    # for identified docs, and the explicit filters unify the
    # isnotnull(__id)/isnotnull(__tok) constraints the dl/dfreq joins
    # infer into only SOME branches of the shared explode+aggregate
    # subtree — without them the corpus text is read once per branch
    # (scripts/audit_corpus_passes.py measured 3 passes; this is 2).
    df = df.filter(F.col(id_col).isNotNull())
    t = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).filter(F.col("__tok").isNotNull())
    tf = t.groupBy("__id", "__tok").agg(F.count(F.lit(1)).alias("__c"))
    dl = tf.groupBy("__id").agg(F.sum("__c").alias("__len"))
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    nd = df.select(F.count(F.lit(1)).alias("__nd"))
    scored = (
        tf.join(dl, "__id")
        .join(dfreq, "__tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "__id",
            "__tok",
            (
                (F.col("__c") * F.col("__nd")).cast("double")
                / (F.col("__len") * F.col("__df"))
            ).alias("__s"),
        )
    )
    w = Window.partitionBy("__id").orderBy(F.col("__s").desc(), F.col("__tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__id").alias(id_col),
            F.col("__tok").alias("term"),
            F.round("__s", 6).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# --- PII scrubbing -----------------------------------------------------------

# RE2-compatible (no lookarounds/backrefs) so Spark's Java regex and a
# DuckDB oracle agree on every match.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    "phone": (r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
}


def pii_scrub(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction pass for training corpora: count and replace emails,
    IPv4 addresses and phone numbers.  Counts come from the ORIGINAL
    text; redaction applies sequentially (email → ip → phone, pinned
    order so the digest is deterministic).  Returns
    (id, n_emails, n_ipv4, n_phones, clean_sha) where clean_sha is the
    sha256 of the redacted text — pipelines diff the digest to find
    changed docs without shipping the text.

    Pure JVM regexes in one projection: no shuffle, no Python, linear
    scan at any corpus size."""
    t = F.col(text_col)
    counts = {
        name: F.regexp_count(t, F.lit(pat)).alias(f"n_{name}s" if name == "email" else f"n_{name}")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    clean = t
    for pat, repl in PII_PATTERNS.values():
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        counts["email"],
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"),
        F.sha2(clean, 256).alias("clean_sha"),
    )


def chunk_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
) -> DataFrame:
    """Corpus-level duplicated-chunk table: split every document into
    DISJOINT ``chunk_tokens``-word spans (tail kept, may be shorter) and
    report each chunk content occurring more than once:
    (chunk_sha, n_docs, n_occurrences).  The disjoint-span granularity is
    the cheap cousin of overlapping-n-gram dedup (t13): 1/n the exploded
    volume, which is what large substring-dedup pipelines actually run
    first as a coarse pass.

    Scale shape: explode ~n_tokens/chunk_tokens rows per doc, md5 the
    span, then ONE map-combinable two-level aggregation —
    groupBy(chunk, doc) → groupBy(chunk) — so the shuffle carries hashes,
    not text, and distinct-doc counting never builds a set per key.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * chunk_tokens + 1, chunk_tokens)),
    )
    chunks = df.select(
        F.col(id_col).alias("__id"), F.explode(spans).alias("__chunk")
    ).select("__id", F.md5("__chunk").alias("chunk_sha"))
    per_doc = chunks.groupBy("chunk_sha", "__id").agg(F.count(F.lit(1)).alias("__c"))
    return (
        per_doc.groupBy("chunk_sha")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__c").alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


def quality_deciles(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 10,
) -> DataFrame:
    """CCNet-style per-language quality binning (Wenzek et al. 2020 §4.3
    bins corpora into head/middle/tail per language before sampling):
    ntile(``n_buckets``) over (partition by lang, order by quality
    score) with a doc-id tiebreak so the binning is deterministic, then
    per-(lang, decile) membership stats.

    Returns (lang, decile, n_docs, min_score, max_score).  Scale shape:
    one window shuffle on lang (bounded key cardinality — languages, so
    skew is the norm: a 90%-English corpus puts 90% of rows in one
    partition's sort; for that case pre-aggregate by (lang, score) first
    or use approx percentiles — documented tradeoff, exact kept here for
    oracle parity) plus one map-combinable groupBy.
    """
    w = Window.partitionBy(F.col(lang_col)).orderBy(
        quality_score(F.col(text_col)), F.col(id_col)
    )
    scored = df.select(
        F.col(lang_col).alias("lang"),
        quality_score(F.col(text_col)).alias("__score"),
        F.ntile(n_buckets).over(w).alias("decile"),
    )
    return scored.groupBy("lang", "decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("__score"), 6).alias("min_score"),
        F.round(F.max("__score"), 6).alias("max_score"),
    )


def skipgram_topk(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_dist: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-k co-occurring token pairs within ``max_dist`` positions —
    word2vec-style ordered skip-gram context counts, the corpus statistic
    behind PMI/embedding pretraining data prep.

    Returns (w1, w2, cnt), the k most frequent ordered pairs
    (count desc, then lexicographic — fully deterministic).

    Scale shape: pair generation is ROW-LOCAL (nested HOF over positions
    — no join, no per-token explode beyond the pair list itself), then
    one map-combinable groupBy(pair) and a TakeOrderedAndProject top-k;
    nothing corpus-sized crosses the driver."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.least(i + max_dist, n)),
                lambda j: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, j)
                ),
            ),
        )
    )
    exploded = df.select(F.explode(F.when(n >= 2, pairs)).alias("__p"))
    counted = exploded.groupBy("__p").agg(F.count(F.lit(1)).alias("cnt"))
    out = counted.select(
        F.substring_index("__p", " ", 1).alias("w1"),
        F.substring_index("__p", " ", -1).alias("w2"),
        "cnt",
    )
    return out.orderBy(F.col("cnt").desc(), "w1", "w2").limit(k)


def tfidf_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    max_df_frac: float = 1.0,
    ngram: int = 1,
) -> DataFrame:
    """All document pairs whose TF-IDF cosine similarity ≥ threshold —
    the sparse-vector twin of the embedding near-dup sweep (d01), built
    from the text itself.  Returns (id_a, id_b, cosine), id_a < id_b.

    The pair enumeration is the classic POSTING-LIST self-join: weights
    W(doc, term, w) join themselves on term, so only pairs sharing at
    least one term are ever materialized, and the join input per term is
    its posting list.  ``max_df_frac`` is THE scale knob: a term in more
    than that fraction of documents is dropped before the join (a
    stopword's posting list is corpus-sized and its self-join is
    quadratic in it — exactly the hot-key blowup; stopwords also carry
    no discriminative weight).

    ``ngram`` picks the term representation: 1 = single words; n>1 =
    sliding word n-grams.  The representation is what makes the
    posting-list shape scale — the join cost is Σ_term df², so the
    vocabulary must DISCRIMINATE.  On this repo's 31-word synthetic
    fixture, words give Σdf² ≈ 4×10⁸ at 5000 docs (every word is a
    stopword — the s17 pathology) while word TRIGRAMS give vocab ≈27k,
    max df 25, Σdf² ≈ 2.8×10⁶ — a ~200× smaller join with the SAME
    machinery, and realistic caps (max_df_frac < 1) stay engaged
    without dropping anything.

    Float discipline: w = (c·N)/(len·df) is one IEEE division of exact
    integers (t20's ratio-idf recipe); each pair product and each
    squared weight casts to DECIMAL(38,18) and sums exactly, so dot and
    norms are aggregation-order-independent; cosine is then
    sqrt/divide/round-6 — bit-stable across engines.
    """
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    # Source contract: cosine PAIRS are only defined between identified
    # documents, so NULL doc ids leave the corpus HERE — explicitly.
    # This is also load-bearing for the plan: downstream (id_a < id_b)
    # and the norm joins infer isnotnull(doc_id) and push it into
    # whichever tf-consumer branch can carry it (a group-key constraint
    # crosses the aggregate; dfreq's max-key one can't), so without the
    # source-level filter the shared explode+aggregate exchange splits
    # into canonically-different copies and the corpus is read once PER
    # BRANCH (scripts/audit_corpus_passes.py: 3 passes before, 2
    # after — the q102 exchange-reuse discipline).
    df = df.filter(F.col(id_col).isNotNull())
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    grams = toks if ngram == 1 else _word_ngrams(toks, ngram)
    t = df.select(F.col(id_col).alias("__id"), F.explode(grams).alias("__tok"))
    tf = t.groupBy("__id", "__tok").agg(F.count(F.lit(1)).alias("__c"))
    dl = tf.groupBy("__id").agg(F.sum("__c").alias("__len"))
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    nd = df.select(F.count(F.lit(1)).alias("__nd"))
    w = (
        tf.join(dl, "__id")
        .join(dfreq, "__tok")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("__df") <= F.col("__nd") * F.lit(float(max_df_frac)))
        .select(
            "__id",
            "__tok",
            (
                (F.col("__c") * F.col("__nd")).cast("double")
                / (F.col("__len") * F.col("__df"))
            ).alias("__w"),
        )
    )
    norms = w.groupBy("__id").agg(
        F.sum((F.col("__w") * F.col("__w")).cast("decimal(38,18)")).alias("__n2")
    )
    a = w.select(
        F.col("__id").alias("id_a"), F.col("__tok").alias("__ta"), F.col("__w").alias("__wa")
    )
    b = w.select(
        F.col("__id").alias("id_b"), F.col("__tok").alias("__tb"), F.col("__w").alias("__wb")
    )
    dots = (
        a.join(b, (F.col("__ta") == F.col("__tb")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum((F.col("__wa") * F.col("__wb")).cast("decimal(38,18)")).alias("__dot")
        )
    )
    na = norms.select(F.col("__id").alias("id_a"), F.col("__n2").alias("__na"))
    nb = norms.select(F.col("__id").alias("id_b"), F.col("__n2").alias("__nb"))
    cos = F.col("__dot").cast("double") / (
        F.sqrt(F.col("__na").cast("double")) * F.sqrt(F.col("__nb").cast("double"))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(cos >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) lexical retrieval: score every
    document against a fixed query-term set, return the global top-k →
    (id, bm25, rank).  The lexical half of a hybrid retrieval stack
    (fuse with an embedding ranker via `similarity.rrf_fuse`).

    Determinism: idf is the RAW RSJ ratio (N - df + 0.5)/(df + 0.5) —
    one IEEE division of exactly-representable values, no log, so both
    engines compute the identical double (the t20/t27 ratio-idf rule);
    the per-document sum over matched query terms accumulates as
    DECIMAL(38,18) (order-independent), and ranking compares the
    ROUNDED score so near-ties can't flip between engines.

    Scale shape (r12 rework, ZERO corpus shuffles): the query terms are
    LITERALS, so per-term tf is a row-local HOF (`size(filter(toks,
    = t))`) — no explode, no (doc, term) groupBy.  Pass 1 is one tiny
    global aggregate emitting N, Σdl AND every per-term document
    frequency in a single row (map-combined; the shuffle carries one
    partial row per task); pass 2 filters to matched docs and scores
    them row-locally against the broadcast stats row, feeding
    TakeOrderedAndProject — never a global sort.  The earlier
    explode-and-join form measured FOUR corpus passes
    (scripts/audit_corpus_passes.py: the tf/dl/stats consumers each
    re-derived the scan); this shape measures two, and the only data
    that ever moves is one stats row + k results.
    """
    from functools import reduce

    from pyspark.sql import Window

    # dedup preserving order: the old (doc, term) groupBy collapsed
    # repeated query terms; per-term columns must do the same
    terms = list(dict.fromkeys(str(t) for t in query_terms))
    base = df.select(
        F.col(id_col).alias("__id"), F.split(F.col(text_col), " ").alias("__toks")
    )
    def _tf(term: str) -> F.Column:
        # one-arg lambda, term bound by closure: a two-arg lambda (the
        # `t=t` default trick) is treated by F.filter as the
        # (element, INDEX) signature and the term silently becomes the
        # array index column
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    per_doc = base.select(
        "__id",
        F.size("__toks").alias("__dl"),
        *[_tf(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    # CORPUS PASS 1: corpus size, total length, and every df(t) in ONE
    # single-row aggregate
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__tot"),
        *[
            F.sum(F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0)).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    avgdl = F.col("__tot").cast("double") / F.col("__n")

    def _contrib(i: int) -> F.Column:
        tf = F.col(f"__tf{i}")
        dfq = F.col(f"__df{i}")
        idf = (F.col("__n") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        tf_part = (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / avgdl)
        )
        # identical addend to the old SUM(decimal) aggregate: the IEEE
        # product cast to decimal(38,18); decimal addition is exact and
        # order-independent, so the total matches bit-for-bit
        return F.when(
            tf > 0, (idf * tf_part).cast("decimal(38,18)")
        ).otherwise(F.lit(0).cast("decimal(38,18)"))

    matched = reduce(
        lambda a, b: a | b,
        [F.col(f"__tf{i}") > 0 for i in range(len(terms))],
    )
    # CORPUS PASS 2: row-local scoring of matched docs against the
    # broadcast stats row
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .filter(matched)
        .select(
            "__id",
            F.round(
                reduce(
                    lambda a, b: a + b,
                    [_contrib(i) for i in range(len(terms))],
                ).cast("double"),
                6,
            ).alias("bm25"),
            reduce(
                lambda a, b: a + b,
                [
                    F.when(F.col(f"__tf{i}") > 0, 1).otherwise(0)
                    for i in range(len(terms))
                ],
            ).alias("n_terms"),
        )
    )
    top = scored.orderBy(F.col("bm25").desc(), F.col("__id").asc()).limit(k)
    w = Window.orderBy(F.col("bm25").desc(), F.col("__id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("__id").alias(id_col), "bm25", F.col("n_terms").cast("long").alias("n_terms"), "rank"
    )


def token_freq_spectrum(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Corpus frequency-of-frequencies (the Zipf spectrum): for each
    corpus frequency f, how many distinct tokens occur exactly f times
    and how much token mass they carry → (freq, n_tokens, mass).
    The shape drives vocabulary-size / min-count decisions and is the
    standard smoke test that a corpus wasn't accidentally duplicated
    (a dup shifts the whole spectrum to even frequencies).

    Scale shape: two map-combinable groupBys — token counts (the only
    corpus-sized shuffle, carrying one row per distinct token after
    partial aggregation) then the tiny spectrum aggregation.  No joins,
    no windows, no Python."""
    tok = df.select(F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
    freq = tok.groupBy("__tok").agg(F.count(F.lit(1)).alias("__f"))
    return (
        freq.groupBy("__f")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .select(
            F.col("__f").alias("freq"),
            "n_tokens",
            (F.col("__f") * F.col("n_tokens")).alias("mass"),
        )
    )


def bpe_train(
    df: DataFrame, *, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-level BPE merge training (Sennrich et al. 2016) → the
    merge table (rank, pair, weight): ``n_merges`` rounds of
    count-all-adjacent-symbol-pairs → take the globally most frequent →
    apply it everywhere.  The real tokenizer-training primitive, built
    the way the reference algorithm actually scales: merges iterate
    over the WORD-FREQUENCY table (distinct words × counts), never the
    corpus — the corpus is touched exactly once to build that table.

    Determinism: pair weights are exact integer sums; the best pair
    breaks ties lexicographically; applying a merge is a greedy left
    fold over each word's symbol string (`aggregate` over tokens —
    "a a a" under merge (a,a) → "aa a", matching the reference
    tokenizer's leftmost-first behavior), which DuckDB replays with the
    identical `list_reduce` fold.

    Scale shape per round: one pair explode over the word table (≤
    avg-word-len rows per distinct word), one map-combinable integer
    groupBy, and a TakeOrdered(1) argmax — the only driver state is the
    single winning pair per round (the kmeans_fit k-row pattern);
    lineage cut each round.  At 100 TB the word table is millions of
    rows — executor-resident throughout.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    chars = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length("__w")),
            lambda i: F.col("__w").substr(i, F.lit(1)),
        ),
        " ",
    )
    wf = words.select("__w", "__f", chars.alias("__s"))

    merges: list[tuple[int, str, int]] = []
    for r in range(1, n_merges + 1):
        toks = F.split(F.col("__s"), " ")
        # guard: Spark's sequence(1, 0) DESCENDS; single-symbol words
        # must yield no pairs, not the pair (s[1], s[0])
        pairs = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat(
                    F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        best = (
            wf.select(F.explode(pairs).alias("__p"), "__f")
            .groupBy("__p")
            .agg(F.sum("__f").alias("__wt"))
            .orderBy(F.col("__wt").desc(), F.col("__p").asc())
            .first()
        )
        if best is None:
            break
        a, b = best["__p"].split(" ")
        merges.append((r, best["__p"], int(best["__wt"])))
        wf = wf.select("__w", "__f", _bpe_merge_fold(toks, a, b).alias("__s")).localCheckpoint(
            eager=False
        )
    return spark.createDataFrame(merges, "rank long, pair string, weight long")


def _bpe_merge_fold(toks: F.Column, a: str, b: str) -> F.Column:
    """Greedy leftmost-first application of merge (a, b) to a symbol
    array: fold left, appending b WITHOUT the separating space whenever
    the accumulator currently ends in symbol ``a`` — 'a a a' under
    (a, a) → 'aa a', the reference tokenizer's behavior.  Shared by
    :func:`bpe_train` (between rounds) and :func:`bpe_apply`; the
    DuckDB twin is the identical ``list_reduce`` CASE fold."""
    return F.aggregate(
        toks,
        F.lit(""),
        lambda acc, x: (
            F.when(acc == F.lit(""), x)
            .when(
                ((acc == F.lit(a)) | acc.endswith(" " + a)) & (x == F.lit(b)),
                F.concat(acc, F.lit(b)),
            )
            .otherwise(F.concat(acc, F.lit(" "), x))
        ),
    )


def bpe_apply(
    df: DataFrame,
    merges: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge list to a corpus → per document
    (id, n_chars, n_tokens, compression): the tokenizer-APPLICATION
    half of :func:`bpe_train`, measuring how far the learned merges
    compress each document.

    Scale shape — the fold runs once per DISTINCT word, never per
    occurrence: explode docs to (doc, word, count), reduce the word set
    to distinct words, apply every merge as one chained symbol fold per
    word (merges are a bounded driver-side list — the trained
    vocabulary), then join the per-word token counts back and sum per
    doc.  On a heavy-tailed corpus the distinct-word table is orders of
    magnitude smaller than the token stream, which is exactly why real
    tokenizers precompute word→pieces caches; both shuffles (word join,
    doc groupBy) carry integers, and AQE broadcasts the token table
    when it fits."""
    for m in merges:
        if len(m.split(" ")) != 2:
            raise ValueError(f"merge {m!r} must be 'a b'")
    dw = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    chars = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length("__w")),
            lambda i: F.col("__w").substr(i, F.lit(1)),
        ),
        " ",
    )
    s = dw.select("__w").distinct().select("__w", chars.alias("__s"))
    for m in merges:
        a, b = m.split(" ")
        s = s.select("__w", _bpe_merge_fold(F.split(F.col("__s"), " "), a, b).alias("__s"))
    tok = s.select("__w", F.size(F.split(F.col("__s"), " ")).cast("long").alias("__nt"))
    return (
        dw.join(tok, "__w")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__c") * F.length("__w")).cast("long").alias("n_chars"),
            F.sum(F.col("__c") * F.col("__nt")).cast("long").alias("n_tokens"),
        )
        .select(
            F.col(id_col),
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("compression"),
        )
    )


_FH_MOD = 1_000_003  # prime modulus for the portable polynomial hash


def feature_hash_vectors(
    df: DataFrame,
    *,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): fixed-``dim`` signed
    bag-of-words features without a vocabulary — token t contributes
    sign(t)·count(t) to bucket(t).  Emitted SPARSE as (id, bucket,
    value) rows with zero buckets dropped; callers densify at the edge.

    Engine-portable hash (no murmur dependency): h(t) = fold over
    UTF-8-codepoint values, h = (h·31 + code) mod 1000003 — exact
    integer arithmetic both engines replay; bucket = h mod dim,
    sign = +1 if ((h − bucket)/dim) even else −1 (second-order bits,
    independent of the bucket bits, which is what keeps collision bias
    unbiased per Weinberger's sign trick).

    Scale shape: explode → per-(doc, token) count (map-combinable) →
    row-local hash → one (doc, bucket) groupBy; vocabulary size never
    appears anywhere — the entire point of feature hashing at 100 TB."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    toks = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    codes = F.transform(
        F.sequence(F.lit(1), F.length("__t")),
        lambda i: F.ascii(F.col("__t").substr(i, F.lit(1))).cast("long"),
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(_FH_MOD),
    )
    withh = toks.withColumn("__h", h)
    bucket = F.col("__h") % dim
    sign = F.when(
        ((F.col("__h") - bucket) / dim).cast("long") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        withh.select(
            F.col(id_col),
            bucket.cast("long").alias("bucket"),
            (sign * F.col("__c")).cast("long").alias("__v"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("__v").cast("long").alias("value"))
        .filter(F.col("value") != 0)
    )


def pmi_collocations(
    df: DataFrame,
    *,
    k: int = 50,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (Church &
    Hanks 1990): the top-``k`` adjacent word pairs by
    PMI = ln(p(ab) / (p(a)·p(b))), computed from exact integer counts —
    (w1, w2, n_pair, pmi), pairs below ``min_count`` dropped (rare
    pairs have divergent PMI; the standard floor).

    Determinism: counts are map-combinable integer aggregates; the ln
    argument is assembled from them with a mirrored cast/multiply
    order, so both engines evaluate ln on the identical double;
    ordering uses the published round-6 PMI with (w1, w2) tie-break.

    Scale shape: one bigram groupBy + one unigram groupBy (the two
    corpus shuffles), two vocabulary-keyed joins to stamp unigram
    counts (AQE broadcasts the unigram table when it fits), scalar
    totals ride a 1-row cross join; final cut is TakeOrdered(k)."""
    toks = F.split(F.col(text_col), " ")
    bigrams = (
        df.select(F.explode(_word_ngrams(toks, 2)).alias("__g"))
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__cab"))
    )
    uni = (
        df.select(F.explode(toks).alias("__w"))
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = F.broadcast(
        uni.agg(F.sum("__c").alias("__n")).crossJoin(
            bigrams.agg(F.sum("__cab").alias("__b"))
        )
    )
    ua = uni.select(F.col("__w").alias("__w1"), F.col("__c").alias("__ca"))
    ub = uni.select(F.col("__w").alias("__w2"), F.col("__c").alias("__cb"))
    g = bigrams.filter(F.col("__cab") >= min_count).select(
        F.split(F.col("__g"), " ")[0].alias("__w1"),
        F.split(F.col("__g"), " ")[1].alias("__w2"),
        "__cab",
    )
    pmi = F.round(
        F.log(
            (
                F.col("__cab").cast("double")
                * F.col("__n").cast("double")
                * F.col("__n").cast("double")
            )
            / (
                F.col("__b").cast("double")
                * F.col("__ca").cast("double")
                * F.col("__cb").cast("double")
            )
        ),
        6,
    )
    return (
        g.join(ua, "__w1")
        .join(ub, "__w2")
        .crossJoin(totals)
        .select(
            F.col("__w1").alias("w1"),
            F.col("__w2").alias("w2"),
            F.col("__cab").cast("long").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def sentence_dedup_stats(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document boilerplate signal: split each document into
    sentences (period + whitespace; a portable RE2/Java-regex split —
    no lookbehind) and report (id, n_sentences, n_distinct, dup_frac)
    where dup_frac = 1 − distinct/total — repeated-sentence mass, the
    page-boilerplate detector CCNet-style cleaners run per document.

    Row-local: two bound array columns (the split and its
    array_distinct — bound ONCE each per the interpreted-HOF rules),
    zero shuffles."""
    s = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\.\s+"), lambda x: F.trim(x) != ""
        ).alias("__sents"),
    )
    s = s.withColumn("__n", F.size("__sents"))
    s = s.withColumn("__nd", F.size(F.array_distinct("__sents")))
    return s.select(
        F.col(id_col),
        F.col("__n").cast("long").alias("n_sentences"),
        F.col("__nd").cast("long").alias("n_distinct"),
        F.when(
            F.col("__n") > 0,
            F.round(
                F.lit(1.0) - F.col("__nd").cast("double") / F.col("__n").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def char_ngram_profile(
    df: DataFrame,
    *,
    n: int = 3,
    k: int = 10,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Character n-gram frequency profiles per language — the TRAINING
    side of n-gram language identification (the applied heuristic is
    t02): per (lang, n-gram) exact counts, top-``k`` per language by
    (count desc, n-gram asc) → (lang, ngram, cnt, rank).  Spaces count
    (real profiles keep them: word-boundary grams are the strongest
    language signals).

    Scale shape: the n-gram explode is row-local (length-n+1 grams per
    doc), then ONE map-combinable (lang, ngram) count; only the
    (lang, ngram) aggregate shuffles — the vocabulary, not the corpus.
    The per-language top-k window runs over that aggregate (bounded by
    distinct n-grams per language)."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    # NB: Spark's sequence(1, stop) is DESCENDING for stop < 1, so
    # short texts need the explicit empty-array guard
    positions = F.when(
        F.length(text_col) >= n,
        F.sequence(F.lit(1), F.length(text_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.transform(positions, lambda i: F.col(text_col).substr(i, F.lit(n)))
        ).alias("ngram"),
    )
    counts = grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("ngram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "ngram", "cnt", "rank")
    )


def classify_language(
    df: DataFrame,
    *,
    n: int = 3,
    k: int = 50,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character n-gram language-ID CLASSIFICATION — the apply side of
    :func:`char_ngram_profile`'s training side, returning the per-
    (true, predicted) confusion-matrix counts → (lang, pred_lang,
    n_docs).

    Simplified Cavnar-Trenkle scoring with ALL-INTEGER arithmetic:
    every profile n-gram carries weight ``k+1−rank`` (rank ties break
    (count DESC, n-gram ASC) — deterministic), a document's score for a
    candidate language is the weight sum over its n-gram OCCURRENCES
    that hit that profile, and the prediction is the max-score language
    (ties break language ASC).  No floats anywhere, so the whole
    pipeline replays exactly in SQL.

    Scale shape: the profile table is tiny (langs × k rows) and
    BROADCASTS against the row-local n-gram explode — the corpus never
    shuffles by n-gram.  The per-(doc, candidate) score aggregate is
    map-combinable, so the one corpus-keyed shuffle carries ≤
    docs × langs pre-combined score rows, not the gram stream; the
    argmax window runs over that bounded aggregate, and the final
    confusion count is langs² rows."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    prof = (
        char_ngram_profile(df, n=n, k=k, lang_col=lang_col, text_col=text_col)
        .select(
            F.col("lang").alias("__cand"),
            "ngram",
            (F.lit(k + 1) - F.col("rank")).alias("__w"),
        )
    )
    positions = F.when(
        F.length(text_col) >= n,
        F.sequence(F.lit(1), F.length(text_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("lang"),
        F.explode(
            F.transform(positions, lambda i: F.col(text_col).substr(i, F.lit(n)))
        ).alias("ngram"),
    )
    scores = (
        grams.join(F.broadcast(prof), "ngram")
        .groupBy("__id", "lang", "__cand")
        .agg(F.sum("__w").alias("__score"))
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("__score").desc(), F.col("__cand").asc()
    )
    pred = (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("lang", F.col("__cand").alias("pred_lang"))
    )
    return pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def winnow_fingerprints(
    df: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer-Wilkerson-Aiken, the
    MOSS algorithm) → (doc_id, fingerprint) exploded: hash every
    character ``k``-gram, slide a window of ``w`` consecutive hashes,
    keep each window's MINIMUM — the fingerprint set every local
    document selects INDEPENDENTLY yet with the guarantee that any
    substring match of length ≥ w + k − 1 contributes at least one
    SHARED fingerprint (the window bound forces both documents to
    sample a minimum from the shared region).  The plagiarism /
    near-dup primitive that needs no cross-document coordination.

    Engine-parity discipline: the k-gram hash is content-addressed md5
    integer arithmetic (the t36/q80 discipline) rather than a
    multiplicative rolling hash — same O(L) work per document (Spark
    evaluates the transform per position either way), deterministic,
    and replayable in SQL.  Texts shorter than k yield no grams; gram
    sequences shorter than w yield one whole-sequence window (Spark's
    and DuckDB's slice both clamp at the end).

    Scale shape: selection is entirely ROW-LOCAL (array transforms
    inside whole-stage codegen, then one explode of the DISTINCT
    minima — ~2/(w+1) of the grams by the winnowing density bound); no
    shuffle at all until a caller aggregates or joins fingerprints."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    hs = F.expr(
        f"transform(sequence(1, length({text_col}) - {k - 1}),"
        f" i -> cast(conv(substring(md5(substring({text_col}, i, {k})),"
        " 1, 13), 16, 10) as long))"
    )
    base = df.filter(F.length(text_col) >= k).select(
        F.col(id_col).alias("doc_id"), hs.alias("__hs")
    )
    wins = F.expr(
        f"transform(sequence(1, greatest(size(__hs) - {w - 1}, 1)),"
        f" j -> array_min(slice(__hs, j, {w})))"
    )
    return base.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fingerprint")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_symbol_per_100_words: int = 10,
    min_alpha_word_pct: int = 80,
    min_stop_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The GOPHER quality-filter rule set (Rae et al. 2021, the
    industry-standard pre-training document filter) with ALL-INTEGER
    arithmetic → one row per document with the raw counts, one boolean
    per rule, and the conjunction:

    - word count within [min_words, max_words]
    - mean word length within [min, max] — checked as
      min·n ≤ total_chars ≤ max·n, no division
    - symbol-to-word ratio ('#' words and '...'/'…' ellipses) ≤
      max_symbol_per_100_words %, checked as symbols·100 ≤ limit·n
    - ≥ min_alpha_word_pct % of words contain an alphabetic character
      (alpha·100 ≥ pct·n)
    - at least ``min_stop_hits`` DISTINCT stopwords from the canonical
      8-word list appear (the "is this prose at all" test)

    Every rule is a rational comparison cross-multiplied to integers,
    so the whole filter replays exactly in SQL — no float thresholds
    to drift between engines.  Scale shape: entirely ROW-LOCAL array
    expressions in whole-stage codegen; zero shuffle (the downstream
    filter is a scan predicate at 100 TB)."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    n = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    symbols = F.size(
        F.filter(
            words,
            lambda w: w.contains("#") | w.contains("...") | w.contains("…"),
        )
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_words"),
        total_chars.alias("total_word_chars"),
        alpha.alias("n_alpha_words"),
        symbols.alias("n_symbol_words"),
        stop_hits.alias("n_stop_hits"),
    )
    ok_count = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    ok_mean = (
        F.col("total_word_chars") >= min_mean_word_len * F.col("n_words")
    ) & (F.col("total_word_chars") <= max_mean_word_len * F.col("n_words"))
    ok_symbol = (
        F.col("n_symbol_words") * 100
        <= max_symbol_per_100_words * F.col("n_words")
    )
    ok_alpha = (
        F.col("n_alpha_words") * 100 >= min_alpha_word_pct * F.col("n_words")
    )
    ok_stop = F.col("n_stop_hits") >= min_stop_hits
    return base.select(
        "*",
        ok_count.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_symbol.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_count & ok_mean & ok_symbol & ok_alpha & ok_stop).alias(
            "pass_gopher"
        ),
    )


def fingerprint_decontamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    threshold_num: int = 1,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus DECONTAMINATION via winnowing fingerprints — the
    substring-level sibling of the n-gram-overlap check
    (:func:`contamination`): an eval document is flagged when more
    than ``threshold_num/threshold_den`` of its fingerprints appear
    anywhere in the training corpus.  Winnowing's guarantee makes this
    catch PARTIAL copies (any shared substring ≥ w+k−1 chars plants a
    shared fingerprint), where document-hash dedup only catches full
    ones.  Returns (doc_id, n_fp, n_hit, hit_frac, contaminated).

    Scale shape: both fingerprint sets are row-local selections
    (~2/(w+1) of grams); the corpus side reduces to its DISTINCT
    fingerprint set before the only join, and the eval side is
    typically tiny — at 100 TB this is a broadcast semi-join of the
    benchmark's fingerprints against a fingerprint-bucketed corpus,
    never a text-to-text comparison.  The hit ratio is integer-gated
    (n_hit·den > num·n_fp)."""
    cfp = winnow_fingerprints(
        corpus, k=k, w=w, id_col=id_col, text_col=text_col
    ).select("fingerprint").distinct()
    efp = winnow_fingerprints(
        eval_df, k=k, w=w, id_col=id_col, text_col=text_col
    )
    hits = efp.join(cfp, "fingerprint", "left_semi")
    n_fp = efp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    n_hit = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_fp.join(n_hit, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_fp").cast("long").alias("n_fp"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_fp"),
                6,
            ).alias("hit_frac"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)) * threshold_den
                > F.lit(threshold_num) * F.col("n_fp")
            ).alias("contaminated"),
        )
    )


def canonicalize_url(url: F.Column) -> F.Column:
    """URL canonicalization for web-corpus dedup (the CCNet/C4-style
    normalization step): lowercase, strip the fragment, the scheme,
    a leading ``www.``, every ``utm_*`` tracking parameter, then any
    dangling ``?`` / trailing ``/`` the removals exposed.

    Pure JVM-side ``regexp_replace`` composition — no UDF — and every
    PATTERN is RE2-compatible (capture groups are fine; no backrefs
    IN the pattern, no lookaround), so the DuckDB oracle applies the
    literally identical patterns (only the replacement backref is
    spelled per-engine: ``$1`` in Spark, ``\\1`` in DuckDB).  Two
    passes remove utm parameters wherever they sit:
    ``([?&])(utm_x=v&)+`` — LEFT-ANCHORED on the delimiter so a
    parameter whose name merely ends in a utm_ suffix (``?xutm_a=1``)
    is untouched, with the ``+`` eating consecutive runs in one match
    (the replace scan never rescans its own output, so an unanchored
    single-param pattern would leave every second param of a run
    behind) — and ``[?&]utm_x=v$`` (the trailing one, taking its
    delimiter).
    """
    u = F.lower(url)
    u = F.regexp_replace(u, "#.*$", "")
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, "([?&])(utm_[a-z]+=[^&]*&)+", "$1")
    u = F.regexp_replace(u, r"[?&]utm_[a-z]+=[^&]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    u = F.regexp_replace(u, "/$", "")
    return u
