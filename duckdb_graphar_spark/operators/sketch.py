"""Sketch-backed operators whose FINAL answer is exact.

Heavy hitters (frequent tokens) is the canonical 100 TB case: the naive
plan shuffles every token in the corpus through one groupBy — at 100 TB
that shuffle IS the job.  The two-phase plan here shuffles only a
bounded candidate set:

1. **Candidate generation** — a per-partition Misra-Gries summary
   (capacity 2k) over the token stream, computed row-locally inside one
   Arrow-batched ``mapInPandas`` pass: no shuffle, O(k) state per
   partition.  By the averaging argument, any token with global
   frequency > n/k exceeds n_p/k on at least one partition and a
   capacity-k Misra-Gries summary never evicts a local item with
   frequency > n_p/(k+1), so the union of partition candidates is a
   SUPERSET of the true heavy hitters regardless of how rows are split.
2. **Exact recount** — re-scan the corpus JVM-side (explode + split),
   keep only candidate tokens via a broadcast left-semi join, and count
   exactly.  The shuffle carries candidate tokens only.
3. **Exact threshold** — keep tokens with ``freq * k > n`` (integer
   arithmetic, no division).  Extra candidates from step 1 are filtered
   here, so the output is EXACTLY the set of true heavy hitters with
   exact counts — deterministic and independent of partitioning, which
   is what lets a plain SQL oracle verify it.

Reference parity: the reference engine has no sketch surface; this is a
north-star training-pipeline operator (frequent-token audit before
tokenizer training / stopword induction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Streaming Misra-Gries over every token of a partition's text rows.

    Keeps at most ``capacity`` counters; on overflow decrements all
    (classic MG step).  Survivors are exactly the items whose local
    frequency can exceed n_p/(capacity+1).
    """
    counters: dict[str, int] = {}
    for pdf in batches:
        for text in pdf["__text"]:
            if text is None:
                continue
            for tok in text.split(" "):
                if not tok:
                    continue
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < capacity:
                    counters[tok] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
    yield pd.DataFrame({"token": list(counters.keys())})


def heavy_hitters(
    df: DataFrame, *, text_col: str = "text", k: int = 20
) -> DataFrame:
    """Exact tokens with global frequency > n/k, found without a
    corpus-wide token shuffle.  Returns (token, freq).

    See the module docstring for the three-phase plan and the
    superset/exactness argument.  The per-partition summary uses
    capacity 2k — the guarantee needs only k; the slack halves the
    false-candidate decrements without changing the (exact) output.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    texts = df.select(F.col(text_col).alias("__text"))
    cands = texts.mapInPandas(
        lambda it: _misra_gries_partition(it, 2 * k), "token string"
    ).distinct()

    toks = texts.select(
        F.explode(F.split(F.col("__text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    # n is a 1-row aggregate; attach via broadcast nested-loop join so
    # the threshold stays integer-exact (freq*k > n, no division)
    n = toks.agg(F.count(F.lit(1)).alias("__n"))
    counted = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        counted.join(F.broadcast(n))
        .filter(F.col("freq") * F.lit(int(k)) > F.col("__n"))
        .select("token", "freq")
    )


def kmv_distinct_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    partial_col: str | None = None,
    k: int = 64,
    seed: str = "kmv0",
) -> DataFrame:
    """Mergeable K-MINIMUM-VALUES distinct-count sketch rollup →
    (group, n_exact, kth_u, est_distinct, within_tol).

    The KMV estimator (Bar-Yossef et al.): hash every value to a
    uniform u ∈ (0, 1]; if the k-th smallest hash among D distincts is
    u_k, then E[u_k] ≈ k/D, so D̂ = (k−1)/u_k.  Two properties make it
    the warehouse-grade sketch next to HLL (q63):

    - **Bit-exact cross-engine**: u is CONTENT-ADDRESSED md5 integer
      arithmetic (the t36 discipline — top 13 hex digits / (2^52+1),
      both sides exactly representable), so the sketch, the estimate,
      and therefore the ORACLE are deterministic to the last bit — no
      approximation flags needed for the sketch itself, only for its
      distance from the exact count.
    - **Mergeable by construction**: bottom-k of a union equals
      bottom-k of the per-partial bottom-k's, so per-``partial_col``
      sketches (e.g. per-day) roll up to the group total by one more
      bottom-k pass — the map-combinable shape; the shuffle carries
      ≤ k·partials hashes per group, never the value stream.

    When ``partial_col`` is given the rollup DEMONSTRATES the merge:
    per-(group, partial) survivors union → per-group bottom-k —
    IDENTICAL to sketching the group directly (asserted in tests).
    Groups with < k distinct values report the exact count (u_k
    undefined); ``within_tol`` flags |est − exact|/exact ≤ 3/√k (the
    standard KMV standard-error bound, ~37% at k=64)."""
    from pyspark.sql import Window

    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("\x1f", F.lit(seed), F.col("val"))), 1, 13
                ),
                16,
                10,
            ).cast("long")
            + 1
        )
        / F.lit(float((1 << 52) + 1))
    )
    base = df.select(
        F.col(group_col).alias("g"),
        *( [F.col(partial_col).alias("p")] if partial_col else [] ),
        F.col(value_col).cast("string").alias("val"),
    ).dropDuplicates(["g", "val"] if not partial_col else ["g", "p", "val"])
    hashed = base.withColumn("__u", u)
    if partial_col:
        wp = Window.partitionBy("g", "p").orderBy("__u", "val")
        survivors = (
            hashed.withColumn("__rn", F.row_number().over(wp))
            .filter(F.col("__rn") <= k)
            .select("g", "val", "__u")
            # a value may survive in several partials; the merged
            # bottom-k needs each distinct value once
            .dropDuplicates(["g", "val"])
        )
    else:
        survivors = hashed.select("g", "val", "__u")
    wg = Window.partitionBy("g").orderBy("__u", "val")
    sk = (
        survivors.withColumn("__rn", F.row_number().over(wg))
        .filter(F.col("__rn") <= k)
        .groupBy("g")
        .agg(F.max("__u").alias("kth_u"), F.count(F.lit(1)).alias("__n_sk"))
    )
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count_distinct(F.col(value_col)).alias("n_exact")
    )
    est = F.when(
        F.col("__n_sk") < k, F.col("__n_sk").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("kth_u"))
    tol = 3.0 / (k ** 0.5)
    return (
        exact.join(sk, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.round(F.col("kth_u"), 12).alias("kth_u"),
            F.round(est, 4).alias("est_distinct"),
            (
                F.abs(est - F.col("n_exact"))
                / F.col("n_exact").cast("double")
                <= F.lit(tol)
            ).alias("within_tol"),
        )
    )


def cms_point_estimates(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    partial_col: str | None = None,
    depth: int = 3,
    width: int = 512,
    top_n: int = 3,
    seed: str = "cms0",
) -> DataFrame:
    """Mergeable COUNT-MIN frequency sketch with point-query estimates →
    (group, key, n_exact, est_cnt, overcount, within_eps).

    The Count-Min sketch (Cormode-Muthukrishnan): ``depth`` hash rows of
    ``width`` counters; every occurrence of a value increments counter
    ``h_j(value)`` in each row; the point estimate for a key is the MIN
    over rows of its counters — an OVERestimate by construction (each
    counter holds the key's true count plus nonneg collision mass), with
    the ε·N guarantee (ε = e/width) holding per row with prob 1−1/e.

    Next to :func:`kmv_distinct_rollup` (distinct counts) this covers
    the other warehouse sketch axis — per-key FREQUENCIES — with the
    same two engineering properties:

    - **Bit-exact cross-engine**: bucket ids are content-addressed md5
      integer arithmetic (top 13 hex digits mod ``width`` — the
      q80/t36 discipline), counters are integer sums, the estimate is
      an integer MIN: every output column replays exactly in ANSI SQL,
      no tolerance band needed even for the sketch internals.
    - **Mergeable by construction**: counters are sums, so per-
      ``partial_col`` (e.g. per-day) sketches roll up to the group
      total by elementwise addition — the map-combinable shape.  After
      the map-side combine the shuffle carries at most
      ``depth·width·partials`` counter rows per group, never the value
      stream.

    Point queries probe the ``top_n`` exact-heaviest keys per group
    (deterministic ``(count DESC, value ASC)`` tie-break): the tiny
    probe set (groups × top_n × depth rows) broadcasts against the
    bounded counter table, so query cost is independent of corpus size.
    ``overcount = est − exact ≥ 0`` always; ``within_eps`` checks the
    3·N/width bound (3 > e, integer arithmetic on both engines).
    """
    from pyspark.sql import Window

    def bucket(j_col: F.Column, val_col: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f", F.lit(seed), j_col.cast("string"), val_col
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    base = df.select(
        F.col(group_col).alias("g"),
        *([F.col(partial_col).alias("p")] if partial_col else []),
        F.col(value_col).cast("string").alias("val"),
    )
    rows = base.withColumn(
        "__j", F.explode(F.array(*[F.lit(j) for j in range(depth)]))
    ).withColumn("__b", bucket(F.col("__j"), F.col("val")))
    partial_keys = ["g"] + (["p"] if partial_col else []) + ["__j", "__b"]
    partials = rows.groupBy(*partial_keys).count()
    counters = partials.groupBy("g", "__j", "__b").agg(
        F.sum("count").alias("__c")
    )

    exact = base.groupBy("g", "val").agg(F.count(F.lit(1)).alias("n_exact"))
    wq = Window.partitionBy("g").orderBy(F.desc("n_exact"), "val")
    queries = (
        exact.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= top_n)
        .select("g", "val", "n_exact")
    )
    probe = queries.withColumn(
        "__j", F.explode(F.array(*[F.lit(j) for j in range(depth)]))
    ).withColumn("__b", bucket(F.col("__j"), F.col("val")))
    est = (
        counters.join(F.broadcast(probe), ["g", "__j", "__b"])
        .groupBy("g", "val", "n_exact")
        .agg(F.min("__c").alias("__est"))
    )
    # N per group rides the COUNTER TABLE, not a third corpus pass:
    # every base row increments exactly one bucket of hash row j=0, so
    # the row-0 counters sum to the exact group total (integer-exact);
    # this consumer shares the counters exchange with `est`
    # (scripts/audit_corpus_passes.py measured the old base.groupBy
    # total as a third full scan)
    totals = (
        counters.filter(F.col("__j") == 0)
        .groupBy("g")
        .agg(F.sum("__c").alias("__n_tot"))
    )
    return est.join(totals, "g").select(
        F.col("g").alias(group_col),
        F.col("val").alias("key"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("__est").cast("long").alias("est_cnt"),
        (F.col("__est") - F.col("n_exact")).cast("long").alias("overcount"),
        (
            (F.col("__est") - F.col("n_exact")) * F.lit(width)
            <= F.lit(3) * F.col("__n_tot")
        ).alias("within_eps"),
    )


def kll_quantile_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tag_col: str,
    *,
    partial_col: str | None = None,
    k: int = 256,
    seed: str = "kll0",
    probs: tuple[tuple[int, int], ...] = ((1, 4), (1, 2), (3, 4)),
    audit: bool = False,
) -> DataFrame:
    """Mergeable KLL-STYLE quantile sketch rollup → (group, n_exact,
    t_level, m_kept, est_n, q*_est per prob[, q50_rank, within_tol
    when ``audit=True``]).

    The missing member of the sketch family next to HLL (q63), KMV
    (q80), CMS (q81) and Misra-Gries (t26): a bounded summary from
    which any quantile can be read WITHOUT re-scanning the data, and
    which MERGES across partitions/partials/days so a 100 TB percentile
    rollup is one map-combinable pass.

    It is the sampler layer of KLL (Karnin-Lang-Liberty, FOCS 2016)
    derandomized: KLL assigns each item a geometric level by coin
    flips and subsamples at rate 2^-T.  Here the coin flips are
    CONTENT-ADDRESSED — level(row) = trailing zero bits of the md5
    integer of the row's unique tag (the q80/t36 discipline), so
    P(level ≥ ℓ) = 2^-ℓ exactly, and the sketch is a deterministic
    function of the ROW SET:

    - ``T`` = 0 if n ≤ k else 1 + max{ℓ : |{level ≥ ℓ}| > k}; the
      sketch keeps the rows with level ≥ T (≤ k of them), each
      standing for 2^T rows.
    - **Merge = recompute over survivors**: for any split into
      partials, T* of the union ≥ every partial T (counts only grow),
      so every row with level ≥ T* survived its partial and the
      per-level counts at ℓ ≥ max(T_p) are COMPLETE in the survivor
      union — merging per-partial sketches yields the IDENTICAL row
      set, T, and estimates as sketching the union directly, in any
      merge order.  That theorem is what upgrades the oracle from a
      tolerance band to a full value replay: Spark computes the
      per-``partial_col`` rollup, the oracle sketches directly, and
      the driver's hash compare IS the merge-invariance proof (same
      licence as q80's bottom-k).
    - KLL's compactor hierarchy buys ε ~ 1/k instead of sampling's
      ε ~ 1/sqrt(k), but its compactions depend on buffer/merge order
      — irreconcilable with a bit-exact cross-engine oracle.  This
      sketch trades that constant for determinism and keeps the shape
      (geometric levels, adaptive threshold, power-of-two weights).

    Quantile at p = num/den: the r-th smallest kept value with
    r = (m−1)·num div den + 1 (integer arithmetic; the q92
    row_number-rank convention, deterministic in both engines).
    Exact when T = 0 (n ≤ k) — the exact-fallback.  ``audit=True``
    appends the QA columns the oracle replays — ``q50_rank`` = CDF of
    the p=.5 estimate, ``within_tol`` = |q50_rank − .5| ≤ 1.5/sqrt(m)
    (DKW bound at confidence ~98%) — at the cost of ONE EXTRA FULL
    corpus pass (the CDF rank-back join); it defaults OFF because a
    100 TB caller wants the two-pass sketch build and the sketch
    columns only.  ``m_kept`` = 0 (all estimates NULL) is the
    measure-zero collapse where the top level empties; deterministic
    on both engines.

    Scale shape: the shuffle carries per-(group, level) COUNTS (≤ 53
    longs per group) plus ≤ k survivor rows per partial — never the
    value stream; level assignment is a row-local JVM expression
    (md5 + bit_count), survivors prune at the scan side of the
    shuffle.  State/output is O(k) per group regardless of n;
    corpus passes: 2 (``audit=False``) or 3 (``audit=True``).
    """
    from pyspark.sql import Window

    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit(seed), F.col("tag"))), 1, 13
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            *([F.col(partial_col).alias("p")] if partial_col else []),
            F.col(tag_col).cast("string").alias("tag"),
            F.col(value_col).cast("double").alias("val"),
        )
    )
    # lvl is non-null by construction (md5 of a non-null concat); the
    # explicit filter is a semantic no-op that UNIFIES the inferred
    # isnotnull(lvl) constraint across every consumer — without it,
    # consumers that filter `lvl >= t` get the constraint pushed into
    # their scan while plain count consumers don't, the subtrees stop
    # being canonically equal, and exchange reuse (what holds the build
    # at two corpus passes) silently breaks.
    hashed = base.withColumn("h", h).withColumn(
        "lvl", F.expr("bit_count((h & -h) - 1)")
    ).filter(F.col("lvl").isNotNull())

    def _ns_join(
        left: DataFrame,
        right: DataFrame,
        cols: list[str],
        how: str = "inner",
        *,
        bcast: bool = False,
    ) -> DataFrame:
        # null-safe equi-join: a plain name-list join silently drops a
        # legitimate NULL group key (the q94/q98 gotcha).  Right-side
        # keys are renamed first — every frame here derives from the
        # same scan, so left[c]/right[c] resolve to the SAME attribute
        # and the join condition would be trivially true.  bcast=True
        # marks group-sized right sides (thresholds, summaries): the
        # data stream must NEVER shuffle to meet an O(groups) table.
        r = right
        for c in cols:
            r = r.withColumnRenamed(c, f"__r_{c}")
        if bcast:
            r = F.broadcast(r)
        cond = None
        for c in cols:
            t = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
            cond = t if cond is None else (cond & t)
        return left.join(r, cond, how).drop(*[f"__r_{c}" for c in cols])

    def _threshold(cnts: DataFrame, keys: list[str], floor_df: DataFrame | None) -> DataFrame:
        # canonical T from a per-(keys, lvl) COUNTS table `cnts`
        # (columns *keys, lvl, c): 0 (or the merge floor) when
        # everything fits, else one past the deepest over-capacity
        # level.  The threshold is a pure function of the counts —
        # NEVER of the raw rows — which is what caps the whole sketch
        # build at two corpus passes.  cum uses a DESC running frame
        # (the unbounded-FOLLOWING ban).
        w = Window.partitionBy(*keys).orderBy(F.desc("lvl"))
        cum = cnts.withColumn("cum", F.sum("c").over(w))
        t = cum.groupBy(*keys).agg(
            F.sum("c").alias("n_rows"),
            F.max(F.when(F.col("cum") > k, F.col("lvl"))).alias("__mb"),
        )
        if floor_df is not None:
            t = _ns_join(t, floor_df, ["g"])
            fl = F.col("floor_lvl")
        else:
            fl = F.lit(0)
        return t.select(
            *keys,
            F.when(F.col("n_rows") <= k, fl)
            .otherwise(F.col("__mb") + 1)
            .cast("int")
            .alias("t_lvl"),
            "n_rows",
        )

    # CORPUS PASS 1: per-(group[, partial], level) counts.  Everything
    # threshold-shaped (per-partial T, merge floor, group T, n_exact)
    # derives from this one tiny table — ≤ 53 level rows per group —
    # so no threshold computation ever touches the corpus again.
    if partial_col:
        cnts = hashed.groupBy("g", "p", "lvl").agg(F.count(F.lit(1)).alias("c"))
        tp = _threshold(cnts, ["g", "p"], None)
        floor_df = tp.groupBy("g").agg(F.max("t_lvl").alias("floor_lvl"))
        nx = tp.groupBy("g").agg(F.sum("n_rows").alias("n_exact"))
        # survivor level counts — filter the COUNTS table by the
        # per-partial thresholds + merge floor, then re-aggregate to
        # (g, lvl); the group threshold reads these, not the rows
        scnt = (
            _ns_join(cnts, tp.drop("n_rows"), ["g", "p"], bcast=True)
            .filter(F.col("lvl") >= F.col("t_lvl"))
            .drop("t_lvl")
            )
        scnt = (
            _ns_join(scnt, floor_df, ["g"], bcast=True)
            .filter(F.col("lvl") >= F.col("floor_lvl"))
            .groupBy("g", "lvl")
            .agg(F.sum("c").alias("c"))
        )
        tg_full = _threshold(scnt, ["g"], floor_df)
        tg = tg_full.drop("n_rows")
        # CORPUS PASS 2: survivor-row selection — every filter table
        # broadcasts (group- or partial-sized), the value stream never
        # shuffles to meet them
        kept = (
            _ns_join(hashed, tp.drop("n_rows"), ["g", "p"], bcast=True)
            .filter(F.col("lvl") >= F.col("t_lvl"))
            .drop("t_lvl", "p")
        )
        kept = _ns_join(kept, floor_df, ["g"], bcast=True).filter(
            F.col("lvl") >= F.col("floor_lvl")
        ).drop("floor_lvl")
        kept = _ns_join(kept, tg, ["g"], bcast=True).filter(
            F.col("lvl") >= F.col("t_lvl")
        )
    else:
        cnts = hashed.groupBy("g", "lvl").agg(F.count(F.lit(1)).alias("c"))
        floor_df = None
        tg_full = _threshold(cnts, ["g"], None)
        nx = tg_full.select("g", F.col("n_rows").alias("n_exact"))
        tg = tg_full.drop("n_rows")
        # CORPUS PASS 2 (direct)
        kept = _ns_join(hashed, tg, ["g"], bcast=True).filter(
            F.col("lvl") >= F.col("t_lvl")
        )

    # kept-set stats ride ONE window exchange (hash-partition by g over
    # ≤ k rows/group): m_kept = max(rn) from the same ranking that
    # selects the quantile rows, so both aggregates reuse the exchange
    # instead of re-deriving kept from the scan (t_lvl comes from tg —
    # no per-row carry needed)
    wq = Window.partitionBy("g").orderBy("val", "tag")
    ranked = kept.select("g", "val", "tag").withColumn(
        "rn", F.row_number().over(wq)
    )
    mdf = ranked.groupBy("g").agg(F.max("rn").alias("m_kept"))
    qcols = [
        (f"q{100 * num // den}_est", num, den) for num, den in probs
    ]
    qsel = _ns_join(ranked, mdf, ["g"], bcast=True).groupBy("g").agg(
        *[
            F.max(
                F.when(
                    F.col("rn")
                    == F.expr(f"((m_kept - 1) * {num}) div {den}") + 1,
                    F.col("val"),
                )
            ).alias(name)
            for name, num, den in qcols
        ]
    )
    # groups whose kept set is empty keep their tg row (t_lvl) with
    # m_kept = 0 and NULL estimates
    summ = _ns_join(
        _ns_join(tg, mdf, ["g"], how="left"), qsel, ["g"], how="left"
    ).withColumn("m_kept", F.coalesce(F.col("m_kept"), F.lit(0)))
    # LEFT join from nx: in the merged (partial_col) path a group can
    # collapse entirely — every per-partial survivor sits below the
    # merge floor, surv is empty for the group, and tg carries no row.
    # An inner join here would DELETE the group while the direct sketch
    # emits it (t_level = floor, m_kept = 0): the merge theorem gives
    # T_union == floor exactly when the floor-filtered survivor set is
    # empty (counts at ℓ ≥ floor are complete and total 0 ≤ k, so
    # T_union ≤ floor; T_union ≥ every partial T always).  Probability
    # ~2^-k per group — unreachable at k=256, but the merge==direct
    # contract must hold for every k.
    summ = _ns_join(nx, summ, ["g"], how="left")
    if partial_col:
        summ = (
            _ns_join(summ, floor_df, ["g"], how="left", bcast=True)
            .withColumn("t_lvl", F.coalesce(F.col("t_lvl"), F.col("floor_lvl")))
            .drop("floor_lvl")
        )
    summ = summ.withColumn("m_kept", F.coalesce(F.col("m_kept"), F.lit(0)))
    sketch_cols = [
        F.col("g").alias(group_col),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("t_lvl").alias("t_level"),
        F.col("m_kept").cast("long").alias("m_kept"),
        (
            F.col("m_kept")
            * F.expr("shiftleft(cast(1 as bigint), cast(t_lvl as int))")
        ).cast("long").alias("est_n"),
        *[F.col(name) for name, _, _ in qcols],
    ]
    if not audit:
        # production path: the sketch is built in TWO corpus passes
        # (per-partial threshold counts + survivor selection); the
        # q50-CDF audit below is a THIRD full pass — at 100 TB that is
        # the single largest avoidable cost, so it is opt-in.
        return summ.select(*sketch_cols)
    # the CDF reads q50_est from qsel, NOT from summ: pruning summ to
    # (g, q50_est) degenerates the n_exact aggregate into DISTINCT(g)
    # straight over the raw scan — an entire extra corpus pass that
    # exchange reuse can't save (the collapsed aggregate no longer
    # matches the counts subtree).  qsel shares the kept-window
    # exchange with the main chain, so this branch costs only the
    # unavoidable CDF scan of base.  LEFT join because collapsed
    # groups have no qsel row (their q50_rank is NULL either way).
    rank50 = _ns_join(base, qsel.select("g", "q50_est"), ["g"], bcast=True).groupBy("g").agg(
        (
            F.sum(F.when(F.col("val") <= F.col("q50_est"), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("__r50")
    )
    out = _ns_join(summ, rank50, ["g"], how="left")
    return out.select(
        *sketch_cols,
        F.when(F.col("m_kept") > 0, F.round(F.col("__r50"), 6)).alias("q50_rank"),
        F.when(F.col("m_kept") > 0,
               F.abs(F.col("__r50") - F.lit(0.5))
               <= F.lit(1.5) / F.sqrt(F.col("m_kept").cast("double"))
        ).alias("within_tol"),
    )
