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
    totals = base.groupBy("g").agg(F.count(F.lit(1)).alias("__n_tot"))
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
