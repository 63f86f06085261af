"""Deterministic sampling / splitting for training-data pipelines.

Random `df.sample()` is non-reproducible across engines, partitionings
and reruns; training pipelines need CONTENT-ADDRESSED sampling so a
document lands in the same split everywhere, forever.  Everything here
keys on `md5(content)` — identical bytes-in/hex-out in Spark and DuckDB
(and effectively every engine), so results are oracle-checkable and
re-runs are stable even if the corpus is re-partitioned or re-ordered.

Scale notes (100 TB):
- `hash_sample` / `hash_split` are stateless per-row filters — no
  shuffle, fully pushdown-friendly, embarrassingly parallel.
- `stratified_take` is a per-key top-n over the hash order: one
  shuffle on the stratum key; the window never sees more than a
  stratum's rows, and hash-ordering makes the selection deterministic
  (not "whichever rows the scan met first").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def content_hash(col: F.Column) -> F.Column:
    """Lowercase hex md5 of the column's string form — the stable,
    engine-portable sort/sample key."""
    return F.md5(col.cast("string"))


def hash_sample(df: DataFrame, col: str, *, rate_16ths: int) -> DataFrame:
    """Keep rows whose content hash falls in the first ``rate_16ths``/16
    of hash space (first hex digit < rate) — a deterministic ~rate/16
    sample.  Pure filter: no shuffle, no state, same rows on any
    engine/partitioning."""
    if not 0 < rate_16ths <= 16:
        raise ValueError("rate_16ths must be in 1..16")
    if rate_16ths == 16:
        # the hex-string comparison below would test `hash < "10"`, which
        # lexicographically keeps only hashes starting with "0" (~1/16);
        # 16/16 means the whole frame.
        return df
    return df.filter(content_hash(F.col(col)) < format(rate_16ths, "x"))


def hash_split(
    df: DataFrame,
    col: str,
    *,
    splits: list[tuple[str, int]] = (("test", 1), ("valid", 2), ("train", 13)),
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label by hash-space bands (16ths must sum
    to 16).  Content-addressed: a document keeps its split across runs,
    engines, and corpus growth."""
    splits = list(splits)
    if sum(w for _, w in splits) != 16:
        raise ValueError("split 16ths must sum to 16")
    h = content_hash(F.col(col))
    # CASE from the low end: [0, w0) -> name0, [w0, w0+w1) -> name1, ...
    bound = 0
    expr = None
    for name, w in splits:
        bound += w
        cond = h < format(bound, "x") if bound < 16 else F.lit(True)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


_HEX_DIGITS = {16: 1, 256: 2, 4096: 3, 65536: 4}


def mixture_sample(
    df: DataFrame,
    *,
    domain_col: str,
    size_col: str,
    key_col: str,
    granularity: int = 4096,
    rate_col: str | None = None,
) -> DataFrame:
    """Rebalance a multi-domain corpus toward a UNIFORM per-domain size
    budget by content-addressed downsampling — the "domain mixture" step
    of a training-data pipeline (each source should contribute ~equal
    mass; over-represented domains are thinned, small ones kept whole).

    Per domain: ``rate = min(g, (total_size * g) DIV (n_domains *
    domain_size))`` in pure integer arithmetic (g = ``granularity``), so
    the rate — and therefore the exact sampled row set — is reproducible
    on any engine from the same corpus, with no float in the loop.  A
    row is kept iff ``rate == g`` (domain at/below budget: keep all) or
    the first hex digits of ``md5(key)`` fall below the rate's hex form —
    the same hash-band filter as `hash_sample`, at 1/g resolution.

    Scale shape: two tiny aggregates (one row per domain / one row
    total) broadcast back onto the corpus; the sample itself is a
    stateless per-row filter.  No corpus-sized shuffle at any size.

    ``rate_col`` optionally exposes the per-row integer rate for
    reporting.
    """
    if granularity not in _HEX_DIGITS:
        raise ValueError(f"granularity must be one of {sorted(_HEX_DIGITS)}")
    g, nd = granularity, _HEX_DIGITS[granularity]
    # source contract: rows without a domain can't join a per-domain
    # rate and were already dropped by the final equi-join — filtering
    # HERE makes that explicit (the size budget is over identified
    # domains) and unifies the isnotnull(domain) constraint across the
    # domain-size aggregate's two consumers: the rates join pushes it
    # into one copy of the aggregate subtree while the totals branch
    # doesn't, splitting the shared exchange into two corpus reads
    # (scripts/audit_corpus_passes.py: 3 passes before, 2 after).
    df = df.filter(F.col(domain_col).isNotNull())
    dom = df.groupBy(domain_col).agg(F.sum(size_col).cast("long").alias("__dom_sz"))
    tot = dom.agg(
        F.sum("__dom_sz").cast("long").alias("__tot"),
        F.count(F.lit(1)).alias("__nd"),
    )
    rates = (
        dom.join(F.broadcast(tot))
        .select(
            domain_col,
            F.least(
                F.lit(g).cast("long"),
                F.expr(f"(__tot * {g}) DIV (__nd * __dom_sz)"),
            ).alias("__rate"),
        )
    )
    out = df.join(F.broadcast(rates), domain_col)
    keep = (F.col("__rate") >= g) | (
        F.substring(content_hash(F.col(key_col)), 1, nd)
        < F.format_string(f"%0{nd}x", F.col("__rate"))
    )
    out = out.filter(keep)
    if rate_col is not None:
        return out.withColumnRenamed("__rate", rate_col)
    return out.drop("__rate")


def stratified_take(
    df: DataFrame, key: str, *, n_per_key: int, order_col: str
) -> DataFrame:
    """Deterministic per-stratum sample: the ``n_per_key`` rows with the
    smallest content hash within each ``key`` group.  Hash order makes
    the choice content-addressed; ties broken by the hash itself (md5
    collisions aside, none)."""
    w = Window.partitionBy(key).orderBy(content_hash(F.col(order_col)))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_key)
        .drop("__rn")
    )


def training_shuffle(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic global shuffle for training: every row gets a
    `shuffle_rank` — its position in the corpus ordered by
    ``md5(seed || id)`` — reproducible across engines, partitionings and
    reruns, and re-seedable per epoch.

    A naive ``row_number() OVER (ORDER BY key)`` is a single-task global
    window; this is the scalable two-phase form (same shape as
    `packing.pack_offsets`): md5 keys are uniform, so their first two
    hex chars give 256 ORDERED range buckets (hex digits sort
    lexicographically = numerically) — per-bucket counts are a tiny
    aggregate, the driver turns them into exclusive prefix offsets, and
    a parallel per-bucket row_number plus the bucket offset is the
    global rank."""
    key = F.md5(F.concat_ws("\x1f", F.lit(seed), F.col(id_col).cast("string")))
    b = (
        df.select(F.col(id_col))
        .withColumn("__key", key)
        .withColumn("__bucket", F.conv(F.substring("__key", 1, 2), 16, 10).cast("long"))
    )
    counts = {
        r["__bucket"]: r["c"]
        for r in b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    prefix, acc = {}, 0
    for k in sorted(counts):
        prefix[k] = acc
        acc += int(counts[k])
    spark = df.sparkSession
    prefix_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in prefix.items()], "__bucket long, __pre long"
        )
    )
    w = Window.partitionBy("__bucket").orderBy("__key", id_col)
    return (
        b.join(prefix_df, "__bucket")
        .withColumn("shuffle_rank", F.col("__pre") + F.row_number().over(w) - 1)
        .select(id_col, "shuffle_rank")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Weighted sampling without replacement via A-Res (Efraimidis &
    Spirakis): each row gets key u^(1/w) — equivalently ln(u)/w — with
    ``u`` CONTENT-ADDRESSED from md5(seed ‖ id) instead of a RNG, so
    the sample is bit-reproducible across engines, partitionings, and
    reruns (the training-data mixture primitive: sample documents
    proportionally to length/quality without a shuffle-order
    dependency).  Returns the top-``k`` rows by key →
    (id, weight, score, rank).

    u = (first 13 md5 hex digits + 1) / (2^52 + 1) ∈ (0, 1] — integer
    arithmetic and one IEEE division, exactly replayable in SQL; rows
    with non-positive weight are excluded (ln(u)/w would flip sign).

    Scale shape: stateless per-row scoring, then ONE TakeOrdered
    top-k (per-partition heaps, no global sort, no single-task
    window); the k-row rank stamp runs on the collected winners."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed), F.lit("\x1f"), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(float(2**52 + 1))
    score = F.log(u) / F.col(weight_col)
    scored = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).alias("weight"),
            score.alias("__score"),
        )
        .orderBy(F.col("__score").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("__score").desc(), F.col(id_col))
    return scored.select(
        id_col,
        "weight",
        F.round("__score", 6).alias("score"),
        F.row_number().over(w).alias("rank"),
    )
