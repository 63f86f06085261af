"""Sequence packing for training-data prep: concat-and-chunk offsets.

GPT-style packing concatenates the token streams of all documents in a
fixed order and slices the concatenation into fixed-size training
sequences.  The distributed primitive underneath is a **global exclusive
prefix sum** over the per-document token counts in document order —
which a naive `Window.orderBy(id)` (no partitionBy) computes on a
SINGLE task, a non-starter at 100 TB.

`pack_offsets` computes the same prefix sum scalably, the classic
two-phase scan:

1. range-bucket documents by id (`n_buckets` ≈ cluster parallelism);
2. one tiny map-combinable aggregate gives per-bucket token sums —
   `n_buckets` rows collected to the driver (bounded, like the
   GraphAr writer's chunk-count collect), turned into exclusive
   per-bucket prefix offsets, and broadcast back;
3. a per-bucket window cumsum (partitionBy bucket — parallel, each
   window sees only its bucket's rows) plus the bucket's prefix offset
   yields every document's global offset.

Everything else (first/last training-sequence index per document) is
arithmetic on the offset.  Deterministic: depends only on (id, tokens),
so a plain `SUM() OVER (ORDER BY id)` oracle verifies it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_offsets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str,
    budget: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Global token offset + training-sequence span per document.

    Documents are ordered by ``id_col``; ``token_col`` is each document's
    token count; ``budget`` is the training-sequence length.  Returns the
    input ids with:

    - ``n_tokens``  — the token count (long)
    - ``offset``    — exclusive prefix sum of tokens in id order
    - ``first_seq`` / ``last_seq`` — the first/last sequence index the
      document's tokens land in (``last_seq = first_seq - 1``-style empty
      span never occurs: zero-token docs get ``last_seq = first_seq``)
    - ``n_seqs``    — how many sequences the document straddles
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism

    base = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("n_tokens")
    )

    # range-bucket by id so within-bucket order + bucket order == global
    # id order (ids need not be dense — floor-division keeps ranges
    # ordered; heavy id clustering would skew buckets, documented)
    bounds = base.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds.lo is None:
        return base.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("offset"),
            F.lit(0).cast("long").alias("first_seq"),
            F.lit(0).cast("long").alias("last_seq"),
            F.lit(0).cast("long").alias("n_seqs"),
        )
    span = max(int(bounds.hi) - int(bounds.lo) + 1, 1)
    width = max(-(-span // n_buckets), 1)  # ceil
    b = base.withColumn(
        "__bucket", ((F.col(id_col) - F.lit(int(bounds.lo))) / width).cast("long")
    )

    # phase 1: per-bucket sums — tiny (n_buckets rows), map-combinable
    sums = {
        r["__bucket"]: r["s"]
        for r in b.groupBy("__bucket").agg(F.sum("n_tokens").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for k in sorted(sums):
        prefix[k] = acc
        acc += int(sums[k])
    prefix_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in prefix.items()], "__bucket long, __pre long"
        )
    )

    # phase 2: parallel within-bucket cumsum + broadcast prefix
    w = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        b.join(prefix_df, "__bucket")
        .withColumn("offset", F.col("__pre") + F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .drop("__bucket", "__pre")
    )
    first = (F.col("offset") / budget).cast("long")
    last = F.when(
        F.col("n_tokens") > 0,
        ((F.col("offset") + F.col("n_tokens") - 1) / budget).cast("long"),
    ).otherwise(first)
    return out.select(
        id_col,
        "n_tokens",
        "offset",
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + 1).alias("n_seqs"),
    )


def greedy_pack_bins(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str,
    shard_col: str,
    budget: int,
) -> DataFrame:
    """GREEDY sample packing WITHOUT document splitting → (id, shard,
    n_tokens, bin, oversize): walk each shard's documents in id order,
    appending to the current bin while the bin's token total stays
    within ``budget``; a document that would overflow starts a new bin.
    (The other standard packing next to :func:`pack_offsets`'s
    concat-and-chunk: no document straddles a training sequence, at the
    cost of padding waste.)

    The bin id is a CAPPED-ACCUMULATOR recurrence — each break depends
    on the bin total the previous breaks chose — which no
    gaps-and-islands window can express (q93's argument exactly).  And
    unlike the prefix-sum of pack_offsets it is inherently sequential
    PER SCAN, so the operator is sharded by contract: ``shard_col``
    (assign ``doc_id % k`` or a range bucket upstream) bounds every
    sequential scan, shards pack in parallel via one Arrow-batched
    applyInPandas, and bin ids are per-shard.  Per-shard the fold is
    vectorized q93-style: one cumulative token sum, then one
    ``searchsorted`` jump PER BIN (never per document) finds each
    break — O(bins) python steps over O(docs) numpy work.

    A single document larger than ``budget`` still gets its own bin,
    flagged ``oversize`` (the caller decides truncate-vs-drop);
    zero/negative budgets are rejected."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(shard_col, T.LongType(), False),
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("bin", T.LongType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )

    def pack(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort", ignore_index=True)
        toks = pdf["__tok"].to_numpy().astype(np.int64)
        n = len(toks)
        cum = np.cumsum(toks)
        bins = np.zeros(n, dtype=np.int64)
        start = 0  # first doc index of the current bin
        b = 0
        while True:
            # first index whose running total exceeds the bin's budget
            base = cum[start - 1] if start > 0 else 0
            nxt = int(np.searchsorted(cum, base + budget, side="right"))
            if nxt == start:
                nxt = start + 1  # oversize doc: alone in its bin
            bins[start:nxt] = b
            if nxt >= n:
                break
            start, b = nxt, b + 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                shard_col: pdf["__shard"].astype("int64"),
                "n_tokens": toks,
                "bin": bins,
                "oversize": toks > budget,
            }
        )

    flat = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(shard_col).cast("long").alias("__shard"),
        F.col(token_col).cast("long").alias("__tok"),
    )
    return flat.groupBy("__shard").applyInPandas(pack, out_schema)
