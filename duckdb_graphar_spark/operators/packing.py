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
