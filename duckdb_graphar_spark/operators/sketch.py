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
