"""pack_offsets: the scalable two-phase prefix sum must equal the naive
single-window cumsum, across bucket counts and edge cases."""

import pytest
from pyspark.sql import Window, functions as F

from duckdb_graphar_spark.operators.packing import pack_offsets


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, 10), (1, 0), (2, 100), (5, 63), (7, 1), (11, 64),
        (12, 65), (40, 7), (41, 0), (99, 130),
    ]
    return spark.createDataFrame(rows, "doc_id long, n_tok long").cache()


def _naive(df, budget):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    off = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    first = F.floor(off / budget)
    last = F.when(
        F.col("n_tok") > 0, F.floor((off + F.col("n_tok") - 1) / budget)
    ).otherwise(first)
    return df.select(
        "doc_id",
        F.col("n_tok").alias("n_tokens"),
        off.alias("offset"),
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + 1).alias("n_seqs"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n_buckets", [1, 3, 32])
def test_matches_naive_window(spark, docs, n_buckets):
    got = pack_offsets(
        docs, id_col="doc_id", token_col="n_tok", budget=64, n_buckets=n_buckets
    )
    assert _rows(got) == _rows(_naive(docs, 64))


def test_span_semantics(spark, docs):
    out = {
        r.doc_id: r
        for r in pack_offsets(
            docs, id_col="doc_id", token_col="n_tok", budget=64
        ).collect()
    }
    # doc 0 opens the stream
    assert out[0].offset == 0 and out[0].first_seq == 0 and out[0].n_seqs == 1
    # zero-token doc occupies no tokens but reports its position's seq
    assert out[1].n_tokens == 0 and out[1].n_seqs == 1
    assert out[1].first_seq == out[1].last_seq
    # a doc longer than the budget straddles >= 2 sequences
    assert out[2].n_seqs >= 2
    # offsets are dense: each offset == previous offset + previous tokens
    ordered = sorted(out.values(), key=lambda r: r.doc_id)
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.offset == prev.offset + prev.n_tokens


def test_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    assert pack_offsets(empty, id_col="doc_id", token_col="n_tok", budget=8).count() == 0


def test_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        pack_offsets(docs, id_col="doc_id", token_col="n_tok", budget=0)
