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


def test_greedy_pack_bins_recurrence_and_oversize(spark):
    """Hand-checked packing incl. the oversize corner: an over-budget
    doc takes its own bin AND its overflow pushes the next doc (even a
    zero-token one) into a fresh bin."""
    from pyspark.sql import functions as F

    from duckdb_graphar_spark.operators.packing import greedy_pack_bins

    rows = [
        # shard 0: 100, 200 -> breaks; 50 joins the 200-bin; 300 oversize;
        # 0-token doc lands in the bin AFTER the oversize; 10 joins it
        (0, 0, 100), (2, 0, 200), (4, 0, 50), (6, 0, 300), (8, 0, 0), (10, 0, 10),
        # shard 1: exactly-at-budget fills inclusively
        (1, 1, 256), (3, 1, 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tok long")
    got = {
        r.doc_id: (r.shard, r.bin, r.oversize)
        for r in greedy_pack_bins(
            df, id_col="doc_id", token_col="n_tok", shard_col="shard", budget=256
        ).collect()
    }
    assert got == {
        0: (0, 0, False),
        2: (0, 1, False),
        4: (0, 1, False),
        6: (0, 2, True),
        8: (0, 3, False),
        10: (0, 3, False),
        1: (1, 0, False),
        3: (1, 1, False),
    }


def test_greedy_pack_bins_budget_guard(spark):
    import pytest as _pt

    from duckdb_graphar_spark.operators.packing import greedy_pack_bins

    df = spark.createDataFrame([(1, 0, 5)], "doc_id long, shard long, n_tok long")
    with _pt.raises(ValueError, match="budget"):
        greedy_pack_bins(
            df, id_col="doc_id", token_col="n_tok", shard_col="shard", budget=0
        )
