"""As-of join: semantics vs a per-key pandas merge_asof oracle, equal-ts
inclusivity, inner/left variants, and the single-shuffle plan contract."""

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0),
        ("B", 2, 20.0), ("B", 8, 21.0),
    ]
    return spark.createDataFrame(rows, "sym string, qts long, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", 0, 100), ("A", 1, 101), ("A", 6, 102), ("A", 9, 103),
        ("B", 1, 200), ("B", 9, 201), ("C", 4, 300),
    ]
    return spark.createDataFrame(rows, "sym string, tts long, qty long")


def test_asof_left_matches_merge_asof(spark, trades, quotes):
    got = {
        (r["sym"], r["tts"]): r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"],
        ).collect()
    }
    tp = trades.toPandas().sort_values("tts")
    qp = quotes.toPandas().sort_values("qts")
    exp = pd.merge_asof(
        tp, qp, left_on="tts", right_on="qts", by="sym", direction="backward"
    )
    for _, row in exp.iterrows():
        e = None if pd.isna(row["px"]) else row["px"]
        assert got[(row["sym"], row["tts"])] == e
    assert len(got) == len(tp)


def test_asof_equal_ts_matches(spark, trades, quotes):
    # trade at t=1 sees the quote stamped t=1 (>= contract), t=9 sees t=9
    out = {
        (r["sym"], r["tts"]): r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"],
        ).collect()
    }
    assert out[("A", 1)] == 10.0
    assert out[("A", 9)] == 12.0


def test_asof_inner_drops_unmatched(spark, trades, quotes):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"], how="inner",
    )
    keys = {(r["sym"], r["tts"]) for r in out.collect()}
    assert ("A", 0) not in keys and ("C", 4) not in keys
    assert ("A", 1) in keys


def test_asof_single_shuffle(spark, trades, quotes):
    plan = (
        asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_asof_rejects_bad_how(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                  right_cols=["px"], how="full")


def test_asof_forward_matches_merge_asof(spark, trades, quotes):
    got = {
        (r["sym"], r["tts"]): r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"], direction="forward",
        ).collect()
    }
    exp = pd.merge_asof(
        trades.toPandas().sort_values("tts"),
        quotes.toPandas().sort_values("qts"),
        left_on="tts", right_on="qts", by="sym", direction="forward",
    )
    for _, row in exp.iterrows():
        want = None if pd.isna(row.px) else row.px
        assert got[(row.sym, row.tts)] == want


def test_asof_nearest_matches_merge_asof(spark, trades, quotes):
    got = {
        (r["sym"], r["tts"]): r["px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"], direction="nearest",
        ).collect()
    }
    exp = pd.merge_asof(
        trades.toPandas().sort_values("tts"),
        quotes.toPandas().sort_values("qts"),
        left_on="tts", right_on="qts", by="sym", direction="nearest",
    )
    for _, row in exp.iterrows():
        want = None if pd.isna(row.px) else row.px
        assert got[(row.sym, row.tts)] == want


def test_asof_nearest_single_exchange(spark, trades, quotes):
    """Both carries must share one hash partitioning on the key."""
    plan = (
        asof_join(
            trades, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_cols=["px"], direction="nearest",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                  right_cols=["px"], direction="sideways")


def test_gapfill_interpolates_linear(spark):
    """Series with buckets 0, 3 (values 10, 40): gaps at 1, 2 must be
    20 and 30; no edge rows (grid spans actuals)."""
    import datetime as dt

    from duckdb_graphar_spark.operators.asof import gap_fill_interpolate

    def ts(h):
        return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)

    df = spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(3), 40.0), (2, ts(5), 7.0)],
        "k long, ts timestamp, value double",
    )
    got = {
        (r.k, r.bucket_start.hour, r.kind): r.value
        for r in gap_fill_interpolate(df, key_col="k").collect()
    }
    assert got[(1, 0, "actual")] == 10.0
    assert got[(1, 1, "interp")] == 20.0
    assert got[(1, 2, "interp")] == 30.0
    assert got[(1, 3, "actual")] == 40.0
    assert got[(2, 5, "actual")] == 7.0
    assert len(got) == 5


def test_gapfill_sums_within_bucket(spark):
    import datetime as dt

    from duckdb_graphar_spark.operators.asof import gap_fill_interpolate

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 1.5), (1, base + dt.timedelta(minutes=30), 2.5)],
        "k long, ts timestamp, value double",
    )
    rows = gap_fill_interpolate(df, key_col="k").collect()
    assert len(rows) == 1 and rows[0].value == 4.0 and rows[0].kind == "actual"
