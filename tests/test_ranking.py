"""global_ntile: the two-phase distributed rank must equal Spark's own
single-task NTILE window on every fixture, including heavy value ties
(the case the range partitioner must split via the id tie-break)."""

import os
import sys

import pytest
from pyspark.sql import Window, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators.ranking import global_ntile


def _reference(df, value_col, id_col, tiles):
    w = Window.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    return {
        r["id"]: r["t"]
        for r in df.select(
            F.col(id_col).alias("id"), F.ntile(tiles).over(w).alias("t")
        ).collect()
    }


@pytest.mark.parametrize("tiles,n_buckets", [(5, 4), (3, 7), (1, 2), (7, 1)])
def test_global_ntile_matches_window_ntile(spark, tiles, n_buckets):
    # 83 rows, values with heavy ties (v = i % 4) — ids disambiguate
    rows = [(i, i % 4) for i in range(83)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["tile"]
        for r in global_ntile(
            df, value_col="v", id_col="id", tiles=tiles, n_buckets=n_buckets
        ).collect()
    }
    assert got == _reference(df, "v", "id", tiles)


def test_global_ntile_one_hot_value(spark):
    """Every row shares one value: only the id tie-break orders them,
    and the range partitioner must still split the 'partition'."""
    df = spark.createDataFrame([(i, 7) for i in range(40)], "id long, v long")
    got = {
        r["id"]: r["tile"]
        for r in global_ntile(
            df, value_col="v", id_col="id", tiles=4, n_buckets=8
        ).collect()
    }
    assert got == {i: (i // 10) + 1 for i in range(40)}


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1, 9), (2, 3), (3, 5)], "id long, v long")
    got = {
        r["id"]: r["tile"]
        for r in global_ntile(df, value_col="v", id_col="id", tiles=10).collect()
    }
    # ascending v order: 2 (v=3), 3 (v=5), 1 (v=9) -> buckets 1, 2, 3
    assert got == {2: 1, 3: 2, 1: 3}


def test_global_ntile_empty_and_guards(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert global_ntile(df, value_col="v", id_col="id", tiles=5).count() == 0
    with pytest.raises(ValueError, match="tiles"):
        global_ntile(df, value_col="v", id_col="id", tiles=0)
    with pytest.raises(ValueError, match="n_buckets"):
        global_ntile(df, value_col="v", id_col="id", tiles=5, n_buckets=0)
