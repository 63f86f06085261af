"""Int8 quantization stats: invariants and edge cases."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators.embeddings import quantize_int8_stats


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0, 0.0]),
            (2, [-1.0, 0.5, 127.0]),
            (3, [1e-8, -1e-8]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_invariants(vecs):
    rows = {r.vec_id: r for r in quantize_int8_stats(vecs).collect()}
    assert rows[0].dim == 2 and abs(rows[0].norm - 5.0) < 1e-9
    # reconstruction error bounded by half a quantization step, always
    assert all(r.err_ok for r in rows.values())
    for r in rows.values():
        assert r.max_abs_err <= r.scale / 2 + 1e-9


def test_zero_vector(vecs):
    r = {x.vec_id: x for x in quantize_int8_stats(vecs).collect()}[1]
    assert r.scale == 0.0 and r.max_abs_err == 0.0 and r.norm == 0.0 and r.err_ok


def test_scale_is_absmax_over_127(vecs):
    r = {x.vec_id: x for x in quantize_int8_stats(vecs).collect()}[2]
    assert math.isclose(r.scale, 1.0, rel_tol=1e-9)  # absmax 127 → step 1.0
