"""Hypothesis property tests for the driver-side primitives that run as
pure Python/numpy (fast per-example, no Spark job per case): the real
image codecs and the vectorized driver BFS."""

import os
import sys

import numpy as np
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_graphar_spark.operators import multimodal as M
from duckdb_graphar_spark.operators.graph import _bfs_driver


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_random(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    d = M.decode_bmp(M.encode_bmp(px))
    assert d["width"] == w and d["height"] == h
    assert (d["pixels"] == px.reshape(-1)).all()


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
    comment=st.booleans(),
)
def test_ppm_roundtrip_random(w, h, seed, comment):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
    hdr = b"P6\n" + (b"# c\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    d = M.decode_ppm(hdr + px.tobytes())
    assert d["width"] == w and d["height"] == h
    assert (d["pixels"] == px).all()


def _py_bfs_ref(src, dst, s, t, max_depth):
    if s == t:
        return 0
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), []).append(int(b))
    frontier, seen, depth = {s}, {s}, 0
    while frontier and depth < max_depth:
        depth += 1
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w == t:
                    return depth
                if w not in seen:
                    seen.add(w)
                    nxt.add(w)
        frontier = nxt
    return -1


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_vectorized_bfs_matches_reference(data):
    n = data.draw(st.integers(2, 40))
    n_edges = data.draw(st.integers(0, 200))
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=n_edges)
    dst = rng.integers(0, n, size=n_edges)
    s = int(rng.integers(0, n))
    t = int(rng.integers(0, n))
    if s == t:
        return
    got = _bfs_driver(src, dst, s, t, 30)
    assert got == _py_bfs_ref(src, dst, s, t, 30)
