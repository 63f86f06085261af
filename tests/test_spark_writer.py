"""Distributed GraphAr writer round trip: DataFrame → spark_writer →
reader/catalog, cross-checked against ground-truth arrays and against the
driver-side fixture writer's output for the same graph."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tests.conftest import make_graph_arrays


@pytest.fixture(scope="module")
def dist_graph(spark, tmp_path_factory):
    from duckdb_graphar_spark.graphar.spark_writer import write_graph_dist

    n = 500
    src, dst = make_graph_arrays(n)
    vdf = spark.createDataFrame(
        [(int(i), f"p{i}", float(i) * 0.5) for i in range(n)],
        "_graphArVertexIndex long, name string, score double",
    )
    edf = spark.createDataFrame(
        [(int(s), int(d), int(s * 1000 + d)) for s, d in zip(src, dst)],
        "_graphArSrcIndex long, _graphArDstIndex long, weight long",
    )
    out = str(tmp_path_factory.mktemp("dist_graphar"))
    gy = write_graph_dist(
        out,
        "Dist",
        {"Person": vdf},
        {("Person", "knows", "Person"): edf},
        vertex_chunk_size=64,
        edge_chunk_size=256,
        aligned_chunk_size=64,
    )
    return {"yaml": gy, "n": n, "src": src, "dst": dst}


def test_vertex_round_trip(spark, dist_graph):
    from duckdb_graphar_spark import graphar

    v = graphar.read_vertices(spark, dist_graph["yaml"], "Person")
    assert v.count() == dist_graph["n"]
    rows = v.filter("_graphArVertexIndex IN (0, 63, 64, 499)").orderBy(
        "_graphArVertexIndex"
    ).collect()
    assert [(r["_graphArVertexIndex"], r["name"], r["score"]) for r in rows] == [
        (0, "p0", 0.0),
        (63, "p63", 31.5),
        (64, "p64", 32.0),
        (499, "p499", 249.5),
    ]


def test_edge_round_trip_and_point_lookup(spark, dist_graph):
    from duckdb_graphar_spark import graphar

    e = graphar.read_edges(spark, dist_graph["yaml"], "Person", "knows", "Person")
    assert e.count() == len(dist_graph["src"])
    vid = 42
    expect = sorted(dist_graph["dst"][dist_graph["src"] == vid].tolist())
    got = [
        r["_graphArDstIndex"]
        for r in e.filter(F.col("_graphArSrcIndex") == vid)
        .orderBy("_graphArDstIndex")
        .collect()
    ]
    assert got == expect


def test_edge_properties_aligned(spark, dist_graph):
    from duckdb_graphar_spark import graphar

    e = graphar.read_edges(spark, dist_graph["yaml"], "Person", "knows", "Person")
    bad = e.filter(
        F.col("weight") != F.col("_graphArSrcIndex") * 1000 + F.col("_graphArDstIndex")
    ).count()
    assert bad == 0


def test_offsets_match_degrees(spark, dist_graph):
    from duckdb_graphar_spark.operators.graph import degrees_from_offsets

    deg = degrees_from_offsets(spark, dist_graph["yaml"], "Person", "knows", "Person")
    got = {r["grapharId"]: r["degree"] for r in deg.collect()}
    src = dist_graph["src"]
    for v in [0, 1, 42, 499]:
        assert got[v] == int((src == v).sum()), f"vertex {v}"


def test_csc_layout_round_trip(spark, dist_graph):
    """The ordered_by_dest layout must answer dst-point-lookups."""
    from duckdb_graphar_spark.graphar.reader import read_edges

    vid = 7
    e = read_edges(
        spark, dist_graph["yaml"], "Person", "knows", "Person", dst_vid=vid
    )
    expect = sorted(dist_graph["src"][dist_graph["dst"] == vid].tolist())
    got = sorted(r["_graphArSrcIndex"] for r in e.collect())
    assert got == expect


def test_matches_driver_writer(spark, tmp_path, dist_graph):
    """Same logical graph through the driver-side fixture writer reads
    back identically (layout compatibility of the two writers)."""
    import pyarrow as pa

    from duckdb_graphar_spark import graphar
    from duckdb_graphar_spark.graphar import EdgeSpec, VertexSpec, write_graph

    n, src, dst = dist_graph["n"], dist_graph["src"], dist_graph["dst"]
    vt = pa.table(
        {
            "name": pa.array([f"p{i}" for i in range(n)], pa.string()),
            "score": pa.array([i * 0.5 for i in range(n)], pa.float64()),
        }
    )
    gy2 = write_graph(
        str(tmp_path),
        "Ref",
        {"Person": VertexSpec(vt, chunk_size=64, property_groups=[["name"], ["score"]])},
        {
            ("Person", "knows", "Person"): EdgeSpec(
                src,
                dst,
                chunk_size=256,
                src_chunk_size=64,
                dst_chunk_size=64,
                properties=pa.table({"weight": pa.array((src * 1000 + dst).astype("int64"))}),
            )
        },
    )
    for args in [("Person",)]:
        a = graphar.read_vertices(spark, dist_graph["yaml"], *args)
        b = graphar.read_vertices(spark, gy2, *args)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    ea = graphar.read_edges(spark, dist_graph["yaml"], "Person", "knows", "Person")
    eb = graphar.read_edges(spark, gy2, "Person", "knows", "Person")
    assert sorted(map(tuple, ea.collect())) == sorted(map(tuple, eb.collect()))


@pytest.mark.parametrize("file_type", ["orc", "csv"])
def test_dist_writer_multiformat(spark, tmp_path, file_type):
    """A4 on the DISTRIBUTED writer path: non-parquet chunk formats
    round-trip through the Arrow readers identically to parquet."""
    from duckdb_graphar_spark import graphar
    from duckdb_graphar_spark.graphar.spark_writer import write_graph_dist

    n = 130
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    vdf = spark.createDataFrame(
        [(int(i), f"p{i}") for i in range(n)], "_graphArVertexIndex long, name string"
    )
    edf = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)],
        "_graphArSrcIndex long, _graphArDstIndex long",
    )
    gy = write_graph_dist(
        str(tmp_path),
        "Fmt",
        {"Person": vdf},
        {("Person", "knows", "Person"): edf},
        vertex_chunk_size=64,
        edge_chunk_size=64,
        aligned_chunk_size=64,
        file_type=file_type,
    )
    v = graphar.read_vertices(spark, gy, "Person")
    assert v.count() == n
    assert v.filter(F.col("_graphArVertexIndex") == 7).collect()[0].name == "p7"
    e = graphar.read_edges(spark, gy, "Person", "knows", "Person", src_vid=42)
    assert [r._graphArDstIndex for r in e.collect()] == [43]


def test_with_dense_index(spark):
    from duckdb_graphar_spark.graphar.spark_writer import with_dense_index

    df = spark.createDataFrame(
        [(k, f"row{k}") for k in [5, 3, 9, 1, 7, 0, 8, 2, 6, 4]], "k long, s string"
    ).repartition(4)
    out = with_dense_index(df, ["k"], index_col="idx").collect()
    by_idx = sorted((r["idx"], r["k"]) for r in out)
    assert [i for i, _ in by_idx] == list(range(10))
    assert [k for _, k in by_idx] == list(range(10))  # index follows key order
