"""GraphAr reader/writer/catalog tests (reference parity:
config/test/sql/graphar/{read_vertices,read_edges,attach}.test)."""

import numpy as np
import pytest

from duckdb_graphar_spark import graphar
from duckdb_graphar_spark.graphar.metadata import GraphInfo


def test_vertex_full_scan(spark, graph_fixture):
    v = graphar.read_vertices(spark, graph_fixture["yaml"], "Person")
    assert v.count() == graph_fixture["n"]
    rows = v.orderBy("_graphArVertexIndex").limit(3).collect()
    assert [r._graphArVertexIndex for r in rows] == [0, 1, 2]
    assert [r.name for r in rows] == ["p0", "p1", "p2"]
    # schema: index first, then flattened props (read_base.hpp:167-172)
    assert v.columns[0] == "_graphArVertexIndex"


def test_vertex_point_lookup(spark, graph_fixture):
    v = graphar.read_vertices(spark, graph_fixture["yaml"], "Person", vid=1234)
    rows = v.collect()
    assert len(rows) == 1 and rows[0].hash_phone_no == 1234


def test_vertex_point_lookup_out_of_range(spark, graph_fixture):
    with pytest.raises(ValueError):
        graphar.read_vertices(spark, graph_fixture["yaml"], "Person", vid=10**9)


def test_vertex_column_pruning(spark, graph_fixture):
    v = graphar.read_vertices(spark, graph_fixture["yaml"], "Person", columns=["score"])
    assert v.columns == ["_graphArVertexIndex", "score"]


def test_date_type_roundtrip(spark, graph_fixture):
    import datetime

    v = graphar.read_vertices(spark, graph_fixture["yaml"], "Person", vid=3)
    assert v.collect()[0].signup_date == datetime.date(2020, 1, 4)


def test_edge_full_scan(spark, graph_fixture):
    e = graphar.read_edges(spark, graph_fixture["yaml"], "Person", "knows", "Person")
    assert e.count() == len(graph_fixture["src"])
    assert e.columns == ["_graphArSrcIndex", "_graphArDstIndex"]


def test_edge_src_point_lookup(spark, graph_fixture):
    src, dst = graph_fixture["src"], graph_fixture["dst"]
    for vid in [0, 42, 997, 1999]:
        e = graphar.read_edges(
            spark, graph_fixture["yaml"], "Person", "knows", "Person", src_vid=vid
        )
        got = sorted(r._graphArDstIndex for r in e.collect())
        assert got == sorted(dst[src == vid].tolist()), vid


def test_edge_dst_point_lookup_uses_csc(spark, graph_fixture):
    src, dst = graph_fixture["src"], graph_fixture["dst"]
    vid = 7
    e = graphar.read_edges(
        spark, graph_fixture["yaml"], "Person", "knows", "Person", dst_vid=vid
    )
    got = sorted(r._graphArSrcIndex for r in e.collect())
    assert got == sorted(src[dst == vid].tolist())


def test_metadata_counts(graph_fixture):
    g = GraphInfo.load(graph_fixture["yaml"])
    assert g.vertex_count("Person") == graph_fixture["n"]
    ei = g.edges[("Person", "knows", "Person")]
    assert g.edge_count(ei) == len(graph_fixture["src"])


def test_attach_views(spark, graph_fixture):
    views = graphar.attach(spark, graph_fixture["yaml"])
    assert views == {"Person_vertex": "vertex", "Person_knows_Person_edge": "edge"}
    n = spark.sql("SELECT count(*) AS n FROM Person_vertex").collect()[0].n
    assert n == graph_fixture["n"]
    # arbitrary-property filter through SQL (read_vertices.test:12-15 parity)
    r = spark.sql(
        "SELECT _graphArVertexIndex FROM Person_vertex WHERE hash_phone_no = 42"
    ).collect()
    assert [x._graphArVertexIndex for x in r] == [42]
