"""Catalog attach: expose every vertex/edge type of a GraphAr graph as
Spark temp views.

Parity with the reference's storage extension
(`ATTACH 'Graph.yaml' AS g (TYPE duckdb_graphar)`,
`src/storage/graphar_storage.cpp:19-41`), which materializes one
read-only catalog table per vertex/edge info named `{Type}.vertex` /
`{Src}_{edge}_{Dst}.edge` (`src/utils/func.cpp:55-63`,
`src/storage/graphar_table_set.cpp:48-97`).  Spark view names cannot
contain `.`, so the views are `{Type}_vertex` / `{Src}_{edge}_{Dst}_edge`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from duckdb_graphar_spark.graphar.metadata import GraphInfo
from duckdb_graphar_spark.graphar.reader import read_edges, read_vertices


def attach(spark: SparkSession, graph: GraphInfo | str) -> dict[str, str]:
    """Register temp views for every vertex/edge type; returns
    {view_name: kind} for introspection (`SHOW TABLES` parity,
    `config/test/sql/graphar/attach.test:4-16`)."""
    g = graph if isinstance(graph, GraphInfo) else GraphInfo.load(graph)
    registered: dict[str, str] = {}
    for vtype in g.vertices:
        name = f"{vtype}_vertex"
        read_vertices(spark, g, vtype).createOrReplaceTempView(name)
        registered[name] = "vertex"
    for (src, etype, dst) in g.edges:
        name = f"{src}_{etype}_{dst}_edge"
        read_edges(spark, g, src, etype, dst).createOrReplaceTempView(name)
        registered[name] = "edge"
    return registered
