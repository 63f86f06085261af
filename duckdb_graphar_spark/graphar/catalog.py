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


def attach(
    spark: SparkSession, graph: GraphInfo | str, *, use_datasource: bool = True
) -> dict[str, str]:
    """Register temp views for every vertex/edge type; returns
    {view_name: kind} for introspection (`SHOW TABLES` parity,
    `config/test/sql/graphar/attach.test:4-16`).

    By default the views sit on the `format("graphar")` Python Data
    Source, so a SQL `WHERE _graphArSrcIndex = k` prunes chunk
    partitions at planning time (datasource.py) and property groups are
    zipped without a shuffle.  `use_datasource=False` falls back to the
    DataFrame-helper readers."""
    g = graph if isinstance(graph, GraphInfo) else GraphInfo.load(graph)
    yaml_path = graph if isinstance(graph, str) else None
    if use_datasource and yaml_path is not None:
        from duckdb_graphar_spark.graphar.datasource import register

        register(spark)

        def vertex_df(vtype):
            return (
                spark.read.format("graphar")
                .option("path", yaml_path)
                .option("type", vtype)
                .load()
            )

        def edge_df(src, etype, dst):
            return (
                spark.read.format("graphar")
                .option("path", yaml_path)
                .option("src", src)
                .option("edge", etype)
                .option("dst", dst)
                .load()
            )

    else:

        def vertex_df(vtype):
            return read_vertices(spark, g, vtype)

        def edge_df(src, etype, dst):
            return read_edges(spark, g, src, etype, dst)

    registered: dict[str, str] = {}
    for vtype in g.vertices:
        name = f"{vtype}_vertex"
        vertex_df(vtype).createOrReplaceTempView(name)
        registered[name] = "vertex"
    for (src, etype, dst) in g.edges:
        name = f"{src}_{etype}_{dst}_edge"
        edge_df(src, etype, dst).createOrReplaceTempView(name)
        registered[name] = "edge"
    return registered
