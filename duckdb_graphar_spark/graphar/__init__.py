"""GraphAr (Apache GraphAr, `gar/v1`) support for Spark.

Mirrors the capability surface of the reference extension
(`/root/reference/src/functions/table/read_vertices.cpp`,
`read_edges.cpp`, `src/storage/graphar_storage.cpp`) with an
idiomatic-PySpark design: metadata-driven file listing + Spark's
vectorized Parquet reader + `_metadata.row_index` based index-column
reconstruction, and chunk-level file pruning as the equivalent of the
reference's CSR offset seek.
"""

from duckdb_graphar_spark.graphar.metadata import (
    EdgeInfo,
    GraphInfo,
    PropertyGroup,
    VertexInfo,
)
from duckdb_graphar_spark.graphar.reader import read_edges, read_vertices
from duckdb_graphar_spark.graphar.catalog import attach
from duckdb_graphar_spark.graphar.writer import EdgeSpec, VertexSpec, write_graph
from duckdb_graphar_spark.graphar.spark_writer import (
    with_dense_index,
    write_edges_dist,
    write_graph_dist,
    write_vertices_dist,
)
from duckdb_graphar_spark.graphar.datasource import GraphArDataSource, register

__all__ = [
    "GraphArDataSource",
    "register",
    "GraphInfo",
    "VertexInfo",
    "EdgeInfo",
    "PropertyGroup",
    "read_vertices",
    "read_edges",
    "attach",
    "write_graph",
    "write_graph_dist",
    "write_vertices_dist",
    "write_edges_dist",
    "with_dense_index",
    "VertexSpec",
    "EdgeSpec",
]
