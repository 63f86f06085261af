"""duckdb_graphar_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the ``lithium-tech/duckdb-graphar``
DuckDB extension, re-expressed Spark-first.

The reference (see /root/reference, SURVEY.md) is a DuckDB extension that
reads Apache GraphAr graph data and adds graph-traversal operators; all
relational processing is delegated to the host engine.  Here the host
engine is Spark SQL / Catalyst:

- ``graphar`` — GraphAr metadata parsing, vertex/edge readers with
  chunk-level file pruning (the CSR "seek" equivalent), catalog attach.
- ``operators`` — graph algorithms (degrees, k-hop, BFS) as DataFrame
  pipelines, plus LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``streaming`` — Structured Streaming operators (windows, watermark,
  stateful dedup).
- ``functions`` — scalar helpers mirroring the reference's scalar UDFs.
"""

from duckdb_graphar_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
