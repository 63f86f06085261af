"""DataFrame-native operators: graph traversal (reference parity) and
LLM-data-pipeline extensions (dedup, similarity, text analysis,
multimodal plumbing)."""

from duckdb_graphar_spark.operators.graph import (
    bfs_exist,
    bfs_length,
    degrees,
    degrees_from_offsets,
    one_more_hop,
    two_hop,
)

__all__ = [
    "degrees",
    "degrees_from_offsets",
    "two_hop",
    "one_more_hop",
    "bfs_length",
    "bfs_exist",
]
