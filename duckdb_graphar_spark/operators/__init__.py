"""DataFrame-native operators: graph traversal (reference parity) and
LLM-data-pipeline extensions (dedup, similarity, text analysis,
sampling/splits, skew mitigation, as-of join, multimodal plumbing)."""

from duckdb_graphar_spark.operators.asof import asof_join
from duckdb_graphar_spark.operators.graph import (
    bfs_exist,
    bfs_length,
    degrees,
    degrees_from_offsets,
    one_more_hop,
    two_hop,
)
from duckdb_graphar_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_take,
)
from duckdb_graphar_spark.operators.skew import salted_collect_list, salted_join

__all__ = [
    "degrees",
    "degrees_from_offsets",
    "two_hop",
    "one_more_hop",
    "bfs_length",
    "bfs_exist",
    "asof_join",
    "hash_sample",
    "hash_split",
    "stratified_take",
    "salted_join",
    "salted_collect_list",
]
