"""Structured Streaming operators (SURVEY §2.E — north-star; the
reference is batch-only)."""

from duckdb_graphar_spark.streaming.ops import (
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    stateful_dedup,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stateful_dedup",
]
