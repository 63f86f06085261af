"""Structured Streaming operators over the `events` table shape
(event_id, ts, user_id, event_type, value, props).

Each operator is a plain DataFrame→DataFrame transformation that works
on both a `readStream` source and a batch DataFrame — the watermark is
a no-op in batch mode, which is exactly what lets the DuckDB oracle
verify the windowed aggregations (FIXTURES.md §B2, SURVEY §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        # stored as TIMESTAMP(NANOS) → read as long ns (see tables.py)
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str, *, max_files: int = 4) -> DataFrame:
    """File-based streaming source over the events parquet (one file =
    one micro-batch slice; real deployments swap in kafka)."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", max_files)
    if path.endswith(".parquet") and os.path.isfile(path):
        # streaming file sources require a directory; narrow with a glob
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    return raw.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


def tumbling_window_agg(
    events: DataFrame, *, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-(window, event_type) count + sum(value) with late-data cutoff."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_window_agg(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stateful_dedup(events: DataFrame, *, keys: list[str] | None = None, watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate events within the watermark horizon — bounded state
    (vs. unbounded `dropDuplicates` state in an infinite stream)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a streaming DataFrame to completion against a memory sink
    (test harness: processAllAvailable → stop → return the batch view)."""
    q = (
        stream_df.writeStream.outputMode("complete" if _has_agg(stream_df) else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def _has_agg(df: DataFrame) -> bool:
    return "Aggregate" in df._jdf.queryExecution().analyzed().toString()
