"""Bucketed (pre-shuffled) table layouts: co-located joins and aggs.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
by the join key.  Bucketing pays that shuffle ONCE at write time: rows
are hash-distributed into a fixed number of bucket files per partition,
and every later join/agg on the bucket key reads co-located buckets
with NO exchange (Spark pairs bucket i of table A with bucket i of
table B; sort-by makes it a zero-sort merge join).

This is the Spark-native equivalent of the co-partitioning the
reference gets implicitly from GraphAr's CSR layout (edges pre-sorted
by source vertex): organize storage around the access key so the
engine never re-partitions at read time.

Usage contract: both join sides bucketed by the SAME key into the SAME
bucket count; `spark.sql.sources.bucketing.enabled` (default true).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (parquet).  ``sort=True`` also
    sorts within buckets so downstream merge joins skip their sort."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
