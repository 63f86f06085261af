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
    if mode == "overwrite":
        _drop_with_location(df.sparkSession, table)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def _drop_with_location(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS + remove an orphaned warehouse location.
    With a non-persistent metastore the table directory survives the
    session while the catalog entry doesn't, and a later saveAsTable
    fails with LOCATION_ALREADY_EXISTS.

    When the table IS in the catalog, its real location is resolved via
    DESCRIBE FORMATTED (an external or relocated table's directory is
    whatever the catalog says, not the naming convention); the
    convention path ({wh}/name, or {wh}/db.db/name for qualified names)
    is used only for the orphaned-directory case where there is no
    catalog entry left to ask."""
    loc = None
    if spark.catalog.tableExists(table):
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        loc = next(
            (r.data_type for r in rows if r.col_name == "Location"), None
        )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc is None:
        wh = spark.conf.get("spark.sql.warehouse.dir")
        parts = table.lower().split(".")
        if parts and parts[0] == "spark_catalog":
            parts = parts[1:]  # catalog part never appears in the path
        if len(parts) == 1 or parts[0] == "default":
            # default-database managed tables live directly under the
            # warehouse root, not under default.db/
            loc = f"{wh}/{parts[-1]}"
        else:
            loc = f"{wh}/{'.'.join(parts[:-1])}.db/{parts[-1]}"
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(loc)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
