"""Loaders for the driver's testdata tables (TESTDATA.md).

`events.ts` is TIMESTAMP(NANOS) parquet, which Spark's reader rejects;
with `spark.sql.legacy.parquet.nanosAsLong` it arrives as long
nanoseconds and is converted here to a microsecond TimestampType (the
fixture has only µs precision, so the conversion is lossless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The caller's session may not have been built by our factory
        # (session.py) — e.g. the correctness driver constructs its own —
        # so set the runtime SQL conf here; without it the scan dies with
        # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integral DIV, not `/`: double division loses µs precision at
        # ~1.7e18 ns (2^-52 × 1.7e18 ≈ 378 ns rounding error)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
