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
    if name == "events":
        # Normalize ts to TIMESTAMP_NTZ under ANY session: Spark 4 reads
        # TIMESTAMP(NANOS, utc=false) natively as NTZ (µs-truncated); a
        # session honoring nanosAsLong yields bigint ns instead.  NTZ is
        # the DuckDB-naive-TIMESTAMP twin, independent of session timezone.
        t = dict(df.dtypes).get("ts")
        if t == "bigint":
            # integral DIV, not `/`: double division loses µs precision at
            # ~1.7e18 ns (2^-52 × 1.7e18 ≈ 378 ns rounding error).
            # timestampadd on an NTZ literal stays NTZ — no session-TZ
            # dependence, unlike CAST(timestamp_micros(..) AS timestamp_ntz)
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts DIV 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif t == "timestamp":
            # LTZ → NTZ via epoch arithmetic, NOT CAST(.. AS timestamp_ntz):
            # the cast renders the instant in the session timezone — the
            # session-TZ dependence this whole branch exists to avoid.
            # Dead for the current utc=false fixture (Spark 4 reads it as
            # NTZ directly) but fires under inferTimestampNTZ=false or a
            # utc=true fixture.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts),"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
