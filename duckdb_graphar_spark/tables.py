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

# Fact-sized tables whose downstream operators do real per-row compute.
# The driver fixtures are single-file, SINGLE-ROW-GROUP parquet (even 6M-row
# sf1 lineitem), which Spark cannot split — every scan stage runs as ONE
# task no matter how many cores exist.  For these tables a degenerate
# narrow scan is widened with one explicit round-robin repartition so the
# scan-stage compute (HOF n-gram transforms, decimal aggs, window preps)
# uses the whole machine.  The widen is CONDITIONAL on the scan actually
# being narrower than the cluster: on a real deployment a 100 TB table
# arrives as thousands of splits and this branch never fires, so no
# gratuitous shuffle is added at scale.  (Explicit repartition(N) is
# deliberately used — AQE's coalescer would immediately re-merge a
# hint-based repartition because these fixtures are small in BYTES while
# heavy in per-row COMPUTE.)
_WIDEN_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, widen: bool = True
) -> DataFrame:
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
    if widen and name in _WIDEN_TABLES:
        p = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < p:
            df = df.repartition(p)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
