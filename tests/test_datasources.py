"""Python Data Source V2 surface: reader-side filter pushdown."""


def test_pushdown_prunes_to_one_partition():
    """EqualTo(("bucket",), 3) collapses planning from 8 partitions to
    ONE; an out-of-range bucket plans ZERO partitions; other filters
    are yielded back as unsupported."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from duckdb_graphar_spark.datasources import _BucketedRangeReader

    r = _BucketedRangeReader(8, 1000)
    assert len(r.partitions()) == 8
    unsupported = list(r.pushFilters([EqualTo(("bucket",), 3), GreaterThan(("id",), 10)]))
    assert len(unsupported) == 1 and isinstance(unsupported[0], GreaterThan)
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].bucket == 3

    r2 = _BucketedRangeReader(8, 1000)
    list(r2.pushFilters([EqualTo(("bucket",), 99)]))
    parts2 = r2.partitions()
    # one EMPTY sentinel (Spark's contract forbids zero partitions)
    assert len(parts2) == 1 and list(r2.read(parts2[0])) == []


def test_read_values_deterministic():
    from duckdb_graphar_spark.datasources import _BucketedRangeReader, _BucketPartition

    r = _BucketedRangeReader(8, 10)
    rows = list(r.read(_BucketPartition(2)))
    assert rows[0] == (2, 20, (20 * 20) % 997)
    assert len(rows) == 10


def test_end_to_end_pushdown_query(spark):
    from pyspark.sql import functions as F

    from duckdb_graphar_spark.datasources import BucketedRangeDataSource

    try:
        spark.dataSource.register(BucketedRangeDataSource)
    except Exception:
        pass
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    got = (
        spark.read.format("bucketed_range")
        .load()
        .filter(F.col("bucket") == 1)
        .agg(F.count(F.lit(1)).alias("n"), F.min("id"), F.max("id"))
        .collect()[0]
    )
    assert tuple(got) == (1000, 1000, 1999)


def test_stream_sink_manifest_exactly_once(spark, tmp_path):
    """The committed-batch manifest is the exactly-once boundary: an
    orphan parquet file dropped into the sink dir (a failed attempt's
    partial) must be invisible to read_stream_sink_output, and the
    committed rows must equal the streamed input."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_graphar_spark.datasources import (
        ParquetStreamSinkDataSource,
        read_stream_sink_output,
    )

    try:
        spark.dataSource.register(ParquetStreamSinkDataSource)
    except Exception:
        pass
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.range(0, 100).selectExpr(
        "id", "id * id AS sq"
    ).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema("id long, sq long").parquet(src)
    q = (
        stream.writeStream.format("parquet_stream_sink")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # plant an orphan partial that no manifest names; backdate its
    # mtime past the GC grace period so it models a CRASHED previous
    # run's leftover (a fresh foreign file would be protected — it
    # could be another live writer's in-flight task file)
    orphan = os.path.join(out, "part-orphan.parquet")
    pq.write_table(pa.table({"id": [999], "sq": [999]}), orphan)
    old = os.path.getmtime(orphan) - 3600
    os.utime(orphan, (old, old))
    # and a FRESH foreign file that must survive the sweep
    fresh_foreign = os.path.join(out, "part-fresh-foreign.parquet")
    pq.write_table(pa.table({"id": [998], "sq": [998]}), fresh_foreign)
    got = {(r.id, r.sq) for r in read_stream_sink_output(spark, out).collect()}
    assert got == {(i, i * i) for i in range(100)}
    assert (999, 999) not in got

    # commit-time GC (round 7): the next batch of the SAME query
    # lineage (same checkpoint — the sink's exactly-once unit) removes
    # parquet files no manifest names, so a crashed-driver orphan
    # doesn't accumulate forever — while committed files all survive
    spark.range(100, 120).selectExpr("id", "id * id AS sq").coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = (
        spark.readStream.schema("id long, sq long")
        .parquet(src)
        .writeStream.format("parquet_stream_sink")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert not os.path.exists(orphan)
    # a fresh foreign file (possibly another live writer's in-flight
    # task output) survives the scoped sweep
    assert os.path.exists(fresh_foreign)
    got2 = {(r.id, r.sq) for r in read_stream_sink_output(spark, out).collect()}
    assert got2 == {(i, i * i) for i in range(120)}


def test_stream_sink_requires_path(spark):
    from duckdb_graphar_spark.datasources import ParquetStreamSinkDataSource

    try:
        spark.dataSource.register(ParquetStreamSinkDataSource)
    except Exception:
        pass
    import pytest

    stream = spark.readStream.format("rate").load()
    with pytest.raises(Exception, match="path"):
        q = stream.writeStream.format("parquet_stream_sink").option(
            "checkpointLocation", "/tmp/u07_nopath_ck"
        ).start()
        q.awaitTermination(5)


def test_polymorphic_udtf_schema_follows_n(spark):
    """The analyze()-computed schema must track the literal n: n=2 and
    n=4 give different column sets; a non-constant n raises at plan
    time."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGramCols:
        @staticmethod
        def analyze(doc_id, text, n):
            if not n.isConstantExpression or not isinstance(n.value, int):
                raise ValueError("n must be a constant integer")
            schema = StructType().add("doc_id", LongType()).add("pos", IntegerType())
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, n):
            toks = (text or "").split(" ")
            for p in range(len(toks) - n + 1):
                yield (doc_id, p, *toks[p : p + n])

    spark.udtf.register("ngram_cols_test", udtf(NGramCols, useArrow=True))
    spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    ).createOrReplaceTempView("poly_docs")
    two = spark.sql(
        "SELECT t.* FROM poly_docs d, LATERAL ngram_cols_test(d.doc_id, d.text, 2) t"
    )
    four = spark.sql(
        "SELECT t.* FROM poly_docs d, LATERAL ngram_cols_test(d.doc_id, d.text, 4) t"
    )
    assert two.columns == ["doc_id", "pos", "w0", "w1"]
    assert four.columns == ["doc_id", "pos", "w0", "w1", "w2", "w3"]
    assert [tuple(r) for r in two.orderBy("pos").collect()] == [
        (1, 0, "a", "b"), (1, 1, "b", "c"), (1, 2, "c", "d")
    ]
    assert [tuple(r) for r in four.collect()] == [(1, 0, "a", "b", "c", "d")]
    import pytest

    with pytest.raises(Exception, match="constant"):
        spark.sql(
            "SELECT t.* FROM poly_docs d,"
            " LATERAL ngram_cols_test(d.doc_id, d.text, d.doc_id + 1) t"
        ).collect()
