"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from duckdb_graphar_spark.operators import text as X


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (0, "the cat and the dog of a house went to a tree"),
        (1, "der Hund und die Katze das ist gut und der Baum"),
        (2, "le chat et la maison les arbres des fleurs et le chien"),
        (3, "el gato y la casa que los perros una flor"),
        (4, ""),
        (5, "!!! ??? ###"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(df):
    out = {r.doc_id: r.n for r in df.select("doc_id", X.token_count(F.col("text")).alias("n")).collect()}
    assert out[0] == 12 and out[4] == 0 and out[5] == 3


def test_lang_id(df):
    out = {r.doc_id: r.l for r in df.select("doc_id", X.lang_id(F.col("text")).alias("l")).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "es"
    assert out[4] == "und"


def test_punct_ratio(df):
    out = {r.doc_id: r.p for r in df.select("doc_id", X.punct_ratio(F.col("text")).alias("p")).collect()}
    assert out[0] == 0.0
    assert out[5] > 0.5


def test_fingerprint_stability(spark):
    a = spark.createDataFrame([(0, "Hello   World")], "id long, text string")
    b = spark.createDataFrame([(0, "hello world")], "id long, text string")
    fa = a.select(X.fingerprint(F.col("text")).alias("f")).collect()[0].f
    fb = b.select(X.fingerprint(F.col("text")).alias("f")).collect()[0].f
    assert fa == fb and len(fa) == 32


def test_analyze_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = X.analyze(docs)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row.n_tokens > 0 and 0 <= row.quality <= 1 and len(row.fingerprint) == 32
