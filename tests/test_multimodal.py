"""Multimodal plumbing tests (decode is stubbed; Spark-side shape real)."""

import pytest
from pyspark.sql import functions as F

from duckdb_graphar_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_extract_image_features(media):
    out = M.extract_image_features(media, fake=True)
    rows = out.orderBy("doc_id").collect()
    assert len(rows) == 10
    assert rows[0].n_bytes == 100
    assert rows[0].width >= 64 and rows[0].height >= 64
    # determinism
    again = M.extract_image_features(media, fake=True).orderBy("doc_id").collect()
    assert rows == again


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"xx", fake=False)


def test_sample_frames(media):
    out = M.sample_frames(media, fake=True)
    rows = out.collect()
    assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)
    assert {r.doc_id for r in rows} == set(range(10))
