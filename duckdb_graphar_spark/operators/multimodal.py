"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata.

The decode step itself is STUBBED (no image/audio libs in this
container): `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder derives
shape/features from the payload bytes.  Everything Spark-side — schema,
Arrow batch shape, `mapInPandas` signature, partition sizing — is real
and tested, so swapping in PIL/librosa later only changes the inner
function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# Typed metadata struct accompanying every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives a plausible image shape and a
    perceptual-hash-like fingerprint purely from the bytes.  Replace with
    a real decoder (PIL) in production."""
    h = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    width = int(64 + (int(h[:4].sum()) % 1024))
    height = int(64 + (int(h[4:8].sum()) % 1024))
    mean_intensity = float(h.mean())
    phash = int(np.int64(int.from_bytes(h[:8].tobytes(), "little", signed=True)))
    return {
        "width": width,
        "height": height,
        "mean_intensity": mean_intensity,
        "phash": phash,
    }


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image decoding requires PIL/opencv — not available in this "
        "container; pass fake=True for the deterministic stub"
    )


def extract_image_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
    batch_rows: int = 1024,
    set_arrow_batch_conf: bool = False,
) -> DataFrame:
    """Decode + feature-extract image payloads via `mapInPandas`.

    The decode working set is bounded by slicing each incoming Arrow
    batch into ``batch_rows``-row chunks inside the generator — no
    session conf is touched.  For 100 TB media where even the *raw
    payload* Arrow batch must shrink (payloads of many MB each), pass
    ``set_arrow_batch_conf=True`` to also lower
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; note that conf is
    session-wide and stays set (it is read at execution time, so a
    save/restore around this lazy builder would be a no-op).
    """
    spark = df.sparkSession
    if set_arrow_batch_conf:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("__payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [decode_image(p, fake=fake) for p in chunk["__payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].astype("int64"),
                        "width": pd.array([f["width"] for f in feats], dtype="Int32"),
                        "height": pd.array([f["height"] for f in feats], dtype="Int32"),
                        "n_bytes": chunk["__payload"].map(len).astype("int64"),
                        "mean_intensity": [f["mean_intensity"] for f in feats],
                        "phash": pd.array([f["phash"] for f in feats], dtype="Int64"),
                    }
                )

    return cols.mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_ms: int = 1000,
    fake: bool = True,
) -> DataFrame:
    """Frame-sample video payloads → one row per sampled frame
    (doc_id, frame_idx, ts_ms, frame_payload).  Fake mode derives a
    deterministic frame count from the payload length."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("__payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for did, payload in zip(pdf["doc_id"], pdf["__payload"]):
                if not fake:
                    raise NotImplementedError("real video decode needs ffmpeg/opencv")
                n_frames = 1 + (len(payload) % 5)
                for i in range(n_frames):
                    rows["doc_id"].append(int(did))
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame_payload"].append(payload[i : i + 16])
            yield pd.DataFrame(rows)

    return cols.mapInPandas(batches, out_schema)


def resize_stub(df: DataFrame, *, width: int, height: int, payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: passes payloads through the Arrow batch path and
    attaches the target dimensions (real resize would transform bytes)."""
    return df.withColumns(
        {"target_width": F.lit(width), "target_height": F.lit(height)}
    )
