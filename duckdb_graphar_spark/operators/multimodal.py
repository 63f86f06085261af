"""Multimodal column plumbing: image/audio/video as opaque `binary`
payloads with typed metadata.

Two decode tiers:

- **Real, dependency-free codecs** for uncompressed formats: 24-bpp BMP
  and binary PPM (P6) are parsed with pure `struct`/numpy — header
  validation, row padding, bottom-up row order, per-channel pixel stats
  and an 8×8 average-hash all operate on genuinely decoded pixels
  (:func:`decode_bmp`, :func:`decode_ppm`, :func:`encode_bmp`).
- **Stubbed compressed codecs**: JPEG/PNG/WAV/MP4 need PIL/ffmpeg,
  which this container lacks; `decode_image` raises
  NotImplementedError for those magics unless `fake=True`, in which
  case a deterministic fake decoder derives shape/features from the
  payload bytes.

Everything Spark-side — schema, Arrow batch shape, `mapInPandas`
signature, partition sizing — is identical for both tiers, so swapping
PIL in later only widens the set of accepted magics.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# BMP on-disk structs (little-endian): BITMAPFILEHEADER + BITMAPINFOHEADER
_BMP_FILE = struct.Struct("<2sIHHI")  # magic, file size, res, res, pixel offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # hdr size, w, h, planes, bpp, comp, ...

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


def encode_bmp(pixels_topdown_bgr: np.ndarray) -> bytes:
    """Write a real 24-bpp uncompressed BMP from an (h, w, 3) uint8 array
    in logical top-down BGR order — standard bottom-up row storage with
    4-byte row padding."""
    h, w, c = pixels_topdown_bgr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) BGR")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels_topdown_bgr.reshape(h, w * 3)
    pixel_array = rows[::-1].tobytes()  # bottom-up
    offset = _BMP_FILE.size + _BMP_INFO.size
    header = _BMP_FILE.pack(b"BM", offset + len(pixel_array), 0, 0, offset)
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, len(pixel_array), 2835, 2835, 0, 0)
    return header + info + pixel_array


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bpp uncompressed BMP: validate headers, honor the pixel
    offset, strip per-row 4-byte padding, un-reverse bottom-up rows.
    Returns width/height plus the logical top-down BGR pixel bytes as a
    flat uint8 array (len = w·h·3)."""
    if len(payload) < _BMP_FILE.size + _BMP_INFO.size:
        raise ValueError("BMP truncated before headers")
    magic, _fsize, _r1, _r2, offset = _BMP_FILE.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    hdr, w, h_signed, planes, bpp, comp = _BMP_INFO.unpack_from(payload, 14)[:6]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bpp uncompressed BMP (bpp={bpp}, comp={comp})")
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    if len(payload) < offset + stride * h:
        raise ValueError("BMP truncated before pixel array end")
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3]
    if h_signed > 0:  # stored bottom-up → logical top-down
        rows = rows[::-1]
    return {"width": w, "height": h, "pixels": rows.reshape(-1).copy()}


def decode_ppm(payload: bytes) -> dict:
    """Parse binary PPM (P6): ASCII header (magic, width, height, maxval,
    '#' comments allowed) then raw RGB triplets.  Returns the same shape
    as :func:`decode_bmp` (pixels already top-down; RGB channel order)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    need = w * h * 3
    px = np.frombuffer(payload, np.uint8, count=need, offset=pos)
    if px.size < need:
        raise ValueError("PPM truncated")
    return {"width": w, "height": h, "pixels": px.copy()}


def average_hash(width: int, height: int, pixels: np.ndarray) -> int:
    """64-bit average hash over genuinely decoded pixels: grayscale
    (channel mean), nearest-neighbor 8×8 downsample, threshold at the
    block mean, row-major bit pack (MSB first), reinterpreted signed."""
    gray = pixels.reshape(height, width, 3).mean(axis=2)
    ys = (np.arange(8) * height) // 8
    xs = (np.arange(8) * width) // 8
    small = gray[np.ix_(ys, xs)]
    bits = (small > small.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return int(np.int64(np.uint64(val)))  # two's-complement into signed 64


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    """Decode an image payload to features.  Real pure-Python codecs
    handle BMP ('BM') and PPM ('P6'); compressed formats raise unless
    ``fake=True`` (deterministic stub, no real pixels)."""
    if fake:
        return _fake_decode(payload)
    if payload[:2] == b"BM":
        d = decode_bmp(payload)
    elif payload[:2] == b"P6":
        d = decode_ppm(payload)
    else:
        raise NotImplementedError(
            "only uncompressed BMP/PPM decode without PIL/opencv (not in "
            "this container); pass fake=True for the deterministic stub"
        )
    w, h, px = d["width"], d["height"], d["pixels"]
    return {
        "width": w,
        "height": h,
        "mean_intensity": float(px.mean()),
        "phash": average_hash(w, h, px),
    }


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


BMP_CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
    ]
)


def encode_text_bmp(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically render each document as a REAL 24-bpp BMP:
    width = 1 + octet_length(text) mod 16, height = 1 + id mod 12, and
    logical pixel byte i (top-down row-major BGR) = text byte i mod
    octet_length(text).  The payload is a genuine BMP file (struct-packed
    headers, bottom-up padded rows) — the fixture-side half of the real
    decode path, with pixel statistics independently computable from the
    text by a SQL oracle."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["__text"]):
                tb = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = 1 + (len(tb) % 16)
                h = 1 + (int(did) % 12)
                px = np.resize(tb, w * h * 3).reshape(h, w, 3)  # cyclic tile
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    return cols.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


def bmp_channel_stats(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-image per-channel pixel means from REAL decoded pixels:
    parse each BMP payload (:func:`decode_bmp` — header validation, row
    padding, bottom-up order), then mean of the B/G/R byte planes.

    Integer pixel sums divide once in float64 and round at 6, so a SQL
    oracle reproduces the values bit-for-bit.  Scale shape: Arrow-batched
    mapInPandas projection, no shuffle; payload batches are bounded by
    the incoming Arrow batch size."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("__payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_b", "mean_g", "mean_r")}
            for did, payload in zip(pdf["doc_id"], pdf["__payload"]):
                d = decode_bmp(bytes(payload))
                w, h, px = d["width"], d["height"], d["pixels"]
                n = w * h
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                for ci, key in enumerate(("mean_b", "mean_g", "mean_r")):
                    # HALF_UP on the double's exact binary value — what
                    # DuckDB/Spark ROUND do; Python round() half-evens,
                    # which diverges when n = w·h is a power of two and
                    # the mean lands exactly on a 5e-7 tie
                    mean = float(int(px[ci::3].sum(dtype=np.int64))) / n
                    out[key].append(
                        float(Decimal(mean).quantize(Decimal("0.000001"), ROUND_HALF_UP))
                    )
            yield pd.DataFrame(out)

    return cols.mapInPandas(batches, BMP_CHANNEL_STATS_SCHEMA)


def encode_text_ppm(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Render each document as a REAL binary PPM (P6): ASCII header with
    a comment line (exercising the parser's comment skip), then raw RGB
    triplets.  Dimensions w = 1 + octet_length(text) mod 13,
    h = 1 + id mod 9; pixel byte i = text byte (2·i) mod octet_length —
    a stride-2 cyclic sample, deliberately different from the BMP
    fixture so the two codecs can't share a decode bug."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["__text"]):
                tb = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                w = 1 + (len(tb) % 13)
                h = 1 + (int(did) % 9)
                idx = (np.arange(w * h * 3) * 2) % len(tb)
                header = f"P6\n# doc {int(did)}\n{w} {h}\n255\n".encode()
                payloads.append(header + tb[idx].tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads})

    return cols.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


PPM_CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
    ]
)


def ppm_channel_stats(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-image per-channel means from genuinely parsed PPM payloads
    (:func:`decode_ppm`: header fields, comment lines, raw RGB planes).
    Same HALF_UP round-6 discipline as :func:`bmp_channel_stats`."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("__payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for did, payload in zip(pdf["doc_id"], pdf["__payload"]):
                d = decode_ppm(bytes(payload))
                w, h, px = d["width"], d["height"], d["pixels"]
                n = w * h
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(h)
                for ci, key in enumerate(("mean_r", "mean_g", "mean_b")):
                    mean = float(int(px[ci::3].sum(dtype=np.int64))) / n
                    out[key].append(
                        float(Decimal(mean).quantize(Decimal("0.000001"), ROUND_HALF_UP))
                    )
            yield pd.DataFrame(out)

    return cols.mapInPandas(batches, PPM_CHANNEL_STATS_SCHEMA)


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


def encode_text_pcm(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically synthesize each document as a REAL 16-bit PCM
    waveform: sample i = (text byte i - 80) · 256, little-endian int16
    — letters (97-122) land positive, spaces/digits negative, so the
    signal genuinely oscillates and zero-crossing counts are
    meaningful.  The payload is the raw sample buffer (the audio twin
    of `encode_text_bmp`): the fixture-side half of a real decode path
    whose features a SQL oracle can compute straight from the text."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for text in pdf["__text"]:
                tb = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if tb.size and int(tb.max()) >= 128:
                    # (byte-80)*256 overflows int16 from byte 208 up, and
                    # multibyte UTF-8 diverges from the oracle's per-code-
                    # point recompute — raise, mirroring the odd-length
                    # check in pcm_energy_stats, instead of silent wrap
                    raise ValueError(
                        "encode_text_pcm requires ASCII text "
                        f"(found byte {int(tb.max())})"
                    )
                samples = (tb.astype(np.int32) - 80) * 256
                payloads.append(samples.astype("<i2").tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return cols.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


def pcm_energy_stats(
    df: DataFrame, *, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio feature extraction from REAL decoded samples: parse each
    raw PCM payload (little-endian int16 via numpy frombuffer) and emit
    (doc_id, n_samples, total_energy, n_zero_cross, peak) — the energy /
    zero-crossing / peak trio every audio quality gate starts with.

    All-integer outputs (energy = Σ s², crossings = sign flips between
    consecutive samples, peak = max |s|), so the oracle is exact — no
    float discipline needed.  Scale shape: Arrow-batched mapInPandas
    projection, no shuffle; a malformed (odd-length) payload raises
    rather than silently truncating."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("__payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in ("doc_id", "n_samples", "total_energy", "n_zero_cross", "peak")
            }
            for did, payload in zip(pdf["doc_id"], pdf["__payload"]):
                b = bytes(payload)
                if len(b) % 2:
                    raise ValueError(f"odd PCM payload length {len(b)} for doc {did}")
                s = np.frombuffer(b, dtype="<i2").astype(np.int64)
                neg = s < 0
                out["doc_id"].append(int(did))
                out["n_samples"].append(int(s.size))
                out["total_energy"].append(int(np.sum(s * s)))
                out["n_zero_cross"].append(
                    int(np.count_nonzero(neg[:-1] != neg[1:])) if s.size > 1 else 0
                )
                out["peak"].append(int(np.max(np.abs(s))) if s.size else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "total_energy": pd.Series(out["total_energy"], dtype="int64"),
                    "n_zero_cross": pd.Series(out["n_zero_cross"], dtype="int64"),
                    "peak": pd.Series(out["peak"], dtype="int64"),
                }
            )

    return cols.mapInPandas(
        batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("n_samples", T.LongType(), False),
                T.StructField("total_energy", T.LongType(), False),
                T.StructField("n_zero_cross", T.LongType(), False),
                T.StructField("peak", T.LongType(), False),
            ]
        ),
    )
