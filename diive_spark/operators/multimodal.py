"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as
Arrow pandas UDFs over mapInPandas.

Decode is REAL for uncompressed formats via the pure-numpy codecs in
functions/codecs.py (binary PPM/PGM images, RIFF/WAV PCM audio) — no
external libraries needed.  Compressed formats (JPEG/PNG/MP3/MP4) go
through the optional PIL seam when pillow is installed; otherwise those
rows fail closed (decode_ok=False) with the deterministic hash-derived
fake features as a demoted fallback so downstream plumbing (schemas,
joins, ANN) keeps flowing.  Video containers have no pure-numpy parser;
frame_sample_plan still lays out the distributed decode work units.

Scale shape: decode + featurize are row-local mapInPandas passes over
Arrow batches (no shuffle); resize is the same.  Partition sizing is
the reader's problem (binary payloads dominate row width — keep
spark.sql.files.maxPartitionBytes moderate so a batch of payloads fits
executor memory).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.codecs import (
    CodecError,
    decode_pnm,
    decode_wav,
    encode_pnm,
    encode_wav,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

HAVE_PIL = False
try:  # pragma: no cover - pillow not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


# ------------------------------------------------------------- decoding
def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload: pure-numpy PPM/PGM first, then the PIL
    seam for compressed formats when pillow is installed."""
    try:
        return decode_pnm(payload)
    except CodecError:
        if HAVE_PIL:  # pragma: no cover - seam for full containers
            import io

            import PIL.Image

            return np.asarray(PIL.Image.open(io.BytesIO(payload)))
        raise


def _image_features(arr: np.ndarray, dim: int) -> np.ndarray:
    """Real image descriptor: geometry + intensity stats + a horizontal
    edge-energy proxy, padded/trimmed to ``dim`` float32s."""
    g = arr.astype(np.float32)
    if g.ndim == 3:
        g = g.mean(axis=2)
    scale = 65535.0 if arr.dtype == np.uint16 else 255.0
    g = g / scale
    edge = float(np.abs(np.diff(g, axis=1)).mean()) if g.shape[1] > 1 else 0.0
    feats = np.array(
        [
            g.shape[1], g.shape[0],
            3.0 if arr.ndim == 3 else 1.0,
            float(g.mean()), float(g.std()),
            float(g.min()), float(g.max()),
            edge,
        ],
        dtype=np.float32,
    )
    return _fit_dim(feats, dim)


def _audio_features(x: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Real audio descriptor: rate, duration, rms, zero-crossing rate,
    amplitude stats — float32, padded/trimmed to ``dim``."""
    mono = x if x.ndim == 1 else x.mean(axis=1)
    n = len(mono)
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
    feats = np.array(
        [
            rate / 48000.0,
            n / max(rate, 1),
            rms, zcr,
            float(mono.mean()) if n else 0.0,
            float(mono.std()) if n else 0.0,
            float(mono.min()) if n else 0.0,
            float(mono.max()) if n else 0.0,
        ],
        dtype=np.float32,
    )
    return _fit_dim(feats, dim)


def _fit_dim(v: np.ndarray, dim: int) -> np.ndarray:
    if len(v) >= dim:
        return v[:dim]
    return np.pad(v, (0, dim - len(v)))


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic hash-derived stand-in — the DEMOTED fallback for
    payloads no real decoder handles (e.g. video containers, or
    compressed images without pillow)."""
    h = np.frombuffer(
        np.array(
            [hash_bytes(payload, i) for i in range(dim)], dtype=np.uint64
        ).tobytes(),
        dtype=np.uint64,
    )
    return ((h % 1000).astype(np.float32) / 1000.0)[:dim]


def hash_bytes(b: bytes, seed: int) -> int:
    import zlib

    return zlib.crc32(b + bytes([seed & 0xFF])) & 0xFFFFFFFF


# ------------------------------------------------------------ operators
def extract_features(
    media_df: DataFrame, feature_dim: int = 8, use_real_codec: bool = True
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches,
    row-local, zero shuffle).  Real decode (PPM/PGM, WAV — pure numpy;
    PIL seam for compressed images) sets decode_ok=True; undecodable
    rows fail closed with decode_ok=False and fall back to the
    deterministic hash features so plumbing stays total.
    ``use_real_codec=False`` forces the fake path (test hook)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            oks: list[bool] = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                if payload is None:
                    feats.append(None)
                    oks.append(False)
                    continue
                payload = bytes(payload)
                f = None
                if use_real_codec:
                    try:
                        if mt == "image":
                            f = _image_features(decode_image(payload), feature_dim)
                        elif mt == "audio":
                            x, rate = decode_wav(payload)
                            f = _audio_features(x, rate, feature_dim)
                    except Exception:
                        # fail CLOSED on ANY decode error, not just
                        # CodecError: malformed payloads can surface as
                        # ValueError from np.frombuffer (e.g. a PCM data
                        # chunk that is not a multiple of the sample
                        # width) or, with pillow installed, as
                        # UnidentifiedImageError — a poison payload must
                        # mark the row, never kill the task
                        f = None
                if f is None:
                    feats.append(_fake_features(payload, feature_dim))
                    oks.append(False)
                else:
                    feats.append(f)
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media_df: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Nearest-neighbor resize of decodable image rows, re-encoded as
    PPM/PGM; undecodable rows pass through payload-unchanged with
    decode_ok=False.  Row-local mapInPandas, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs, oks = [], [], [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                if payload is None or mt != "image":
                    payloads.append(payload)
                    ws.append(None)
                    hs.append(None)
                    oks.append(False)
                    continue
                payload = bytes(payload)
                try:
                    arr = decode_image(payload)
                    ys = (np.arange(out_h) * arr.shape[0] // out_h)
                    xs = (np.arange(out_w) * arr.shape[1] // out_w)
                    small = arr[np.ix_(ys, xs)]
                    maxval = 65535 if arr.dtype == np.uint16 else 255
                    payloads.append(encode_pnm(small, maxval=maxval))
                    ws.append(out_w)
                    hs.append(out_h)
                    oks.append(True)
                except Exception:  # poison payload: pass through, never
                    payloads.append(payload)  # abort the task (see above)
                    ws.append(None)
                    hs.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "decode_ok": oks,
                }
            )

    return media_df.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(
    media_df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling *plan* for video rows: explode target timestamps
    JVM-side (sequence+explode) so the decode UDF receives (media_id,
    frame_ts) work units — the shuffle-friendly layout for distributed
    frame extraction."""
    v = media_df.where(F.col("media_type") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts"),
    )


def fake_media_table(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL decodable bytes:
    image rows carry binary PPM (P6), audio rows carry 16-bit PCM WAV,
    video rows stay opaque random bytes (no pure-numpy container
    parser — they exercise the fail-closed path)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        if mt == "image":
            img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            payload = encode_pnm(np.asarray(img), maxval=255)
            w, h, dur = 64, 48, None
        elif mt == "audio":
            t = np.arange(16000 // 4, dtype=np.float32) / 16000.0
            wave = 0.5 * np.sin(2 * np.pi * (200 + 10 * i) * t)
            payload = encode_wav(wave, rate=16000)
            w, h, dur = None, None, 250
        else:
            payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
            w, h, dur = None, None, 5000
        rows.append((f"m{i:05d}", bytearray(payload), mt, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
