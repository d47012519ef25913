"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow pandas UDFs over mapInPandas.

The image/audio libraries are not in this container, so the *decode*
step is stubbed behind ``NotImplementedError`` (real codec) and a
deterministic fake (hash-derived features) — but the Spark-side
plumbing is real and tested: schemas, batch iteration, partition-sized
Arrow batches, and the UDF signatures match what a PIL/ffmpeg-backed
implementation would use.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

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

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def _decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Real decode path — requires PIL (absent here)."""
    raise NotImplementedError(
        "image decode requires PIL/pillow which is not installed; "
        "the deterministic fake path is used instead"
    )


def _fake_features(payloads: pd.Series, dim: int = 8) -> list[np.ndarray]:
    """Deterministic stand-in for a decoder+encoder: features derived
    from a stable hash of the payload bytes (batch-vectorized)."""
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        h = np.frombuffer(
            np.array([hash_bytes(p, i) for i in range(dim)], dtype=np.uint64).tobytes(),
            dtype=np.uint64,
        )
        out.append((h % 1000).astype(np.float32) / 1000.0)
    return out


def hash_bytes(b: bytes, seed: int) -> int:
    import zlib

    return zlib.crc32(b + bytes([seed & 0xFF])) & 0xFFFFFFFF


def extract_features(
    media_df: DataFrame, feature_dim: int = 8, use_real_codec: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).  With
    ``use_real_codec`` and no codec installed, rows fail closed
    (decode_ok=False) rather than crashing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            oks: list[bool] = []
            if use_real_codec and not HAVE_PIL:
                feats = [None] * len(pdf)
                oks = [False] * len(pdf)
            else:
                feats = _fake_features(pdf["payload"], dim=feature_dim)
                oks = [f is not None for f in feats]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


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
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m{i:05d}",
                bytearray(payload),
                mt,
                64 if mt == "image" else None,
                48 if mt == "image" else None,
                5000 if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
