"""Pure-numpy media codecs for the multimodal pipeline: binary PPM/PGM
image decode and RIFF/WAV PCM audio decode (plus matching encoders for
test/synthesis use).  No external libraries — these are the real-decode
paths for uncompressed formats; compressed formats (JPEG/PNG/MP3/MP4)
go through the optional PIL/ffmpeg seam in operators/multimodal.py and
fail closed when those libraries are absent.

Format references are the public Netpbm spec (P5/P6 binary headers:
magic, whitespace/comments, width, height, maxval, raster) and the
public RIFF/WAVE spec (chunked: 'fmt ' carries format/channels/rate/
bits, 'data' carries samples; PCM int 8/16/32 and IEEE float32).
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Raised when bytes do not parse as the claimed format."""


# ---------------------------------------------------------------- PPM/PGM
def _read_pnm_tokens(buf: bytes, n_tokens: int, start: int) -> tuple[list[int], int]:
    """Read ``n_tokens`` ASCII integers from a PNM header, honoring
    '#' comments; returns (values, offset_after_last_whitespace)."""
    vals: list[int] = []
    i = start
    cur = b""
    while len(vals) < n_tokens:
        if i >= len(buf):
            raise CodecError("truncated PNM header")
        c = buf[i:i + 1]
        if c == b"#":                      # comment to end of line
            if cur:                        # '#' terminates an in-progress
                vals.append(int(cur))      # number (Netpbm: a comment
                cur = b""                  # counts as whitespace); the
                                           # comment's own newline is the
                                           # post-token whitespace
            while i < len(buf) and buf[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            if cur:
                vals.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise CodecError(f"bad PNM header byte {c!r}")
        i += 1
    return vals, i


def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode binary PGM (P5, grayscale) or PPM (P6, RGB) bytes to a
    uint8/uint16 array of shape (h, w) or (h, w, 3)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise CodecError("not a binary PGM/PPM payload")
    channels = 1 if payload[:2] == b"P5" else 3
    (w, h, maxval), off = _read_pnm_tokens(payload, 3, 2)
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise CodecError(f"bad PNM dims {w}x{h} maxval={maxval}")
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    n = w * h * channels
    raster = payload[off:off + n * dtype.itemsize]
    if len(raster) != n * dtype.itemsize:
        raise CodecError("truncated PNM raster")
    arr = np.frombuffer(raster, dtype=dtype).astype(
        np.uint16 if maxval > 255 else np.uint8
    )
    return arr.reshape((h, w) if channels == 1 else (h, w, 3))


def encode_pnm(arr: np.ndarray, maxval: int = 255) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8/uint16 to binary
    PGM/PPM bytes (the deterministic synthesis twin of decode_pnm)."""
    if arr.ndim == 2:
        magic = b"P5"
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
        h, w = arr.shape[:2]
    else:
        raise CodecError(f"unsupported image shape {arr.shape}")
    dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    header = magic + b"\n" + f"{w} {h}\n{maxval}\n".encode()
    return header + np.ascontiguousarray(arr, dtype=dtype).tobytes()


# ---------------------------------------------------------------- RIFF/WAV
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE bytes to (samples, sample_rate).  Samples come
    back as float32 in [-1, 1], shape (n,) mono or (n, channels).
    Supports PCM uint8 / int16 / int32 and IEEE float32."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (size,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise CodecError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)         # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if channels < 1 or rate <= 0:
        raise CodecError(f"bad WAV fmt channels={channels} rate={rate}")
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128.0) / 128.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise CodecError(f"unsupported WAV format={audio_format} bits={bits}")
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float32 [-1, 1] samples ((n,) or (n, channels)) as
    16-bit PCM RIFF/WAVE bytes."""
    x = np.asarray(samples, dtype=np.float32)
    channels = 1 if x.ndim == 1 else int(x.shape[1])
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
