"""Gorilla-style compression for the raw retention tier.

The north rule requires the raw tier stored "Gorilla-compressed
(delta-of-delta timestamps, XOR-encoded values) inside Arrow-backed pandas
UDFs with no per-row Python".  Facebook's Gorilla (Pelkonen et al., VLDB
2015) compresses timestamps with delta-of-delta and float values with
XOR-of-consecutive + leading/trailing-zero windows.  Tokens are int32 and
the position axis is the implicit sequence 0..n-1, so we adapt:

- **positions**: delta-of-delta.  For the implicit regular grid every
  delta-of-delta is 0, which compresses to nothing but the length ``n``
  (stored in the header).  An explicit-positions encoder with
  zigzag(delta-of-delta) is provided for irregular axes.
- **values**: XOR chain ``x_i = zigzag(v_i) ^ zigzag(v_(i-1))`` (Gorilla's
  value scheme on the int bit pattern; zigzag keeps negative sentinels
  narrow), bit-packed with a per-row width = max significant bits of the
  XOR stream (a simplification of Gorilla's per-value leading-zero
  windows that keeps the packer fully batch-vectorizable).

Everything operates on the *flattened* concatenation of all arrays in the
Arrow batch: diffs/XORs/zigzags, segment maxima (``np.maximum.reduceat``),
bit packing (<=64 vectorized passes over all values at once), and the
decode-side XOR prefix scan (``np.bitwise_xor.accumulate`` with a
per-segment offset correction).  Per-row Python is limited to O(1)
metadata (lengths, byte-slice assembly) — no loops over token elements.

Row payload layout (little-endian header, MSB-first bitstream):

    byte 0      version (=1)
    bytes 1-4   n       uint32   number of values
    bytes 5-12  first   int64    first value (raw)
    bytes 13-20 fdelta  int64    first delta (dod mode; 0 in xor mode)
    byte 21     width   uint8    bits per packed stream element (0..64)
    bytes 22+   packed stream: (n-1) elements in xor mode (XOR chain),
                (n-2) in dod mode (zigzag delta-of-delta)

Round-trip invariant (BASELINE.json input_hint): decode(encode(tokens))
== tokens for every row — enforced in tests/test_gorilla.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

_VERSION = 1
_HEADER = 22


# ---------------------------------------------------------------- helpers
def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 arrays."""
    x = x.astype(np.uint64, copy=True)
    w = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x >= (np.uint64(1) << np.uint64(shift))
        w[mask] += shift
        x[mask] >>= np.uint64(shift)
    w[x > 0] += 1
    return w


def _segment_starts(lens: np.ndarray) -> np.ndarray:
    starts = np.zeros(lens.size, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return starts


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def _unzigzag(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return ((z >> np.uint64(1)).astype(np.int64)) ^ -((z & np.uint64(1)).astype(np.int64))


def _stream_encode(
    flat: np.ndarray, lens: np.ndarray, mode: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch stream elements (uint64), flat.

    mode 'xor':  stream = XOR chain x_i = v_i ^ v_(i-1), n-1 per row.
    mode 'dod':  stream = zigzag(d_i - d_(i-1)) for i >= 2, n-2 per row;
                 the first delta d_1 is returned separately (header field).

    Returns (stream, per-row stream lengths, per-row first deltas).
    """
    n_rows = lens.size
    fdelta = np.zeros(n_rows, dtype=np.int64)
    if flat.size == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(n_rows, dtype=np.int64), fdelta
    starts = _segment_starts(lens)
    # drop pairs that cross a row boundary: x[j] pairs flat[j] with
    # flat[j+1]; it crosses iff j+1 is the start of a later row.  Guard
    # empty leading rows (starts == 0 would index -1 and wrap).
    cross = starts[1:][starts[1:] > 0] - 1
    keep = np.ones(max(flat.size - 1, 0), dtype=bool)
    keep[cross[cross < keep.size]] = False  # trailing empty rows: start==size
    if mode == "xor":
        # XOR chain over zigzag(v): zigzag keeps small negatives (e.g. the
        # -9999 NA sentinel) narrow, so one sentinel doesn't blow the row
        # width to 64 bits the way a two's-complement pattern would.
        z = _zigzag(flat)
        x = z[:-1] ^ z[1:]
        return x[keep], np.maximum(lens - 1, 0), fdelta
    # dod
    d = flat[1:].astype(np.int64) - flat[:-1].astype(np.int64)
    d = d[keep]  # per-row deltas, flat, lens-1 per row
    dlens = np.maximum(lens - 1, 0)
    dstarts = _segment_starts(dlens)
    nz = dlens > 0
    fdelta[nz] = d[dstarts[nz]]
    # remove the per-row first delta; remaining elements are dod_i, i>=2
    keep2 = np.ones(d.size, dtype=bool)
    keep2[dstarts[nz]] = False
    slens = np.maximum(lens - 2, 0)
    sstarts = _segment_starts(slens)
    dod = np.empty(int(slens.sum()), dtype=np.int64)
    if dod.size:
        dd = d[1:] - d[:-1]  # pairwise, includes cross-row + first-delta pairs
        keep3 = keep2[1:].copy()
        # also drop pairs crossing row boundaries in d-space
        dcross = dstarts[1:][dstarts[1:] > 0] - 1
        dkeep = np.ones(max(d.size - 1, 0), dtype=bool)
        dkeep[dcross[dcross < dkeep.size]] = False
        dod = dd[keep3 & dkeep]
    return _zigzag(dod), slens, fdelta


def _pack_bits(stream: np.ndarray, slens: np.ndarray, widths: np.ndarray):
    """Pack per-row streams (widths[r] bits per element, MSB-first,
    byte-padded per row).  Returns (payload bytes ndarray, per-row byte
    offsets, per-row byte lengths)."""
    nbytes_row = ((slens * widths) + 7) // 8
    byte_off = np.zeros(len(slens) + 1, dtype=np.int64)
    np.cumsum(nbytes_row, out=byte_off[1:])
    total_bits = int(byte_off[-1]) * 8
    bits = np.zeros(total_bits, dtype=np.uint8)
    if stream.size:
        sstarts = _segment_starts(slens)
        w_per_val = np.repeat(widths, slens)
        idx_in_row = np.arange(stream.size) - np.repeat(sstarts, slens)
        rowbit0 = np.repeat(byte_off[:-1] * 8, slens)
        valbit0 = rowbit0 + idx_in_row * w_per_val
        maxw = int(widths.max(initial=0))
        for b in range(maxw):
            m = b < w_per_val
            tgt = valbit0[m] + b
            bits[tgt] = (
                (stream[m] >> (w_per_val[m] - 1 - b).astype(np.uint64))
                & np.uint64(1)
            ).astype(np.uint8)
    return np.packbits(bits), byte_off, nbytes_row


def _unpack_bits(payload: np.ndarray, slens: np.ndarray, widths: np.ndarray,
                 byte_off: np.ndarray) -> np.ndarray:
    """Inverse of _pack_bits → flat uint64 stream."""
    total = int(slens.sum())
    out = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return out
    bits = np.unpackbits(payload)
    sstarts = _segment_starts(slens)
    w_per_val = np.repeat(widths, slens)
    idx_in_row = np.arange(total) - np.repeat(sstarts, slens)
    rowbit0 = np.repeat(byte_off * 8, slens)
    valbit0 = rowbit0 + idx_in_row * w_per_val
    maxw = int(widths.max(initial=0))
    for b in range(maxw):
        m = b < w_per_val
        out[m] = (out[m] << np.uint64(1)) | bits[valbit0[m] + b].astype(np.uint64)
    return out


# ------------------------------------------------------------ batch codec
def encode_batch(arrays: list[np.ndarray], mode: str = "xor") -> list[bytes]:
    """Encode a batch of int arrays into per-row Gorilla-style payloads."""
    n_rows = len(arrays)
    lens = np.fromiter((len(a) for a in arrays), dtype=np.int64, count=n_rows)
    flat = (
        np.concatenate([np.asarray(a, dtype=np.int64) for a in arrays])
        if n_rows and lens.sum() > 0
        else np.empty(0, dtype=np.int64)
    )
    stream, slens, fdelta = _stream_encode(flat, lens, mode)
    # per-row width = bit_length of the max stream element in the row
    widths = np.zeros(n_rows, dtype=np.int64)
    if stream.size:
        sstarts = _segment_starts(slens)
        nz = slens > 0
        segmax = np.zeros(n_rows, dtype=np.uint64)
        red = np.maximum.reduceat(stream, sstarts[nz]) if nz.any() else None
        if red is not None:
            segmax[nz] = red
        widths = _bit_length(segmax)
    payload, byte_off, nbytes_row = _pack_bits(stream, slens, widths)
    starts = _segment_starts(lens)
    firsts = np.zeros(n_rows, dtype=np.int64)
    nzrow = lens > 0
    firsts[nzrow] = flat[starts[nzrow]]

    headers = np.zeros((n_rows, _HEADER), dtype=np.uint8)
    headers[:, 0] = _VERSION
    headers[:, 1:5] = lens.astype("<u4").view(np.uint8).reshape(n_rows, 4)
    headers[:, 5:13] = firsts.astype("<i8").view(np.uint8).reshape(n_rows, 8)
    headers[:, 13:21] = fdelta.astype("<i8").view(np.uint8).reshape(n_rows, 8)
    headers[:, 21] = widths.astype(np.uint8)

    pbytes = payload.tobytes()
    hbytes = headers  # row-sliceable
    return [
        hbytes[r].tobytes() + pbytes[byte_off[r] : byte_off[r] + nbytes_row[r]]
        for r in range(n_rows)
    ]


def decode_batch(payloads: list[bytes], mode: str = "xor") -> list[np.ndarray]:
    """Inverse of :func:`encode_batch` — exact round trip."""
    n_rows = len(payloads)
    if n_rows == 0:
        return []
    heads = np.frombuffer(
        b"".join(p[:_HEADER] for p in payloads), dtype=np.uint8
    ).reshape(n_rows, _HEADER)
    if (heads[:, 0] != _VERSION).any():
        raise ValueError("bad gorilla payload version")
    lens = heads[:, 1:5].copy().view("<u4").reshape(n_rows).astype(np.int64)
    firsts = heads[:, 5:13].copy().view("<i8").reshape(n_rows)
    fdelta = heads[:, 13:21].copy().view("<i8").reshape(n_rows)
    widths = heads[:, 21].astype(np.int64)
    slens = np.maximum(lens - (1 if mode == "xor" else 2), 0)
    body = np.frombuffer(b"".join(p[_HEADER:] for p in payloads), dtype=np.uint8)
    nbytes_row = ((slens * widths) + 7) // 8
    byte_off = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(nbytes_row[:-1], out=byte_off[1:])
    stream = _unpack_bits(body, slens, widths, byte_off)

    total = int(lens.sum())
    flat = np.zeros(total, dtype=np.int64)
    starts = _segment_starts(lens)
    nzrow = lens > 0
    if mode == "xor":
        # flat = segmented XOR prefix scan over [zigzag(first), stream...]
        vals = np.zeros(total, dtype=np.uint64)
        vals[starts[nzrow]] = _zigzag(firsts[nzrow])
        mask = np.ones(total, dtype=bool)
        mask[starts[nzrow]] = False
        vals[mask] = stream
        acc = np.bitwise_xor.accumulate(vals)
        # correction: subtract (xor) the running value at each row boundary
        prefix = np.zeros(n_rows, dtype=np.uint64)
        boundary_ok = np.zeros(n_rows, dtype=bool)
        boundary_ok[1:] = starts[1:] > 0  # guard leading empty rows
        prefix[boundary_ok] = acc[starts[boundary_ok] - 1]
        flat = _unzigzag(acc ^ np.repeat(prefix, lens))
    else:  # dod
        dod = _unzigzag(stream)
        # rebuild deltas: d_1 = fdelta (header), d_i = d_(i-1) + dod_i
        dlens = np.maximum(lens - 1, 0)
        dstarts = _segment_starts(dlens)
        dnz = dlens > 0
        dvals = np.zeros(int(dlens.sum()), dtype=np.int64)
        dvals[dstarts[dnz]] = fdelta[dnz]
        dmask = np.ones(dvals.size, dtype=bool)
        dmask[dstarts[dnz]] = False
        dvals[dmask] = dod
        d = _segmented_cumsum(dvals, dlens)
        vals = np.zeros(total, dtype=np.int64)
        vals[starts[nzrow]] = firsts[nzrow]
        mask = np.ones(total, dtype=bool)
        mask[starts[nzrow]] = False
        vals[mask] = d
        flat = _segmented_cumsum(vals, lens)
    return [flat[starts[r] : starts[r] + lens[r]] for r in range(n_rows)]


def _segmented_cumsum(x: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum of a flat array, vectorized: global
    cumsum minus the running total at each segment boundary."""
    if x.size == 0:
        return x
    starts = _segment_starts(lens)
    acc = np.cumsum(x)
    prefix = np.zeros(lens.size, dtype=x.dtype)
    nz = lens > 0
    prev = starts - 1
    valid = nz & (prev >= 0)
    prefix[valid] = acc[prev[valid]]
    return acc - np.repeat(prefix, lens)


# -------------------------------------------------------------- spark API
@F.pandas_udf(T.BinaryType())
def gorilla_encode_values(tokens: pd.Series) -> pd.Series:
    """Arrow pandas UDF: array<int> → Gorilla-style XOR-packed binary."""
    return pd.Series(encode_batch([np.asarray(a) for a in tokens], mode="xor"))


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def gorilla_decode_values(payload: pd.Series) -> pd.Series:
    """Inverse UDF: binary → array<int> (exact round trip)."""
    return pd.Series(
        [a.astype(np.int32) for a in decode_batch(list(payload), mode="xor")]
    )


@F.pandas_udf(T.BinaryType())
def gorilla_encode_positions(pos: pd.Series) -> pd.Series:
    """Delta-of-delta encoder for explicit (irregular) position arrays."""
    return pd.Series(encode_batch([np.asarray(a) for a in pos], mode="dod"))


@F.pandas_udf(T.ArrayType(T.LongType()))
def gorilla_decode_positions(payload: pd.Series) -> pd.Series:
    return pd.Series(list(decode_batch(list(payload), mode="dod")))
