"""Gorilla codec round-trip invariant (BASELINE.json input_hint:
decode(encode(tokens)) == tokens for every row)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from diive_spark.functions.gorilla import (
    decode_batch,
    encode_batch,
    gorilla_decode_values,
    gorilla_encode_values,
)


def test_roundtrip_numpy_xor():
    rng = np.random.default_rng(1)
    arrays = [
        rng.integers(0, 50257, size=n).astype(np.int64)
        for n in [0, 1, 2, 3, 8, 100, 999]
    ]
    out = decode_batch(encode_batch(arrays, mode="xor"), mode="xor")
    assert len(out) == len(arrays)
    for a, b in zip(arrays, out):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_numpy_dod_irregular_positions():
    rng = np.random.default_rng(2)
    arrays = [
        np.cumsum(rng.integers(1, 60, size=n)).astype(np.int64)
        for n in [0, 1, 2, 5, 333]
    ]
    out = decode_batch(encode_batch(arrays, mode="dod"), mode="dod")
    for a, b in zip(arrays, out):
        np.testing.assert_array_equal(a, b)


def test_roundtrip_edge_values():
    arrays = [
        np.array([0, 0, 0, 0], dtype=np.int64),  # constant → width 0
        np.array([7], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([2**31 - 1, -(2**31), 0, -1], dtype=np.int64),
        np.arange(1000, dtype=np.int64) * 3 + 5,  # arithmetic → dod width 0
    ]
    for mode in ("xor", "dod"):
        out = decode_batch(encode_batch(arrays, mode=mode), mode=mode)
        for a, b in zip(arrays, out):
            np.testing.assert_array_equal(a, b)


def test_dod_compresses_arithmetic_sequences():
    arrays = [np.arange(0, 4096, dtype=np.int64)]
    payload = encode_batch(arrays, mode="dod")[0]
    # arithmetic progression → dod stream all zero → width 0, header only
    assert len(payload) == 22


def test_roundtrip_spark_udf(spark, tiny_tokens):
    enc = tiny_tokens.withColumn("payload", gorilla_encode_values("tokens"))
    dec = enc.withColumn("decoded", gorilla_decode_values("payload"))
    mismatches = dec.where(~(F.col("decoded") == F.col("tokens"))).count()
    assert mismatches == 0
    n = dec.count()
    assert n == tiny_tokens.count()


def test_compression_ratio_reported(spark, tiny_tokens):
    enc = tiny_tokens.withColumn("payload", gorilla_encode_values("tokens"))
    row = enc.select(
        F.sum(F.length("payload")).alias("compressed"),
        F.sum(F.col("n_tok") * 4).alias("raw"),
    ).first()
    # random vocab-50257 tokens: XOR-zigzag stream needs ~17-19 bits per
    # 32-bit raw value → expect a real reduction
    assert row["compressed"] < row["raw"] * 0.75


# ---------------------------------------------------------------- property
from hypothesis import given, settings, strategies as st


@st.composite
def int_arrays(draw):
    n_rows = draw(st.integers(0, 8))
    return [
        np.array(
            draw(
                st.lists(
                    st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=50
                )
            ),
            dtype=np.int64,
        )
        for _ in range(n_rows)
    ]


@settings(max_examples=60, deadline=None)
@given(arrays=int_arrays(), mode=st.sampled_from(["xor", "dod"]))
def test_roundtrip_property(arrays, mode):
    out = decode_batch(encode_batch(arrays, mode=mode), mode=mode)
    assert len(out) == len(arrays)
    for a, b in zip(arrays, out):
        np.testing.assert_array_equal(a, b)
