"""Deterministic synthetic data generators (FIXTURES.md F1/F2).

F1 — tokens table with the exact shape mandated by BASELINE.json
``input_hint``: ``(doc_id string, tokens array<int>, n_tok int,
source string)``.  Generated *distributed* (``spark.range`` →
``mapInPandas``) with a per-doc counter-based PRNG (numpy Philox keyed by
``(seed, doc_id)``), so the content of every row is a pure function of
``(seed, i)`` — independent of partitioning, parallelism, and row order.
That property is what makes the two-parallelism-level scaling runs
bit-comparable.

Injected structure (FIXTURES.md):
- gaps: runs of length 1-12 covering ~8%% of positions, encoded with the
  reference's -9999 NA sentinel inside ``tokens`` (diive uses -9999 as its
  missing sentinel: diive/configs/filetypes/DIIVE_CSV_30MIN.yml,
  diive/core/io/filereader.py:596); the series view maps sentinel → NULL.
- outliers: +10σ spikes at ~0.2%% of positions (z-score / LocalSD targets,
  diive/pkgs/outlierdetection/zscore.py:140-204, localsd.py:73-101).

F2 — a regular 30-min meteo-style table mirroring the reference's example
CSV shape (1488 rows = July 2022 @ 30 min) for semantics-parity tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .conventions import NA_SENTINEL

VOCAB = 50257
SOURCES = ("web", "books", "code", "wiki", "forums")
# Zipf-ish skewed source mix — "web" is hot on purpose (exercises salting).
SOURCE_CUM = np.cumsum(np.array([0.62, 0.18, 0.10, 0.06, 0.04]))

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _gen_doc(seed: int, i: int, gaps: bool, outliers: bool) -> tuple[str, np.ndarray, str]:
    """Content of doc *i* — pure function of (seed, i)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, i]))
    n = int(np.clip(rng.lognormal(mean=5.5, sigma=0.8), 8, 4096))
    toks = rng.integers(0, VOCAB, size=n, dtype=np.int64)
    if outliers:
        # ~0.2% positions spiked by +10 sigma of U[0,VOCAB)
        spike = rng.random(n) < 0.002
        toks[spike] += int(10 * VOCAB / np.sqrt(12))
    if gaps:
        # runs of 1..12 sentinel values covering ~8% of positions
        p_run_start = 0.08 / 6.5  # mean run length 6.5
        starts = np.flatnonzero(rng.random(n) < p_run_start)
        lens = rng.integers(1, 13, size=starts.size)
        for s, ln in zip(starts, lens):
            toks[s : s + ln] = NA_SENTINEL
    src = SOURCES[int(np.searchsorted(SOURCE_CUM, rng.random()))]
    return f"doc{i:08d}", toks.astype(np.int32), src


def tokens_table(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    gaps: bool = True,
    outliers: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic tokens table (F1)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_doc(seed, int(i), gaps, outliers) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r[0] for r in rows],
                    "tokens": [r[1] for r in rows],
                    "n_tok": np.array([len(r[1]) for r in rows], dtype=np.int32),
                    "source": [r[2] for r in rows],
                }
            )

    rng = spark.range(0, n_docs, numPartitions=partitions or max(8, n_docs // 2000))
    return rng.mapInPandas(gen, schema=TOKENS_SCHEMA)


def series_view(tokens_df: DataFrame) -> DataFrame:
    """Long fact view ``series(source, doc_id, pos, value)``.

    ``pos`` is the time axis (sequence position); the -9999 sentinel maps
    to NULL (a gap), mirroring the reference's NA handling
    (diive/core/io/filereader.py:465-474 coerces NA sentinel → NaN).
    """
    tok = F.col("tok")
    return tokens_df.select(
        "source",
        "doc_id",
        F.posexplode("tokens").alias("pos", "tok"),
    ).select(
        "source",
        "doc_id",
        "pos",
        F.when(tok == NA_SENTINEL, F.lit(None).cast("double"))
        .otherwise(tok.cast("double"))
        .alias("value"),
    )


def series_ingest_with_dups(
    series_df: DataFrame, dup_frac: float = 0.001, seed: int = 42
) -> DataFrame:
    """Raw-ingest variant with ~dup_frac duplicated (doc_id,pos) rows and a
    ``file_order`` column, to exercise dedup-keep-last
    (diive/core/times/times.py:802-819 remove_index_duplicates keep='last').
    """
    base = series_df.withColumn("file_order", F.lit(0))
    dups = (
        series_df.where(F.rand(seed) < dup_frac)
        .withColumn("value", F.col("value") + F.lit(1.0))
        .withColumn("file_order", F.lit(1))
    )
    return base.unionByName(dups)


def meteo_table(spark: SparkSession, seed: int = 42) -> DataFrame:
    """F2 — 30-min regular meteo-style table, July 2022 (1488 rows),
    MIDDLE-stamped.  Columns mirror the reference example data family
    (TA, SW_IN, RH, NEE, USTAR)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 2022]))
    idx = pd.date_range("2022-07-01 00:15", periods=1488, freq="30min")
    frac_day = np.asarray(idx.hour * 60 + idx.minute) / 1440.0
    diel = np.sin((frac_day - 0.25) * 2 * np.pi)
    ta = 15 + 8 * diel + rng.normal(0, 1.2, 1488)
    sw_in = np.clip(800 * diel, 0, None) + np.clip(rng.normal(0, 30, 1488), 0, None)
    sw_in[diel <= 0] = 0.0
    rh = np.clip(70 - 15 * diel + rng.normal(0, 6, 1488), 20, 110)
    nee = -10 * np.clip(diel, 0, None) + 3 + rng.normal(0, 1.5, 1488)
    nee[rng.random(1488) < 0.1] = np.nan  # gaps
    ustar = rng.lognormal(-1.2, 0.4, 1488)
    pdf = pd.DataFrame(
        {
            "TIMESTAMP_MIDDLE": idx,
            "TA": ta,
            "SW_IN": sw_in,
            "RH": rh,
            "NEE": nee,
            "USTAR": ustar,
        }
    )
    return spark.createDataFrame(pdf)
