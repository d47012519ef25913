"""Streaming exact dedup — the ingest-time face of the batch dedup
operators (operators/dedup.py) for continuously-arriving documents.

A training-data ingest stream must drop re-delivered/duplicate records
before they reach the corpus.  Spark-native shape:

- content key = ``xxhash64(text)`` (or any digest column) — narrow,
  JVM-side;
- ``dropDuplicatesWithinWatermark`` keeps one row per key while only
  retaining state for the watermark horizon — bounded state at any
  input rate, exactly the semantics a 100 TB/day ingest needs (true
  global dedup across all history belongs to the batch MinHash/exact
  pass over the stored corpus, not the stream);
- checkpointed state survives restarts (same guarantee as the
  streaming rollup).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_dedup_exact(
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Drop duplicate documents (same content digest, optionally per
    key) arriving within the watermark horizon.  First delivery wins;
    re-deliveries and content duplicates inside the horizon are
    suppressed; state is evicted past the watermark."""
    keyed = stream_df.withColumn("_digest", F.xxhash64(F.col(text_col)))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols) + ["_digest"]
    )
