"""Streaming sessionization: watermarked ``session_window`` aggregation
over a continuously-arriving event stream.

Same operator family as the batch ``operators/sessions.py`` —
``session_stats`` there uses ``F.session_window`` in a batch groupBy;
here the identical expression runs under a watermark, so Catalyst's
session-window state store merges/extends open sessions as events
arrive and emits a session exactly once when the watermark passes its
close (inactivity gap elapsed).  Checkpointed restart resumes open
session state (north rule: resumable from checkpoint).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def stream_sessions(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Per-key session aggregates from an event-time stream: (keys...,
    session_start, session_end, n_events[, v_sum]).  ``session_end``
    is last event + gap (the operator's close timestamp)."""
    keys = list(key_cols)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    extra = []
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("v_sum"))
        extra = ["v_sum"]
    out = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.session_window(F.col(ts_col), gap).alias("_sw"))
        .agg(*aggs)
    )
    return out.select(
        *keys,
        F.col("_sw.start").alias("session_start"),
        F.col("_sw.end").alias("session_end"),
        "n_events",
        *extra,
    )


def write_sessions_stream(
    sessions_df: DataFrame, out_path: str, checkpoint: str
) -> DataStreamWriter:
    """Append sink: one parquet row per closed session, exactly once."""
    return (
        sessions_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
