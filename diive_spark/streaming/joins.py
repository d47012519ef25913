"""Stream-stream joins: watermarked interval attribution.

The one Structured Streaming surface the rest of the streaming family
does not touch: joining two UNBOUNDED streams.  Spark's stream-stream
inner join buffers both sides in state and needs (a) watermarks on
both event-time columns and (b) a time-interval join condition so the
state store can evict rows that can no longer match (SS programming
guide, "Stream-stream Joins"; Armbrust et al., SIGMOD 2018).

``stream_attribution`` is the canonical instance: attribute each
conversion to every preceding trigger by the same actor within an
attribution window — the streaming form of the batch
``operators.joins.interval_join`` / as-of enrichment.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_attribution(
    triggers: DataFrame,
    conversions: DataFrame,
    window_seconds: float = 3600.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: every (conversion,
    preceding trigger) pair with ``0 <= t_conv - t_trig <=
    window_seconds`` for the same ``user_id``.  Inputs carry
    ``user_id`` and an event-time ``ts`` timestamp column; outputs one
    row per attributed pair with both times and the lag.

    State-store semantics: both sides are watermarked, and the range
    condition bounds how long a buffered trigger can still match —
    Spark evicts trigger state older than watermark + window and
    conversion state older than watermark, so state is O(in-window
    rows per key), not O(stream).  EXACTLY the eviction reasoning the
    SS guide requires for an unbounded-safe stream-stream join; an
    unconditioned join would raise AnalysisException.

    Batch parity: on ordered availableNow drains the emitted pair set
    equals the batch range join (same epochs, same closed interval) —
    proven in test_streaming.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    trig = (
        triggers.select(
            F.col("user_id"),
            F.col("ts").alias("t_trig"),
        )
        .withWatermark("t_trig", watermark)
    )
    conv = (
        conversions.select(
            F.col("user_id").alias("_uid_c"),
            F.col("ts").alias("t_conv"),
        )
        .withWatermark("t_conv", watermark)
    )
    j = trig.join(
        conv,
        (F.col("user_id") == F.col("_uid_c"))
        & (F.col("t_conv") >= F.col("t_trig"))
        & (
            F.col("t_conv")
            <= F.col("t_trig") + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        ),
        "inner",
    )
    lag = (
        F.unix_micros(F.col("t_conv")) - F.unix_micros(F.col("t_trig"))
    ) / F.lit(1e6)
    return j.select(
        "user_id",
        "t_trig",
        "t_conv",
        lag.alias("lag_s"),
    )
