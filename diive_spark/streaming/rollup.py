"""Structured Streaming rollup: the incremental-ingest analog of the
batch tier cascade.

The reference has no streaming (SURVEY.md §2.11) — batch-incremental
MERGE per partition is the primary incremental path (operators/tiers.py).
This module adds the true streaming variant for continuously-arriving
series data: tumbling event-time windows == resample bins, watermarks
bound late-data state, and the sink appends composable partials
(n/sum/sumsq/min/max — same schema as the batch tiers) so downstream
tiers compose identically from either path.

Checkpointed: restart with the same checkpointLocation resumes exactly
(source offsets + window state), which is the streaming face of the
north rule's "resumable from checkpoint".
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def stream_rollup_partials(
    stream_df: DataFrame,
    every: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Tumbling-window partial aggregates over an event-time stream.

    Output schema mirrors the batch tier tables: (keys..., bin_start,
    bin_end, n, n_grid, sum, sumsq, min, max) — so ``compose_rollup``
    and ``apply_mincount_gate`` work on streamed tiers unchanged.
    """
    v = F.col(value_col)
    win = F.window(ts_col, every)
    agg = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, win)
        .agg(
            F.count(v).alias("n"),
            F.count(F.lit(1)).alias("n_grid"),
            F.sum(v).alias("sum"),
            F.sum(v * v).alias("sumsq"),
            F.min(v).alias("min"),
            F.max(v).alias("max"),
        )
    )
    return agg.select(
        *key_cols,
        F.col("window.start").alias("bin_start"),
        F.col("window.end").alias("bin_end"),
        "n", "n_grid", "sum", "sumsq", "min", "max",
    )


def write_tier_stream(
    rollup_df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> DataStreamWriter:
    """Append-mode parquet sink with checkpoint; ``available_now`` drains
    everything currently available then stops (micro-batch catch-up —
    the pattern for scheduled incremental runs)."""
    w = (
        rollup_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w


def stream_ingest_tokens(
    spark,
    source_path: str,
    store,
    schema: str = "doc_id string, tokens array<int>, n_tok int, source string",
    checkpoint: str | None = None,
    available_now: bool = True,
):
    """Stream whole-document token batches straight into a
    :class:`~diive_spark.operators.tiers.TierStore` — the streaming
    face of the continuous-aggregate MERGE.

    Each micro-batch is folded with ``store.ingest_increment`` inside
    ``foreachBatch``: only the batch is aggregated, stored tiers merge
    by doc key, lineage fingerprints xor-compose.  Because
    ingest_increment is an idempotent upsert ON (source, doc_id), a
    replayed micro-batch after a crash re-merges to the identical
    store — exactly-once TABLE STATE from at-least-once delivery, the
    standard foreachBatch contract.  Restarting with the same
    ``checkpoint`` resumes from the recorded source offsets.

    Returns the started StreamingQuery; with ``available_now`` the
    caller should ``awaitTermination()`` to drain what is currently in
    ``source_path`` (the scheduled-incremental pattern).
    """
    stream = spark.readStream.schema(schema).parquet(source_path)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        store.ingest_increment(batch_df)

    w = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_ddsketch_partials(
    stream_df: DataFrame,
    every: str = "1 minute",
    watermark: str = "2 minutes",
    gamma: float = 1.02,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Streaming DDSketch store (Masson, Rim & Lee, VLDB 2019): exact
    counts over logarithmic value buckets per tumbling event-time
    window — the streaming face of ``analyses.ddsketch_agg``, emitting
    the IDENTICAL long form (keys..., bin_start BIGINT epoch seconds,
    sign, bucket, cnt), so batch ``compose_ddsketch`` /
    ``ddsketch_quantiles`` / ``collapse_ddsketch`` run on streamed
    tiers unchanged and a streamed 1m store unions/merges exactly with
    a batch-built one (count-sum).  The bucket expression is the ONE
    shared implementation (``analyses.ddsketch_bucket_cols``), so the
    two faces cannot drift.

    State per window is bounded by the distinct-bucket count (~1.2k
    buckets across 10 decades at gamma=1.02 — use the batch collapse
    downstream if tighter), and the watermark expires windows, so
    state never grows with stream length.  Pure column expressions:
    whole-stage codegen, no Python in the hot path."""
    from ..operators.analyses import ddsketch_bucket_cols

    v = F.col(value_col)
    sign, bucket = ddsketch_bucket_cols(v, gamma)
    win = F.window(ts_col, every)
    agg = (
        stream_df.where(v.isNotNull())
        .withColumn("sign", sign)
        .withColumn("bucket", bucket)
        .withWatermark(ts_col, watermark)
        .groupBy(*key_cols, win, "sign", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return agg.select(
        *key_cols,
        F.unix_timestamp(F.col("window.start")).cast("long")
        .alias("bin_start"),
        "sign", "bucket", "cnt",
    )


def stream_cm_partials(
    stream_df: DataFrame,
    every: str = "1 minute",
    watermark: str = "2 minutes",
    depth: int = 4,
    width: int = 128,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Streaming Count-Min store (Cormode & Muthukrishnan 2005): exact
    counts over (row, col) hash cells per tumbling event-time window —
    the streaming face of ``analyses.cm_sketch_agg``, emitting the
    IDENTICAL long form (keys..., bin_start BIGINT epoch seconds, row,
    col, cnt), so batch ``compose_cm`` / ``cm_estimate`` run on
    streamed tiers unchanged and a streamed 1m store merges exactly
    with a batch-built one (count-sum; cells are value-determined by
    the shared ``_cm_col`` hash, so the two faces cannot drift).

    State per window is bounded by min(distinct_items, depth*width)
    cells (depth 4 x width 128 = 512 rows ~ 8 KB), the watermark
    expires windows, and the fan-out is ``depth`` narrow rows per
    reading — pure column expressions, whole-stage codegen, no Python
    in the hot path."""
    from ..operators.analyses import CM_SEEDS, _cm_col

    if not 1 <= depth <= len(CM_SEEDS):
        raise ValueError(f"depth must be in [1, {len(CM_SEEDS)}], got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    v = F.col(value_col)
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)]))
    win = F.window(ts_col, every)
    agg = (
        stream_df.where(v.isNotNull())
        .withColumn("_iv", v.cast("long"))
        .withColumn("row", rows)
        .withColumn("row", F.col("row").cast("int"))
        .withColumn("col", _cm_col(F.col("_iv"), F.col("row"), width))
        .withWatermark(ts_col, watermark)
        .groupBy(*key_cols, win, "row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return agg.select(
        *key_cols,
        F.unix_timestamp(F.col("window.start")).cast("long")
        .alias("bin_start"),
        "row", "col", "cnt",
    )
