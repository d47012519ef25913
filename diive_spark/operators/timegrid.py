"""Timestamp/position-grid normalization — the "scan sanitizer" pipeline.

Re-creates the reference's TimestampSanitizer stages
(diive/core/times/times.py:148-244) as declarative DataFrame transforms:

- sort ascending               -> ordering windows (times.py:247-252)
- dedup keep-last              -> row_number desc    (times.py:802-819)
- frequency detection          -> mode-of-deltas with the >=90% rule
                                  (times.py:635-799, share rule :792)
- grid completion              -> sequence + explode (times.py:822-847)
- START/MIDDLE/END conversion  -> +/- freq/2 shifts  (times.py:958-1042)
- per-record freq groups       -> prev/next delta symmetry
                                  (detect_freq_groups, times.py:22-145)

The axis is a generic long (sequence position or unix seconds), so the
same operators serve the tokens graft and timestamped data.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS

START, MIDDLE, END = "start", "middle", "end"
_SHIFT = {  # multiples of freq/2 applied to reach MIDDLE
    (END, MIDDLE): -1,
    (START, MIDDLE): 1,
    (MIDDLE, END): 1,
    (MIDDLE, START): -1,
    (START, END): 2,
    (END, START): -2,
}


def build_axis_range(
    df: DataFrame, start: int, n: int, step: int = 1, axis_col: str = "pos"
) -> DataFrame:
    """Axis column from start + length + step (``build_timestamp_range``,
    times.py:498-510): cross-joinable single-row grid via sequence."""
    return df.sparkSession.range(0, n).select(
        (F.lit(start) + F.col("id") * step).alias(axis_col)
    )


def add_timezone(
    df: DataFrame, ts_col: str, tz: str = "UTC", out_col: str | None = None
) -> DataFrame:
    """tz-localize a naive timestamp column (``add_timezone_info``,
    times.py:1045-1058) — interpret the naive stamps as *tz* wall time,
    store as UTC instants."""
    return df.withColumn(out_col or ts_col, F.to_utc_timestamp(F.col(ts_col), tz))


def dedup_keep_last(
    df: DataFrame,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    order_col: str = "file_order",
) -> DataFrame:
    """Drop duplicate (key, axis) rows keeping the *last* occurrence
    (times.py:802-819 ``remove_index_duplicates(keep='last')``), where
    "last" is defined by ``order_col`` (e.g. file ingestion order)."""
    w = Window.partitionBy(*key_cols, axis_col).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def convert_stamp(
    df: DataFrame,
    freq: int,
    src: str,
    dst: str,
    axis_col: str = "pos",
) -> DataFrame:
    """Shift the axis between START/MIDDLE/END conventions by freq/2
    multiples (times.py:958-1042).  ``freq`` must be even for an exact
    integer MIDDLE (timestamps in seconds, or even token strides)."""
    if src == dst:
        return df
    k = _SHIFT[(src, dst)]
    if k % 2 and freq % 2:
        raise ValueError(f"freq={freq} odd: MIDDLE is not an integer")
    return df.withColumn(axis_col, (F.col(axis_col) + k * freq // 2).cast("long"))


def insert_stamps(
    df: DataFrame, freq: int, convention: str, axis_col: str = "pos"
) -> DataFrame:
    """Add explicit *_START/_MIDDLE/_END columns from the axis + its
    convention (times.py:850-955 ``insert_timestamp``)."""
    a = F.col(axis_col)
    start = {START: a, MIDDLE: a - freq // 2, END: a - freq}[convention]
    return (
        df.withColumn(f"{axis_col}_start", start.cast("long"))
        .withColumn(f"{axis_col}_middle", (start + freq // 2).cast("long"))
        .withColumn(f"{axis_col}_end", (start + freq).cast("long"))
    )


def complete_grid(
    df: DataFrame,
    step: int = 1,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    chunk: int = 65536,
) -> DataFrame:
    """Reindex each series onto its full [min, max] grid, creating explicit
    NULL rows for missing positions (times.py:822-847
    ``continuous_timestamp_freq``).

    Scale note: the grid is generated with a *two-level* sequence+explode
    (chunk starts, then positions within a chunk) so no single row ever
    materializes a giant array — a 10^9-long series explodes via ~15k
    chunk rows instead of one 8 GB array.  The value join is a co-
    partitioned equi-join on (key, axis); with both sides bucketed by key
    it is shuffle-local.
    """
    keys = list(key_cols)
    bounds = df.groupBy(*keys).agg(
        F.min(axis_col).alias("_lo"), F.max(axis_col).alias("_hi")
    )
    span = chunk * step
    grid = (
        bounds.withColumn(
            "_cs", F.explode(F.sequence(F.lit(0), F.floor((F.col("_hi") - F.col("_lo")) / span)))
        )
        .withColumn("_start", F.col("_lo") + F.col("_cs") * span)
        .withColumn(
            axis_col,
            F.explode(
                F.sequence(
                    F.col("_start"),
                    F.least(F.col("_hi"), F.col("_start") + span - step),
                    F.lit(step),
                )
            ),
        )
        .select(*keys, axis_col)
    )
    return grid.join(df, on=keys + [axis_col], how="left")


def detect_freq(
    df: DataFrame,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    share_required: float = 0.9,
) -> DataFrame:
    """Per-series frequency inference — the Spark analog of
    ``DetectFrequency`` (times.py:635-718): mode of successive deltas with
    a >=90% occurrence rule (times.py:792), cross-checked against the
    full-range step ``(max-min)/(n-1)`` (the progressive detector analog).

    Returns per key: ``freq_mode, mode_share, full_range_step, n_deltas,
    freq`` (NULL unless both detectors agree and share >= required)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    deltas = (
        df.select(*keys, axis_col)
        .withColumn("_d", F.col(axis_col) - F.lag(axis_col).over(w))
        .where(F.col("_d").isNotNull())
    )
    per_delta = deltas.groupBy(*keys, "_d").agg(F.count(F.lit(1)).alias("_c"))
    wk = Window.partitionBy(*keys)
    ranked = per_delta.withColumn(
        "_rk", F.row_number().over(wk.orderBy(F.col("_c").desc(), F.col("_d")))
    ).withColumn("_tot", F.sum("_c").over(wk))
    stats = df.groupBy(*keys).agg(
        F.min(axis_col).alias("_lo"),
        F.max(axis_col).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    mode = ranked.where(F.col("_rk") == 1).select(
        *keys,
        F.col("_d").alias("freq_mode"),
        (F.col("_c") / F.col("_tot")).alias("mode_share"),
        F.col("_tot").alias("n_deltas"),
    )
    out = mode.join(stats, on=keys)
    full_step = (F.col("_hi") - F.col("_lo")) / (F.col("_n") - 1)
    return (
        out.withColumn("full_range_step", full_step)
        .withColumn(
            "freq",
            F.when(
                (F.col("mode_share") >= share_required)
                & (F.col("full_range_step") == F.col("freq_mode")),
                F.col("freq_mode"),
            ),
        )
        .drop("_lo", "_hi", "_n")
    )


def freq_groups(
    df: DataFrame,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-record resolution label ``freq_auto`` via the prev/next delta
    symmetry test (detect_freq_groups, times.py:22-145): a record belongs
    to frequency f when it sits exactly f from both neighbours; asymmetric
    transition records inherit the previous label (forward fill)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    sym = (
        df.withColumn("_dp", F.col(axis_col) - F.lag(axis_col).over(w))
        .withColumn("_dn", F.lead(axis_col).over(w) - F.col(axis_col))
        .withColumn("_f", F.when(F.col("_dp") == F.col("_dn"), F.col("_dp")))
    )
    wff = w.rowsBetween(Window.unboundedPreceding, 0)
    # O(n) backward fill via reversed ordering (forward-unbounded frames
    # re-aggregate the suffix per row — quadratic)
    wbf = (
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        sym.withColumn(
            "freq_auto",
            F.coalesce(
                F.last("_f", ignorenulls=True).over(wff),
                F.last("_f", ignorenulls=True).over(wbf),
            ),
        )
        .drop("_dp", "_dn", "_f")
    )
