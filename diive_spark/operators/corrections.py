"""Value-rewrite corrections (reference diive/pkgs/corrections/*).

- setto_threshold (setto_threshold.py:9-73): clamp above/below a
  threshold, flag 1 where corrected.
- setto_value (setto_value.py:4-39): constant inside axis ranges.
- offset corrections (offsetcorrection.py): per-bucket offset derived
  from a stratum (nighttime analog), broadcast back onto the hi-res
  series via the aggregated-as-hires pattern (core/dfun/frames.py:37-91
  window-aggregate + join-back), subtract, clamp.
- wind-direction offset (winddiroffset.py:17-141): per-period histogram
  correlation sweep against a reference period, arg-max offset, wrap to
  [0, 360).
- circular aggregation (Kanda) lives in functions/circular.py.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import FLAG_SOFT, KEY_COLS


def setto_threshold(
    df: DataFrame,
    threshold: float,
    mode: str = "above",
    value_col: str = "value",
    flag_col: str | None = None,
) -> DataFrame:
    """Clamp values beyond *threshold* to the threshold, flag 1 where
    corrected (setto_threshold.py:9-73)."""
    v = F.col(value_col)
    hit = (v > threshold) if mode == "above" else (v < threshold)
    out = df
    if flag_col:
        # flag must be computed BEFORE value_col is overwritten — column
        # expressions resolve by name at plan time
        out = out.withColumn(
            flag_col,
            F.when(v.isNull(), F.lit(None).cast("int"))
            .when(hit, F.lit(FLAG_SOFT))
            .otherwise(F.lit(0)),
        )
    return out.withColumn(
        value_col, F.when(hit, F.lit(float(threshold))).otherwise(v)
    )


def setto_value(
    df: DataFrame,
    ranges: Sequence[tuple[int, int]],
    value: float,
    axis_col: str = "pos",
    value_col: str = "value",
) -> DataFrame:
    """Set values inside [from, to] axis ranges to a constant
    (setto_value.py:4-39)."""
    a = F.col(axis_col)
    hit = F.lit(False)
    for lo, hi in ranges:
        hit = hit | a.between(lo, hi)
    return df.withColumn(
        value_col, F.when(hit, F.lit(float(value))).otherwise(F.col(value_col))
    )


def remove_stratum_offset(
    df: DataFrame,
    stratum_col: str,
    bucket: int,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    zero_stratum: bool = True,
    clamp_negative: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Radiation-zero-offset pattern (offsetcorrection.py:71-160):
    offset = per-bucket mean of the reference stratum (nighttime analog:
    rows where ``stratum_col`` is true), missing buckets fall back to the
    per-series median offset; subtract the offset; optionally force the
    reference stratum to 0 and clamp negatives to 0.

    Implemented as a window aggregate over (key, bucket) + per-series
    median fallback — the aggregated-as-hires join-back collapses into
    two window passes, no join.
    """
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_offsetcorr"
    v = F.col(value_col)
    b = F.floor(F.col(axis_col) / bucket)
    tmp = df.withColumn("_bkt", b)
    wb = Window.partitionBy(*keys, "_bkt")
    wk = Window.partitionBy(*keys)
    night_v = F.when(F.col(stratum_col), v)
    offset_bkt = F.avg(night_v).over(wb)
    tmp = tmp.withColumn("_off_b", offset_bkt)
    offset = F.coalesce(
        F.col("_off_b"), F.percentile(F.col("_off_b"), F.lit(0.5)).over(wk)
    )
    corrected = v - offset
    if zero_stratum:
        corrected = F.when(F.col(stratum_col), F.lit(0.0)).otherwise(corrected)
    if clamp_negative:
        corrected = F.greatest(corrected, F.lit(0.0))
    return tmp.withColumn(out_col, corrected).drop("_bkt", "_off_b")


def remove_high_bound_offset(
    df: DataFrame,
    bound: float,
    bucket: int,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str | None = None,
) -> DataFrame:
    """Relative-humidity-offset pattern (offsetcorrection.py:9-67):
    per-bucket offset = mean of (value - bound) over values exceeding
    *bound*; missing buckets inherit the nearest previous bucket's offset
    (ffill) then bfill; subtract."""
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_offsetcorr"
    v = F.col(value_col)
    tmp = df.withColumn("_bkt", F.floor(F.col(axis_col) / bucket))
    wb = Window.partitionBy(*keys, "_bkt")
    over = F.when(v > bound, v - bound)
    tmp = tmp.withColumn("_off_b", F.avg(over).over(wb))
    wo = Window.partitionBy(*keys).orderBy(axis_col)
    ff = F.last("_off_b", ignorenulls=True).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)
    )
    # O(n) bfill via reversed ordering (forward-unbounded is quadratic)
    bf = F.last("_off_b", ignorenulls=True).over(
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offset = F.coalesce(ff, bf, F.lit(0.0))
    return tmp.withColumn(out_col, v - offset).drop("_bkt", "_off_b")


def wind_direction_offset(
    df: DataFrame,
    period_col: str,
    ref_periods: Sequence[object],
    value_col: str = "value",
    offsets: Sequence[int] = tuple(range(-100, 101)),
    n_sector_bins: int = 360,
) -> DataFrame:
    """WindDirOffset (winddiroffset.py:17-141): for each period, sweep
    candidate offsets, build the 360-bin histogram of (value+offset) mod
    360, correlate against the reference-periods histogram, pick the
    offset with max |r|.  Returns (period, best_offset, r).

    Declarative sweep: explode the offset list (no driver loop), one
    groupBy for all (period, offset, sector) counts, one for the
    correlation, a rank to pick the winner.
    """
    v = F.col(value_col)
    ref_hist = (
        df.where(F.col(period_col).isin(list(ref_periods)))
        .groupBy(F.floor(v % 360).alias("sector"))
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )
    swept = df.withColumn(
        "offset", F.explode(F.array(*[F.lit(o) for o in offsets]))
    )
    hist = swept.groupBy(
        period_col,
        "offset",
        F.floor(F.pmod(v + F.col("offset"), F.lit(360.0))).alias("sector"),
    ).agg(F.count(F.lit(1)).alias("n"))
    joined = hist.join(F.broadcast(ref_hist), on="sector", how="inner")
    corr = joined.groupBy(period_col, "offset").agg(
        F.corr("n", "ref_n").alias("r")
    )
    w = Window.partitionBy(period_col).orderBy(
        F.abs(F.col("r")).desc(), F.col("offset")
    )
    return (
        corr.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(period_col, F.col("offset").alias("best_offset"), "r")
    )


def apply_wind_offset(
    df: DataFrame,
    offsets_df: DataFrame,
    period_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Apply per-period offsets, wrap into [0, 360)
    (winddiroffset.py:120-141)."""
    out = df.join(F.broadcast(offsets_df), on=period_col, how="left")
    corrected = F.pmod(
        F.col(value_col) + F.coalesce(F.col("best_offset"), F.lit(0)), F.lit(360.0)
    )
    return out.withColumn(value_col, corrected).drop("best_offset", "r")


def decode_bitfield(
    df: DataFrame,
    src_col: str,
    bit_start: int,
    bit_end: int,
    gain: float = 1.0,
    out_col: str = "decoded",
) -> DataFrame:
    """Extract bit range [bit_start, bit_end) from an int column and apply
    a gain (diive/pkgs/binary/extract.py:5-108) — pure JVM bit ops."""
    width = bit_end - bit_start
    mask = (1 << width) - 1
    val = F.shiftright(F.col(src_col), bit_start).bitwiseAND(F.lit(mask))
    return df.withColumn(out_col, val * F.lit(gain))
