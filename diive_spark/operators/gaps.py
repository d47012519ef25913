"""Gap engine: run detection, limit-gated interpolation, limited backfill,
and lookup-table / banded similarity fills.

Reference semantics:
- GapFinder (diive/pkgs/analyses/gapfinder.py:58-95): consecutive-NaN runs
  found via a cumsum over an is-numeric flag — the classic gaps-and-islands
  pattern; gaps kept when length <= limit (:105-117), sorted by length
  descending (:93).
- linear_interpolation (diive/pkgs/gapfilling/interpolate.py:8-35):
  interpolate *interior* gaps linearly, then keep fills only inside gaps
  whose length <= limit.  (The reference file has a latent KeyError — it
  reads ``row['min']`` after GapFinder renamed the column to GAP_START;
  we implement the documented intent.)
- limited backfill upsampling (diive/pkgs/qaqc/meteoscreening.py:597-615):
  ``fillna(method='backfill', limit=(freq/target)-1)`` for END-stamped
  lower-resolution groups.
- similarity-window fills (diive/pkgs/flux/uncertainty.py:218-289):
  aggregate over a banded neighborhood, require a minimum count; on the
  tokens graft the neighborhood is (same series, ±W positions) or the
  cross-series lookup table (same source, same position bucket).

Everything is windows + one groupBy; no self-join is needed for the
in-series band because the position axis is integer-valued, so
``rangeBetween(-W, W)`` expresses the band exactly.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS


def _runs(df: DataFrame, axis_col: str, value_col: str, key_cols: Sequence[str]):
    """Attach gaps-and-islands run id + per-gap length columns."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    isnum = F.col(value_col).isNotNull().cast("int")
    out = df.withColumn("_run", F.sum(isnum).over(wrun))
    wgap = Window.partitionBy(*keys, "_run")
    return out.withColumn(
        "_gap_len",
        F.when(
            F.col(value_col).isNull(),
            F.sum(F.col(value_col).isNull().cast("int")).over(wgap),
        ),
    )


def gap_runs(
    df: DataFrame,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    limit: int | None = None,
) -> DataFrame:
    """Gap table: one row per consecutive-NULL run with
    ``gap_start, gap_end, gap_length`` (GapFinder parity: min/max/count of
    the run, gapfinder.py:77-81; limit filter :105-117)."""
    keys = list(key_cols)
    runs = _runs(df, axis_col, value_col, key_cols)
    gaps = (
        runs.where(F.col(value_col).isNull())
        .groupBy(*keys, "_run")
        .agg(
            F.min(axis_col).alias("gap_start"),
            F.max(axis_col).alias("gap_end"),
            F.count(F.lit(1)).alias("gap_length"),
        )
        .drop("_run")
    )
    if limit is not None:
        gaps = gaps.where(F.col("gap_length") <= limit)
    return gaps.orderBy(F.col("gap_length").desc(), *keys, "gap_start")


def interpolate_limited(
    df: DataFrame,
    limit: int = 3,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str | None = None,
    dense_grid: bool = False,
) -> DataFrame:
    """Linear interpolation of interior gaps of length <= limit
    (interpolate.py:8-35 intent).  Adds ``out_col`` (default
    ``{value_col}_gf``) plus a ``{out_col}_flag`` (0 observed, 1 filled).

    Interpolation is in axis units: ``prev + (next-prev) * (a-pa)/(na-pa)``
    — identical to pandas linear interpolation on a regular grid.

    ``dense_grid=True`` asserts one row per axis step (the normal state
    after ``complete_grid``): gap length is then ``next_a - prev_a - 1``
    and the run-id shuffle is skipped entirely — one window spec, one
    sort, no extra exchange.
    """
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_gf"
    w = Window.partitionBy(*keys).orderBy(axis_col)
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    # NB: a (current, unboundedFollowing) frame is O(n^2) per partition
    # in Spark (the suffix is re-aggregated per row); the O(n) form is a
    # running last() over the REVERSED ordering.
    wfr = (
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v, a = F.col(value_col), F.col(axis_col)
    vnn = F.when(v.isNotNull(), v)
    ann = F.when(v.isNotNull(), a)

    prev_v = F.last(vnn, ignorenulls=True).over(wp)
    prev_a = F.last(ann, ignorenulls=True).over(wp)
    next_v = F.last(vnn, ignorenulls=True).over(wfr)
    next_a = F.last(ann, ignorenulls=True).over(wfr)
    interp = prev_v + (next_v - prev_v) * (a - prev_a) / (next_a - prev_a)
    if dense_grid:
        runs = df
        gap_len = next_a - prev_a - 1
    else:
        runs = _runs(df, axis_col, value_col, key_cols)
        gap_len = F.col("_gap_len")
    fillable = (
        v.isNull()
        & (gap_len <= limit)
        & prev_v.isNotNull()
        & next_v.isNotNull()
    )
    out = (
        runs.withColumn(out_col, F.when(fillable, interp).otherwise(v))
        .withColumn(
            f"{out_col}_flag",
            F.when(v.isNotNull(), F.lit(0)).when(fillable, F.lit(1)),
        )
    )
    return out if dense_grid else out.drop("_run", "_gap_len")


def backfill_limited(
    df: DataFrame,
    limit: int,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str | None = None,
) -> DataFrame:
    """``bfill(limit=k)`` — fill NULL with the next non-null value if it
    lies within the next ``limit`` rows (meteoscreening.py:597-615:
    END-stamped upsampling uses backfill with limit = freq/target - 1)."""
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_bf"
    w = (
        Window.partitionBy(*keys)
        .orderBy(axis_col)
        .rowsBetween(1, limit)
    )
    nxt = F.first(F.when(F.col(value_col).isNotNull(), F.col(value_col)), ignorenulls=True).over(w)
    return df.withColumn(out_col, F.coalesce(F.col(value_col), nxt))


def banded_fill(
    df: DataFrame,
    band: int,
    agg: str = "median",
    min_vals: int = 5,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str | None = None,
) -> DataFrame:
    """Similarity-window fill within a series: aggregate non-null values in
    the ±band neighborhood of each gap, require >= min_vals values
    (uncertainty.py:218-289 semantics with the meteo-similarity predicates
    specialized to the position band).  ``rangeBetween`` keeps this a
    single window pass — no O(n²) self-join."""
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_lookupfill"
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).cast("long"))
        .rangeBetween(-band, band)
    )
    v = F.col(value_col)
    aggfn = {
        "median": F.percentile(v, F.lit(0.5)),  # median() disallowed over frames
        "mean": F.avg(v),
        "std": F.stddev_samp(v),
    }[agg]
    return (
        df.withColumn("_band_n", F.count(v).over(w))
        .withColumn("_band_agg", aggfn.over(w))
        .withColumn(
            out_col,
            F.when(
                v.isNull() & (F.col("_band_n") >= min_vals), F.col("_band_agg")
            ).otherwise(v),
        )
        .drop("_band_n", "_band_agg")
    )


def lookup_table_fill(
    df: DataFrame,
    bucket: int,
    agg: str = "median",
    min_vals: int = 5,
    axis_col: str = "pos",
    value_col: str = "value",
    group_col: str = "source",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str | None = None,
) -> DataFrame:
    """Cross-series lookup-table fill: build a small (group, pos-bucket)
    aggregate table over observed values and broadcast-join it onto gaps
    (the MDS-style lookup-table fill of the north star; reference analog:
    the per-neighborhood medians of uncertainty.py:291-355).

    The lookup table is tiny relative to the fact table (``n_groups *
    n_buckets`` rows) → broadcast join, no shuffle of the big side.
    """
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_ltf"
    v = F.col(value_col)
    b = F.floor(F.col(axis_col) / bucket).alias("_bkt")
    aggfn = {"median": F.median(v), "mean": F.avg(v)}[agg]
    table = (
        df.where(v.isNotNull())
        .groupBy(group_col, b)
        .agg(aggfn.alias("_lt_val"), F.count(v).alias("_lt_n"))
    )
    joined = df.withColumn("_bkt", F.floor(F.col(axis_col) / bucket)).join(
        F.broadcast(table), on=[group_col, "_bkt"], how="left"
    )
    return (
        joined.withColumn(
            out_col,
            F.when(v.isNull() & (F.col("_lt_n") >= min_vals), F.col("_lt_val")).otherwise(v),
        )
        .drop("_bkt", "_lt_val", "_lt_n")
    )
