"""Screening pipeline orchestration — the engine's EP2.

Mirrors StepwiseOutlierDetection / StepwiseMeteoScreeningDb /
FluxProcessingChain (reference
diive/pkgs/outlierdetection/stepwiseoutlierdetection.py:24-286,
diive/pkgs/qaqc/meteoscreening.py:120-533,
diive/pkgs/fluxprocessingchain/fluxprocessingchain.py:20-841):
an ordered battery of flag tests appended as columns (duplicate test ids
deduped with _2 suffixes, stepwiseoutlierdetection.py:227-255), a QCF
combiner, corrections on the filtered series, and a final min-count
gated resample — all composed lazily into ONE DataFrame plan, so
Catalyst optimizes across stage boundaries (the reference materializes
between every step; we don't).

Also: multi-resolution harmonization (meteoscreening.py:540-719) —
per-record frequency groups, usage-share thresholding, limited backfill
upsampling onto the highest-resolution grid.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..conventions import KEY_COLS
from . import gaps, outliers, qcf, resample, timegrid


class ScreeningPipeline:
    """Chainable flag battery -> QCF -> corrections -> gated rollup."""

    def __init__(
        self,
        df: DataFrame,
        value_col: str = "value",
        axis_col: str = "pos",
        key_cols: Sequence[str] = KEY_COLS,
    ):
        self.df = df
        self.value_col = value_col
        self.axis_col = axis_col
        self.key_cols = list(key_cols)
        self.flag_cols: list[str] = []

    def _register(self, name: str) -> str:
        # dedup repeated test names with _2/_3 suffixes
        # (stepwiseoutlierdetection.py:227-255)
        final = name
        k = 1
        while final in self.flag_cols:
            k += 1
            final = f"{name}_{k}"
        self.flag_cols.append(final)
        return final

    def _kw(self):
        return dict(value_col=self.value_col, key_cols=self.key_cols)

    # ---------------------------------------------------------- flag tests
    def flag_zscore(self, thres: float = 4.0, strata_col: str | None = None):
        col = self._register("flag_zscore")
        self.df = outliers.zscore_flag(
            self.df, thres=thres, strata_col=strata_col, flag_col=col, **self._kw()
        )
        return self

    def flag_zscore_increments(self, thres: float = 30.0):
        col = self._register("flag_zscore_incr")
        self.df = outliers.zscore_increments_flag(
            self.df, thres=thres, axis_col=self.axis_col, flag_col=col, **self._kw()
        )
        return self

    def flag_local_sd(self, winsize: int, n_sd: float = 7.0):
        col = self._register("flag_localsd")
        self.df = outliers.local_sd_flag(
            self.df, winsize=winsize, n_sd=n_sd, axis_col=self.axis_col,
            flag_col=col, **self._kw()
        )
        return self

    def flag_abs_limits(self, lo: float, hi: float):
        col = self._register("flag_abslim")
        self.df = outliers.abs_limits_flag(
            self.df, lo=lo, hi=hi, value_col=self.value_col, flag_col=col
        )
        return self

    def flag_manual(self, ranges: Sequence[tuple[int, int]]):
        col = self._register("flag_manual")
        self.df = outliers.manual_removal_flag(
            self.df, ranges=ranges, axis_col=self.axis_col,
            value_col=self.value_col, flag_col=col
        )
        return self

    def flag_missing(self):
        col = self._register("flag_missing")
        self.df = outliers.missing_vals_flag(
            self.df, value_col=self.value_col, flag_col=col
        )
        return self

    # ------------------------------------------------------------ finalize
    def finalize_qcf(self) -> "ScreeningPipeline":
        """QCF from all collected flags + filtered value column
        (meteoscreening.py:508-533)."""
        self.df = qcf.qcf_flag(self.df, self.flag_cols)
        self.df = qcf.apply_qcf(self.df, value_col=self.value_col)
        self.filtered_col = f"{self.value_col}_qcf"
        return self

    def correct(self, fn: Callable[[DataFrame], DataFrame]) -> "ScreeningPipeline":
        """Apply a correction function to the (flagged) frame."""
        self.df = fn(self.df)
        return self

    def resample(
        self, every: int, mincounts_perc: float = 0.25, use_filtered: bool = True
    ) -> DataFrame:
        """Final gated rollup of the (filtered) series
        (meteoscreening.py:482-506 -> resampling.py:13-132)."""
        vcol = getattr(self, "filtered_col", self.value_col) if use_filtered \
            else self.value_col
        return resample.bucket_rollup(
            self.df, every=every, axis_col=self.axis_col, value_col=vcol,
            key_cols=self.key_cols, mincounts_perc=mincounts_perc,
        )


def harmonize_multires(
    df: DataFrame,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    min_share: float = 0.0001,
) -> DataFrame:
    """Multi-resolution harmonization (meteoscreening.py:540-719):

    1. per-record frequency label via prev/next delta symmetry
       (detect_freq_groups, times.py:22-145);
    2. drop records of frequencies covering < min_share of the series
       (the >0.01% rule, meteoscreening.py:697-708);
    3. target resolution = highest (smallest step) remaining (:710);
    4. reindex onto the target grid and backfill each lower-resolution
       group with limit = freq/target - 1 (END-stamp convention,
       :597-615).
    """
    keys = list(key_cols)
    labeled = timegrid.freq_groups(df, axis_col=axis_col, key_cols=keys)
    counts = labeled.groupBy(*keys, "freq_auto").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    wk = Window.partitionBy(*keys)
    keep = counts.withColumn("_tot", F.sum("_c").over(wk)).where(
        F.col("_c") / F.col("_tot") >= min_share
    )
    target = keep.groupBy(*keys).agg(F.min("freq_auto").alias("_target"))
    kept = labeled.join(keep.select(*keys, "freq_auto"), on=keys + ["freq_auto"])
    kept = kept.join(F.broadcast(target), on=keys)
    # grid at target resolution, then per-row backfill with the
    # group-specific limit (freq/target - 1)
    grid = timegrid.complete_grid(
        kept.select(*keys, axis_col, value_col, "freq_auto", "_target"),
        step=1, axis_col=axis_col, key_cols=keys,
    )
    # limit varies per gap; implement as: next value within
    # (next freq_auto / target - 1) rows.  Use the following record's
    # freq label (END convention: a value stamped at t covers (t-f, t]).
    w = Window.partitionBy(*keys).orderBy(axis_col)
    # O(n) "next non-null" via reversed ordering (a forward-unbounded
    # frame re-aggregates the suffix per row — quadratic)
    wnext = (
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt_v = F.last(value_col, ignorenulls=True).over(wnext)
    nxt_a = F.last(
        F.when(F.col(value_col).isNotNull(), F.col(axis_col)), ignorenulls=True
    ).over(wnext)
    nxt_f = F.last(
        F.when(F.col(value_col).isNotNull(), F.col("freq_auto")), ignorenulls=True
    ).over(wnext)
    tgt = F.first("_target", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    dist = nxt_a - F.col(axis_col)
    limit = (nxt_f / tgt - 1).cast("long")
    filled = F.when(
        F.col(value_col).isNull() & (dist <= limit), nxt_v
    ).otherwise(F.col(value_col))
    return grid.withColumn(f"{value_col}_harmonized", filled).drop(
        "freq_auto", "_target"
    )
