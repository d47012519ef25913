"""Flux-science operators (reference diive/pkgs/flux/*,
diive/pkgs/echires/fluxdetectionlimit.py) — the declarative rewrites of
the reference's per-row Python loops:

- USTAR threshold scenarios (ustarthreshold.py:14-130): explode the
  threshold list, null-out sub-threshold values, count survivors per
  stratum — one groupBy for the whole sweep.
- lagged cross-covariance scan (fluxdetectionlimit.py:147-359, loop
  :211-231): explode the lag range, covariance per lag via
  ``covar_samp(w, lead(c, k))`` — no driver loop.
- random uncertainty (uncertainty.py:218-289): banded similarity
  aggregate -> std where >= min_vals (gaps.banded_fill with agg='std');
  cumulative propagation sqrt(sum(unc^2)) (:108-138).
- daily resample with full-day gate (criticaldays.py:291-300): offset
  day buckets kept only when complete.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS


def ustar_scenarios(
    df: DataFrame,
    thresholds: Sequence[float],
    ustar_col: str = "ustar",
    value_col: str = "value",
    strata_col: str | None = None,
) -> DataFrame:
    """Per threshold u: values where ustar < u become NULL; count
    survivors (optionally per stratum).  The whole sweep is one explode
    + one groupBy (ustarthreshold.py:14-130)."""
    swept = df.withColumn(
        "ustar_threshold",
        F.explode(F.array(*[F.lit(float(u)) for u in thresholds])),
    )
    kept = F.when(
        F.col(ustar_col) >= F.col("ustar_threshold"), F.col(value_col)
    )
    group = ["ustar_threshold"] + ([strata_col] if strata_col else [])
    return swept.groupBy(*group).agg(
        F.count(kept).alias("n_survivors"),
        F.count(F.col(value_col)).alias("n_total"),
        F.avg(kept).alias("mean_surviving"),
    )


def lagged_crosscovariance(
    df: DataFrame,
    w_col: str,
    c_col: str,
    lags: Sequence[int],
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Cross-covariance of w against c shifted by each lag
    (fluxdetectionlimit.py:211-231 rewritten without the Python loop):
    per lag k, cov = covar_samp(w_t, c_(t+k)).  Returns one row per
    (key, lag) with the covariance and |cov| rank (max-|cov| lag =
    rank 1)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    shifted = df
    for k in lags:
        col = F.lead(c_col, k).over(w) if k >= 0 else F.lag(c_col, -k).over(w)
        shifted = shifted.withColumn(f"_c_{k}", col)
    stacked = shifted.select(
        *keys,
        F.col(w_col).alias("_w"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in lags]),
                F.array(*[F.col(f"_c_{k}") for k in lags]),
            )
        ).alias("lag", "_c"),
    )
    cov = stacked.groupBy(*keys, "lag").agg(
        F.covar_samp("_w", "_c").alias("cov"),
        F.count(F.when(F.col("_w").isNotNull() & F.col("_c").isNotNull(), 1)).alias("n"),
    )
    rk = Window.partitionBy(*keys).orderBy(F.abs(F.col("cov")).desc(), F.col("lag"))
    return cov.withColumn("abs_rank", F.row_number().over(rk))


def detection_limit_from_far_lags(
    cov_df: DataFrame,
    far_lag_min: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Flux detection limit = RMSE of covariances at far lags
    (fluxdetectionlimit.py:233-260 analog): sqrt(mean(cov^2)) over
    |lag| >= far_lag_min."""
    keys = list(key_cols)
    far = cov_df.where(F.abs(F.col("lag")) >= far_lag_min)
    return far.groupBy(*keys).agg(
        F.sqrt(F.avg(F.col("cov") * F.col("cov"))).alias("detection_limit"),
        F.count(F.lit(1)).alias("n_far_lags"),
    )


def random_uncertainty_banded(
    df: DataFrame,
    band: int,
    min_vals: int = 5,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """RANDUNC method-1 analog (uncertainty.py:218-289): per record, the
    std of similar values in the ±band neighborhood (>= min_vals values
    required), as an ``unc`` column."""
    keys = list(key_cols)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(axis_col).cast("long"))
        .rangeBetween(-band, band)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    sd = F.stddev_samp(v).over(w)
    return df.withColumn("unc", F.when(n >= min_vals, sd))


def propagate_uncertainty(
    df: DataFrame,
    unc_col: str = "unc",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Cumulative propagation sqrt(sum(unc^2)) per series
    (uncertainty.py:108-138)."""
    return df.groupBy(*key_cols).agg(
        F.sqrt(F.sum(F.col(unc_col) * F.col(unc_col))).alias("unc_propagated"),
        F.count(unc_col).alias("n_unc"),
    )


def daily_full_gate(
    df: DataFrame,
    bucket: int,
    required: int,
    offset: int = 0,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Offset day-bucket aggregate kept only when the bucket is complete
    (criticaldays.py:291-300: resample('D', offset='7H') with
    count==48 gate)."""
    keys = list(key_cols)
    b = F.floor((F.col(axis_col) - offset) / bucket)
    v = F.col(value_col)
    return (
        df.groupBy(*keys, b.alias("day_bucket"))
        .agg(F.count(v).alias("n"), F.avg(v).alias("mean"), F.sum(v).alias("sum"))
        .where(F.col("n") == required)
    )
