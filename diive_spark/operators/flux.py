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


def _flux_band(flux_col):
    """PAS20 similarity half-width: max(0.2 * flux, 2) — the reference
    compares the SIGNED 20% against 2 (uncertainty.py:328-331), so a
    negative flux always gets the +/-2 floor."""
    return F.greatest(F.col(flux_col) * 0.2, F.lit(2.0))


def random_uncertainty_m2(
    df: DataFrame,
    day_len: int,
    wdays: int = 5,
    wtod: int = 2,
    axis_col: str = "pos",
    flux_col: str = "flux_gf",
    unc_col: str = "unc",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """RANDUNC method 2 (uncertainty.py:291-355): rows still missing
    method-1 uncertainty get the MEDIAN of method-1 values over a
    +/-``wdays`` day, +/-``wtod`` time-of-day window restricted to
    similar fluxes (within flux +/- max(20%, 2)).

    Spark shape: the day band becomes an equi-join on exploded day
    buckets (each missing row probes 2*wdays+1 buckets), the
    time-of-day and flux bands are join filters — a bucketed banded
    join, never a per-row loop or cross product.  The missing side is
    tiny (only method-1 failures), so it is broadcast.
    """
    keys = list(key_cols)
    day = (F.col(axis_col).cast("long") / day_len).cast("long")
    tod = F.pmod(F.col(axis_col).cast("long"), F.lit(day_len))
    d = df.withColumn("_day", day).withColumn("_tod", tod)
    missing = d.where(F.col(unc_col).isNull()).select(
        *keys, axis_col, F.col(flux_col).alias("_f"),
        F.col("_day").alias("_d0"), F.col("_tod").alias("_t0"),
    )
    scored = d.where(F.col(unc_col).isNotNull()).select(
        *keys, F.col("_day").alias("_dr"), F.col("_tod").alias("_tr"),
        F.col(flux_col).alias("_fr"), F.col(unc_col).alias("_ur"),
    )
    probe = missing.withColumn(
        "_dr", F.explode(F.sequence(F.col("_d0") - wdays, F.col("_d0") + wdays))
    )
    add = F.greatest(F.col("_f") * 0.2, F.lit(2.0))
    # circular time-of-day distance (pandas between_time wraps midnight)
    tdiff = F.abs(F.col("_t0") - F.col("_tr"))
    j = (
        F.broadcast(probe).join(scored, on=keys + ["_dr"])
        .where(F.least(tdiff, day_len - tdiff) <= wtod)
        .where(F.col("_fr").between(F.col("_f") - add, F.col("_f") + add))
    )
    m2 = j.groupBy(*keys, axis_col).agg(
        F.percentile(F.col("_ur"), F.lit(0.5)).alias("_unc_m2"),
        F.count(F.col("_ur")).alias("_n_m2"),
    )
    out = d.join(m2, on=keys + [axis_col], how="left")
    return (
        out.withColumn(
            "unc_method",
            F.when(F.col(unc_col).isNotNull(), F.lit(1)).when(
                F.col("_unc_m2").isNotNull(), F.lit(2)
            ),
        )
        .withColumn(unc_col, F.coalesce(F.col(unc_col), F.col("_unc_m2")))
        .drop("_unc_m2", "_n_m2", "_day", "_tod")
    )


def random_uncertainty_m3(
    df: DataFrame,
    flux_col: str = "flux_gf",
    unc_col: str = "unc",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """RANDUNC method 3 (uncertainty.py:357-395): any row still missing
    uncertainty after method 2 takes the median uncertainty of ALL
    similar fluxes in the series (same +/-max(20%, 2) band, no time
    window).  Left-over rows are few, so they broadcast against the
    scored rows — a per-key band join, no loop."""
    keys = list(key_cols)
    miss = df.where(F.col(unc_col).isNull())
    scored = df.where(F.col(unc_col).isNotNull()).select(
        *keys, F.col(flux_col).alias("_fr"), F.col(unc_col).alias("_ur")
    )
    j = (
        F.broadcast(miss.select(*keys, flux_col).dropDuplicates())
        .join(scored, on=keys)
        .where(
            F.col("_fr").between(
                F.col(flux_col) - F.greatest(F.col(flux_col) * 0.2, F.lit(2.0)),
                F.col(flux_col) + F.greatest(F.col(flux_col) * 0.2, F.lit(2.0)),
            )
        )
    )
    m3 = j.groupBy(*keys, flux_col).agg(
        F.percentile(F.col("_ur"), F.lit(0.5)).alias("_unc_m3")
    )
    out = df.join(m3, on=keys + [flux_col], how="left")
    return (
        out.withColumn(
            "unc_method",
            F.coalesce(
                F.col("unc_method") if "unc_method" in df.columns else F.lit(None).cast("int"),
                F.when(F.col("_unc_m3").isNotNull() & F.col(unc_col).isNull(), F.lit(3)),
            ),
        )
        .withColumn(unc_col, F.coalesce(F.col(unc_col), F.col("_unc_m3")))
        .drop("_unc_m3")
    )


def random_uncertainty_pas20(
    df: DataFrame,
    band: int,
    day_len: int,
    wdays: int = 5,
    wtod: int = 2,
    min_vals: int = 5,
    axis_col: str = "pos",
    value_col: str = "value",
    flux_col: str = "flux_gf",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Full PAS20 RANDUNC cascade (uncertainty.py:218-395): method 1
    (banded std) -> method 2 (windowed similar-flux median) -> method 3
    (global similar-flux median), with ``unc_method`` in {1,2,3}."""
    m1 = random_uncertainty_banded(
        df, band=band, min_vals=min_vals, axis_col=axis_col,
        value_col=value_col, key_cols=key_cols,
    )
    m2 = random_uncertainty_m2(
        m1, day_len=day_len, wdays=wdays, wtod=wtod, axis_col=axis_col,
        flux_col=flux_col, key_cols=key_cols,
    )
    return random_uncertainty_m3(m2, flux_col=flux_col, key_cols=key_cols)


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


def critical_heat_days_p95(
    daily_df: DataFrame,
    ta: str,
    vpd: str,
    flux: str,
    n_bins: int = 20,
    key_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """FluxCriticalHeatDaysP95 (criticalheatdays.py:19-473): percentile-
    bin daily TA and VPD; critical heat days = both drivers in the top
    (95th+) bin, near-critical = both in the 90-95th bin; thresholds =
    driver extremes of those subsets; combo-bin flux stats with the
    equal / TA-higher / VPD-higher scenario split.

    Returns {"binned", "combobins", "thresholds"} DataFrames.  Built
    from the scale-safe quantile binning — no global sort.
    """
    from .analyses import quantile_bins

    keys = list(key_cols)
    step = 100 // n_bins
    b1 = quantile_bins(
        daily_df.where(F.col(vpd).isNotNull() & F.col(flux).isNotNull()),
        ta, n_bins, "_bt", keys, tiebreak_cols,
    )
    b2 = quantile_bins(b1, vpd, n_bins, "_bv", keys, tiebreak_cols)
    binned = (
        b2.withColumn("bin_ta", (F.col("_bt") - 1) * step)
        .withColumn("bin_vpd", (F.col("_bv") - 1) * step)
        .withColumn("bin_diff", F.col("bin_ta") - F.col("bin_vpd"))
        .drop("_bt", "_bv")
    )
    z = F.col(flux)
    combobins = binned.groupBy(*keys, "bin_ta", "bin_vpd").agg(
        F.avg(z).alias("flux_mean"),
        F.stddev_samp(z).alias("flux_sd"),
        F.count(z).alias("n"),
        F.min(ta).alias("ta_min"), F.max(ta).alias("ta_max"),
        F.min(vpd).alias("vpd_min"), F.max(vpd).alias("vpd_max"),
    )
    top = 100 - step
    near = 100 - 2 * step
    chd = F.col("bin_ta").eqNullSafe(top) & F.col("bin_vpd").eqNullSafe(top)
    nchd = F.col("bin_ta").eqNullSafe(near) & F.col("bin_vpd").eqNullSafe(near)
    thresholds = binned.groupBy(*keys).agg(
        F.min(F.when(chd, F.col(ta))).alias("thres_chd_ta"),
        F.min(F.when(chd, F.col(vpd))).alias("thres_chd_vpd"),
        F.min(F.when(nchd, F.col(ta))).alias("thres_nchd_ta_lo"),
        F.max(F.when(nchd, F.col(ta))).alias("thres_nchd_ta_hi"),
        F.min(F.when(nchd, F.col(vpd))).alias("thres_nchd_vpd_lo"),
        F.max(F.when(nchd, F.col(vpd))).alias("thres_nchd_vpd_hi"),
        F.count(F.when(chd, 1)).alias("n_chd"),
        F.count(F.when(nchd, 1)).alias("n_nchd"),
    )
    return {"binned": binned, "combobins": combobins, "thresholds": thresholds}


def co2_penalty(
    df: DataFrame,
    ta: str,
    vpd: str,
    nep: str,
    thres_chd_ta: float,
    thres_chd_vpd: float,
    day_len: int,
    period_len: int | None = None,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    **rf_kwargs,
) -> tuple[DataFrame, DataFrame]:
    """CO2penalty (co2_penalty.py:25-393): flag critical-heat days
    (daily max TA AND VPD above thresholds), remove the flux on those
    days, RF-gapfill the removed stretch from the remaining data, and
    PENALTY = gapfilled - observed (the carbon uptake lost to heat),
    with running cumulatives and per-period sums.

    Spark shape: daily flags via one day-bucket aggregate broadcast
    back (no resample loop), the gap-fill is the distributed
    :func:`diive_spark.operators.ml_gapfill.rf_gapfill`, cumulatives
    are per-key ordered windows.

    Returns (hires_df, per_period_df).
    """
    from .ml_gapfill import rf_gapfill

    keys = list(key_cols)
    day = F.expr(f"CAST({axis_col} AS BIGINT) div {int(day_len)}")
    d = df.withColumn("_day", day)
    daily = d.groupBy(*keys, "_day").agg(
        F.max(ta).alias("_ta_max"), F.max(vpd).alias("_vpd_max")
    )
    flagged = d.join(daily, on=keys + ["_day"], how="left").withColumn(
        "flag_chd",
        (
            (F.col("_ta_max") > thres_chd_ta)
            & (F.col("_vpd_max") > thres_chd_vpd)
        ).cast("int"),
    )
    limited = flagged.withColumn(
        "_nep_limited",
        F.when(F.col("flag_chd") == 1, F.lit(None).cast("double")).otherwise(
            F.col(nep)
        ),
    )
    gf, scores = rf_gapfill(
        limited, target_col="_nep_limited", axis_col=axis_col,
        key_cols=keys, **rf_kwargs,
    )
    out = gf.withColumn(
        "penalty", F.col("_nep_limited_gfRF") - F.col(nep)
    )
    wc = Window.partitionBy(*keys).orderBy(axis_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = (
        out.withColumn("cumsum_nep", F.sum(nep).over(wc))
        .withColumn("cumsum_nep_gf", F.sum("_nep_limited_gfRF").over(wc))
        .withColumn("cumsum_penalty", F.sum("penalty").over(wc))
    )
    plen = period_len or day_len * 365
    period = F.expr(f"CAST({axis_col} AS BIGINT) div {int(plen)}")
    per_period = (
        out.withColumn("_period", period)
        .groupBy(*keys, "_period")
        .agg(
            F.sum("penalty").alias("penalty_sum"),
            F.sum(nep).alias("nep_sum"),
            F.sum("_nep_limited_gfRF").alias("nep_gf_sum"),
            (F.count_distinct(F.when(F.col("flag_chd") == 1, F.col("_day"))))
            .alias("num_chds"),
        )
    )
    return out.drop("_ta_max", "_vpd_max"), per_period


def ustar_mpt_threshold(
    df: DataFrame,
    nee_col: str = "nee",
    ta_col: str = "ta",
    ustar_col: str = "ustar",
    season_col: str | None = None,
    tiebreak_col: str | None = None,
    n_ta_classes: int = 6,
    n_ustar_classes: int = 20,
    plateau_frac: float = 0.99,
    plateau_ahead: int = 10,
) -> DataFrame:
    """Moving-point-test u* threshold detection — the computational
    kernel the reference's UstarDetectionMPT class describes but never
    finishes (diive/pkgs/flux/ustar_detection.py:7-172: docstring spec
    present, core methods commented out at the 'TODO HIER WEITER'
    marker; the published MPT spec is Papale et al. 2006,
    Biogeosciences 3:571-583).

    Per season: quantile-class TA into ``n_ta_classes``; within each TA
    class, quantile-class u* into ``n_ustar_classes`` subclasses; per
    subclass take mean u* and mean NEE; the TA-class threshold is the
    mean u* of the FIRST subclass whose mean NEE reaches
    ``plateau_frac`` of the mean over the next ``plateau_ahead``
    subclasses; the season threshold aggregates TA-class thresholds by
    max (the reference docstring's season rule).

    Every stage is distributed: the quantile classes come from
    analyses.quantile_bins (two-pass rank, ntile-parity, no
    single-partition sort), the plateau test is one ordered window over
    the tiny per-subclass table, and first-hit selection is a
    ``min_by`` aggregate.  Callers pre-filter to nighttime rows (the
    reference composes this from its day/night flag).  Pass a unique
    ``tiebreak_col`` for bit-deterministic class assignment of tied
    values across engines and partitionings.

    Returns (season, ustar_threshold, n_classes_used, n_classes_total).
    TA classes where the plateau is never reached contribute nothing
    (reference behavior for unresolved classes is unspecified — this is
    the conservative choice and is reported via n_classes_used).
    """
    from .analyses import quantile_bins

    season = season_col
    d = df.where(
        F.col(nee_col).isNotNull()
        & F.col(ta_col).isNotNull()
        & F.col(ustar_col).isNotNull()
    )
    if season is None:
        season = "_season"
        d = d.withColumn(season, F.lit(0))
    ties = [tiebreak_col] if tiebreak_col else []
    d = quantile_bins(d, ta_col, n_ta_classes, "ta_class",
                      key_cols=[season], tiebreak_cols=ties)
    d = quantile_bins(d, ustar_col, n_ustar_classes, "u_class",
                      key_cols=[season, "ta_class"], tiebreak_cols=ties)
    cls = d.groupBy(season, "ta_class", "u_class").agg(
        F.avg(ustar_col).alias("mu"),
        F.avg(nee_col).alias("mn"),
    )
    w = (
        Window.partitionBy(season, "ta_class")
        .orderBy("u_class")
        .rowsBetween(1, plateau_ahead)
    )
    crit = cls.withColumn("fwd", F.avg("mn").over(w))
    # first-hit selection as min over a conditional (u_class, mu)
    # struct: explicit null-skip semantics identical in Spark and the
    # DuckDB twin (min_by null-ordering differs between engines)
    hit = F.when(
        F.col("mn") >= F.lit(plateau_frac) * F.col("fwd"),
        F.struct(F.col("u_class"), F.col("mu")),
    )
    per_ta = crit.groupBy(season, "ta_class").agg(
        F.min(hit).getField("mu").alias("class_threshold"),
    )
    return per_ta.groupBy(season).agg(
        F.max("class_threshold").alias("ustar_threshold"),
        F.count("class_threshold").alias("n_classes_used"),
        F.count(F.lit(1)).alias("n_classes_total"),
    )
