"""Quadratic fits, zero crossings, bootstrap CriticalDays analytics.

Reference semantics:
- QuadraticFit / BinFitter (diive/core/dfun/fits.py:74-260,
  diive/pkgs/fluxprocessingchain/.../binfitter.py:67-560): least-squares
  quadratic y ~ c0 + c1*x + c2*x^2 over (optionally binned) data, with
  fit R^2 and predictions.
- CriticalDays (diive/pkgs/flux/criticaldays.py:29-473): daily flux vs
  a driver (e.g. VPD); bootstrapped quadratic fits; the zero crossing
  of the fit is the critical threshold, with a bootstrap CI.

Spark-first design:
- The quadratic fit is EXACT closed-form least squares from weighted
  moment sums (S_k = sum w*x^k for k=0..4, T_k = sum w*x^k*y,
  U0 = sum w*y^2) — one aggregate pass, then Cramer's rule 3x3 as
  plain column arithmetic.  No solver library, no collect of data
  rows, and the identical operation order is reproducible in ANSI SQL
  (DuckDB oracle twins).
- Bootstrap replicas use Poisson(1) resampling weights derived from
  xxhash64 (deterministic across retries/partitionings, unlike
  ``rand()``): B replicas = explode(sequence) + weight lookup; all
  replicas fit in ONE aggregate pass over (replica, key) groups.
- Zero crossings are the quadratic roots — closed form.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Poisson(1) inverse-CDF thresholds: P(X<=k) for k=0..4; u above the
# last threshold maps to 5 (P ~ 0.0006, negligible truncation).
_POIS1_CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
              0.9810118431238462, 0.9963401531726563]


def _moments(w, x, y):
    """Weighted moment aggregates for a quadratic fit."""
    return [
        F.sum(w).alias("s0"),
        F.sum(w * x).alias("s1"),
        F.sum(w * x * x).alias("s2"),
        F.sum(w * x * x * x).alias("s3"),
        F.sum(w * x * x * x * x).alias("s4"),
        F.sum(w * y).alias("t0"),
        F.sum(w * x * y).alias("t1"),
        F.sum(w * x * x * y).alias("t2"),
        F.sum(w * y * y).alias("u0"),
    ]


def _solve_quadratic(df: DataFrame, keep_sse: bool = False) -> DataFrame:
    """Cramer's rule on the 3x3 normal equations, as column arithmetic
    over the per-group moment row (exactly mirrorable in SQL).
    ``keep_sse=True`` additionally retains the residual sum of squares
    as ``sse`` (fit bands need it for the residual variance)."""
    s0, s1, s2, s3, s4 = (F.col(c) for c in ("s0", "s1", "s2", "s3", "s4"))
    t0, t1, t2, u0 = (F.col(c) for c in ("t0", "t1", "t2", "u0"))
    det = (
        s0 * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    det0 = (
        t0 * (s2 * s4 - s3 * s3)
        - s1 * (t1 * s4 - s3 * t2)
        + s2 * (t1 * s3 - s2 * t2)
    )
    det1 = (
        s0 * (t1 * s4 - s3 * t2)
        - t0 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * t2 - t1 * s2)
    )
    det2 = (
        s0 * (s2 * t2 - t1 * s3)
        - s1 * (s1 * t2 - t1 * s2)
        + t0 * (s1 * s3 - s2 * s2)
    )
    d = df.withColumn("_det", det)
    c0 = F.col("_c0")
    c1 = F.col("_c1")
    c2 = F.col("_c2")
    d = (
        d.withColumn("_c0", det0 / F.col("_det"))
        .withColumn("_c1", det1 / F.col("_det"))
        .withColumn("_c2", det2 / F.col("_det"))
    )
    sse = (
        u0
        - 2 * (c0 * t0 + c1 * t1 + c2 * t2)
        + (
            c0 * c0 * s0 + c1 * c1 * s2 + c2 * c2 * s4
            + 2 * (c0 * c1 * s1 + c0 * c2 * s2 + c1 * c2 * s3)
        )
    )
    sst = u0 - t0 * t0 / s0
    d = (
        d.withColumn("r2", F.when(sst > 0, 1.0 - sse / sst))
        .withColumnRenamed("_c0", "c0")
        .withColumnRenamed("_c1", "c1")
        .withColumnRenamed("_c2", "c2")
        .withColumn("n", F.col("s0"))
    )
    if keep_sse:
        c0k, c1k, c2k = F.col("c0"), F.col("c1"), F.col("c2")
        d = d.withColumn(
            "sse",
            u0
            - 2 * (c0k * t0 + c1k * t1 + c2k * t2)
            + (
                c0k * c0k * s0 + c1k * c1k * s2 + c2k * c2k * s4
                + 2 * (c0k * c1k * s1 + c0k * c2k * s2 + c1k * c2k * s3)
            ),
        )
    return d.drop("s1", "s2", "s3", "s4", "t0", "t1", "t2", "u0", "_det", "s0")


def quadratic_fit(
    df: DataFrame,
    x: str,
    y: str,
    key_cols: Sequence[str] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Exact least-squares quadratic fit per key group
    (fits.py:74-260 analog): returns (key..., c0, c1, c2, r2, n)."""
    keys = list(key_cols)
    good = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    moments = good.groupBy(*keys).agg(
        *_moments(w.cast("double"), F.col(x).cast("double"), F.col(y).cast("double"))
    )
    return _solve_quadratic(moments)


def quadratic_predict(fit_row_df: DataFrame, at: DataFrame, x: str,
                      on: Sequence[str] = ()) -> DataFrame:
    """Evaluate fits at the x positions of *at* (broadcast fit table)."""
    j = at.join(F.broadcast(fit_row_df), on=list(on)) if on else at.crossJoin(
        F.broadcast(fit_row_df)
    )
    xx = F.col(x)
    return j.withColumn("y_fit", F.col("c0") + F.col("c1") * xx + F.col("c2") * xx * xx)


def quadratic_roots(fit_df: DataFrame) -> DataFrame:
    """Zero crossings of each fit (criticaldays.py threshold step):
    adds root_lo / root_hi (NULL when the discriminant is negative or
    the fit is linear-degenerate)."""
    c0, c1, c2 = F.col("c0"), F.col("c1"), F.col("c2")
    disc = c1 * c1 - 4 * c2 * c0
    sq = F.sqrt(disc)
    lin_root = F.when(c1 != 0, -c0 / c1)
    r_a = (-c1 - sq) / (2 * c2)
    r_b = (-c1 + sq) / (2 * c2)
    return (
        fit_df.withColumn(
            "root_lo",
            F.when(c2 == 0, lin_root).when(disc >= 0, F.least(r_a, r_b)),
        ).withColumn(
            "root_hi",
            F.when(c2 == 0, lin_root).when(disc >= 0, F.greatest(r_a, r_b)),
        )
    )


def poisson_bootstrap_weights(rep_col, hash_cols: Sequence[str], seed: int):
    """Deterministic Poisson(1) resampling weight for (replica, row):
    u = xxhash64-uniform, inverse CDF over P(X<=k), k in 0..5."""
    u = (
        F.pmod(
            F.xxhash64(F.lit(seed), rep_col, *[F.col(c) for c in hash_cols]),
            F.lit(2_147_483_647),
        ).cast("double")
        / 2_147_483_647.0
    )
    w = F.lit(5)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u <= F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    return w.cast("double")


def critical_days(
    daily_df: DataFrame,
    x: str,
    y: str,
    n_boot: int = 100,
    seed: int = 42,
    id_cols: Sequence[str] = ("pos",),
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """CriticalDays (criticaldays.py:29-473): bootstrap quadratic fits
    of daily *y* (e.g. NEE) vs daily *x* (e.g. VPD); per key, the
    distribution of the fit's upper zero crossing gives the critical
    threshold with CI.

    Returns one row per key: thres_median, thres_p16, thres_p84,
    n_boot_ok (replicas with a real root), r2_median.

    Scale shape: replicas are data rows x n_boot via explode + Poisson
    weights; ALL replica fits happen inside one groupBy aggregate over
    (key, replica) — no loop, no driver-side fitting.
    """
    keys = list(key_cols)
    reps = daily_df.withColumn(
        "_rep", F.explode(F.sequence(F.lit(1), F.lit(int(n_boot))))
    )
    w = poisson_bootstrap_weights(F.col("_rep"), list(id_cols) + keys, seed)
    good = reps.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    moments = good.groupBy(*keys, "_rep").agg(
        *_moments(w, F.col(x).cast("double"), F.col(y).cast("double"))
    )
    fits = quadratic_roots(_solve_quadratic(moments))
    return fits.groupBy(*keys).agg(
        F.percentile(F.col("root_hi"), F.lit(0.5)).alias("thres_median"),
        F.percentile(F.col("root_hi"), F.lit(0.16)).alias("thres_p16"),
        F.percentile(F.col("root_hi"), F.lit(0.84)).alias("thres_p84"),
        F.count("root_hi").alias("n_boot_ok"),
        F.percentile(F.col("r2"), F.lit(0.5)).alias("r2_median"),
    )


def bin_fitter(
    df: DataFrame,
    x: str,
    y: str,
    n_bins: int = 10,
    tiebreak_cols: Sequence[str] = (),
    key_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """BinFitter (binfitter.py:67-560): quantile-bin x, median x/y per
    bin, quadratic fit over the bin medians with per-bin predictions.
    Returns (bin table + y_fit, fit coefficients)."""
    from .analyses import quantile_bins

    keys = list(key_cols)
    binned = quantile_bins(
        df.where(F.col(y).isNotNull()), x, n_bins, "xbin", keys, tiebreak_cols
    )
    per_bin = binned.groupBy(*keys, "xbin").agg(
        F.percentile(F.col(x), F.lit(0.5)).alias("x_med"),
        F.percentile(F.col(y), F.lit(0.5)).alias("y_med"),
        F.count(F.lit(1)).alias("n_bin"),
    )
    fit = quadratic_fit(per_bin, "x_med", "y_med", key_cols=keys)
    pred = quadratic_predict(fit, per_bin, "x_med", on=keys)
    return pred, fit


def linear_fit(
    df: DataFrame,
    y: str,
    x: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Simple OLS y ~ x per key group — the Spark-side closed form of
    the reference's statsmodels helper (diive/core/dfun/regression.py:
    6-57): slope = covar_samp/var_samp, intercept from the means,
    r-squared = corr^2, adjusted r-squared = 1-(1-r2)(n-1)/(n-2).
    NaN-pair rows are dropped first (reference dropna); one map-side
    combinable aggregate, no shuffle beyond the groupBy."""
    keys = list(key_cols)
    good = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    agg = good.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_samp(xc, yc).alias("_cov"),
        F.var_samp(xc).alias("_varx"),
        F.var_samp(yc).alias("_vary"),
        F.avg(xc).alias("_mx"),
        F.avg(yc).alias("_my"),
    )
    # try_divide everywhere a degenerate group can zero a denominator:
    # constant x/y or n<=2 yields NULL fit columns instead of aborting
    # the whole job under ANSI mode (even F.corr itself throws
    # DIVIDE_BY_ZERO on zero variance there — r2 comes from the
    # covariance components instead)
    slope = F.try_divide(F.col("_cov"), F.col("_varx"))
    r2 = F.try_divide(
        F.col("_cov") * F.col("_cov"), F.col("_varx") * F.col("_vary")
    )
    return agg.select(
        *keys,
        "n",
        slope.alias("slope"),
        (F.col("_my") - slope * F.col("_mx")).alias("intercept"),
        r2.alias("r2"),
        (
            F.lit(1.0)
            - F.try_divide((F.lit(1.0) - r2) * (F.col("n") - 1),
                           (F.col("n") - 2).cast("double"))
        ).alias("r2_adj"),
    )


def _t_quantile_col(fit: DataFrame, conf: float, n_params: int) -> DataFrame:
    """Attach the exact Student-t quantile ``_tq`` = t_ppf(1 - alpha/2,
    n - n_params) to a per-key fit table.  Arrow pandas UDF over the
    TINY aggregated table (O(keys) rows — never the data path); the
    quantile itself is exact pure-numpy (functions/studentt.py)."""
    from pyspark.sql.functions import pandas_udf

    p = 1.0 - (1.0 - float(conf)) / 2.0

    def _tq(n):
        import numpy as np
        import pandas as pd

        from ..functions.studentt import t_ppf

        nu = n.to_numpy(dtype="float64") - float(n_params)
        out = np.where(nu > 0, t_ppf(p, np.maximum(nu, 1e-9)), np.nan)
        return pd.Series(out)

    tq_udf = pandas_udf(_tq, "double")
    return fit.withColumn("_tq", tq_udf(F.col("n").cast("double")))


def linear_fit_bands(
    df: DataFrame,
    y: str,
    x: str,
    key_cols: Sequence[str] = (),
    conf: float = 0.95,
    n_points: int = 50,
    at: DataFrame | None = None,
) -> DataFrame:
    """OLS fit line with 95% confidence and prediction bands — the
    Spark closed form of the reference Fitter's linear mode
    (diive/core/dfun/fits.py:117-131, 179-247):

    - ``fit_y``  = intercept + slope * fit_x
    - ``std``    = se * sqrt(1/n + (fit_x - mx)^2 / Sxx)  (exact
      sqrt(v' (X'X)^-1 v) * se — what the reference gets from
      propagating curve_fit's parameter covariance)
    - ``nom_lower_ci95`` / ``nom_upper_ci95`` = fit_y -/+ 1.96 * std
      (the reference hardcodes 1.96 for the CI, fits.py:245-246)
    - ``lower_predband`` / ``upper_predband`` = fit_y -/+
      tq * se * sqrt(1 + 1/n + (fit_x - mx)^2 / Sxx) with tq the EXACT
      Student-t quantile t_ppf(1 - alpha/2, n - 2) (fits.py:123-129)

    Evaluation points: per-key linspace over [min(x), max(x)] with
    ``n_points`` steps (the reference's fit_x), or the rows of ``at``
    (must carry ``x`` and the keys).  One aggregate over the data +
    a broadcast join onto the tiny grid — no data shuffle."""
    keys = list(key_cols)
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    good = df.where(xc.isNotNull() & yc.isNotNull())
    agg = good.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(xc).alias("_mx"),
        F.sum(xc * xc).alias("_sxx_raw"),
        F.sum(xc).alias("_sx"),
        F.sum(yc).alias("_sy"),
        F.sum(xc * yc).alias("_sxy_raw"),
        F.sum(yc * yc).alias("_syy_raw"),
        F.min(xc).alias("_xmin"),
        F.max(xc).alias("_xmax"),
    )
    sxx = F.col("_sxx_raw") - F.col("_sx") * F.col("_sx") / F.col("n")
    sxy = F.col("_sxy_raw") - F.col("_sx") * F.col("_sy") / F.col("n")
    syy = F.col("_syy_raw") - F.col("_sy") * F.col("_sy") / F.col("n")
    slope = F.try_divide(sxy, sxx)
    fit = (
        agg.withColumn("slope", slope)
        .withColumn(
            "intercept",
            (F.col("_sy") - F.col("slope") * F.col("_sx")) / F.col("n"),
        )
        .withColumn("_sse", syy - F.col("slope") * sxy)
        .withColumn(
            "se",
            F.sqrt(F.try_divide(F.greatest(F.col("_sse"), F.lit(0.0)),
                                F.col("n") - 2)),
        )
        .withColumn("_sxx", sxx)
    )
    fit = _t_quantile_col(fit, conf, n_params=2)
    if at is None:
        i = F.explode(F.sequence(F.lit(0), F.lit(int(n_points) - 1))).alias("_i")
        grid = fit.select(*keys, "_xmin", "_xmax", i).withColumn(
            "fit_x",
            F.col("_xmin")
            + F.col("_i")
            * (F.col("_xmax") - F.col("_xmin"))
            / F.lit(float(n_points - 1)),
        ).select(*keys, "fit_x")
    else:
        grid = at.select(*keys, F.col(x).cast("double").alias("fit_x"))
    j = (
        grid.join(F.broadcast(fit), on=keys) if keys
        else grid.crossJoin(F.broadcast(fit))
    )
    lev = 1.0 / F.col("n") + F.try_divide(
        (F.col("fit_x") - F.col("_mx")) ** 2, F.col("_sxx")
    )
    stdc = F.col("se") * F.sqrt(lev)
    dy = F.col("_tq") * F.col("se") * F.sqrt(1.0 + lev)
    fit_y = F.col("intercept") + F.col("slope") * F.col("fit_x")
    return j.select(
        *keys,
        "fit_x",
        fit_y.alias("fit_y"),
        stdc.alias("std"),
        (fit_y - 1.96 * stdc).alias("nom_lower_ci95"),
        (fit_y + 1.96 * stdc).alias("nom_upper_ci95"),
        (fit_y - dy).alias("lower_predband"),
        (fit_y + dy).alias("upper_predband"),
        "slope", "intercept", "se", F.col("n").cast("long").alias("n"),
    )


def quadratic_fit_bands(
    df: DataFrame,
    y: str,
    x: str,
    key_cols: Sequence[str] = (),
    conf: float = 0.95,
    n_points: int = 50,
    at: DataFrame | None = None,
) -> DataFrame:
    """Quadratic fit curve with confidence and prediction bands — the
    reference Fitter's 'quadratic_offset' mode (diive/core/dfun/
    fits.py:117-131, 179-247), exact closed form:

    - coefficients from the same moment/Cramer solve as quadratic_fit;
    - CI std = se * sqrt(v' (X'X)^-1 v), v = [1, x, x^2], with the 3x3
      inverse expressed through the adjugate of the moment matrix
      (column arithmetic — no linear-algebra library).  This equals
      the reference's uncertainties-package propagation of curve_fit's
      covariance exactly (curve_fit cov = se^2 (X'X)^-1);
      bands at fit_y -/+ 1.96 * std (reference hardcodes 1.96);
    - prediction band uses the reference's own simple-leverage formula
      (fits.py:128: sqrt(1 + 1/N + (px-mx)^2/Sxx)) with the EXACT
      t_ppf(1 - alpha/2, n - 3) quantile — mirrored verbatim, including
      the fact that it ignores the quadratic leverage term."""
    keys = list(key_cols)
    xc, yc = F.col(x).cast("double"), F.col(y).cast("double")
    good = df.where(xc.isNotNull() & yc.isNotNull())
    moments = good.groupBy(*keys).agg(
        *_moments(F.lit(1.0), xc, yc),
        F.min(xc).alias("_xmin"),
        F.max(xc).alias("_xmax"),
    )
    s0, s1, s2 = F.col("s0"), F.col("s1"), F.col("s2")
    s3, s4 = F.col("s3"), F.col("s4")
    det = (
        s0 * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    m = (
        moments.withColumn("_adet", det)
        .withColumn("_a00", s2 * s4 - s3 * s3)
        .withColumn("_a01", -(s1 * s4 - s2 * s3))
        .withColumn("_a02", s1 * s3 - s2 * s2)
        .withColumn("_a11", s0 * s4 - s2 * s2)
        .withColumn("_a12", -(s0 * s3 - s1 * s2))
        .withColumn("_a22", s0 * s2 - s1 * s1)
        .withColumn("_mx", s1 / s0)
        .withColumn("_sxx", s2 - s1 * s1 / s0)
    )
    fit = _solve_quadratic(m, keep_sse=True)
    fit = fit.withColumn(
        "se",
        F.sqrt(
            F.try_divide(
                F.greatest(F.col("sse"), F.lit(0.0)), F.col("n") - 3
            )
        ),
    )
    fit = _t_quantile_col(fit, conf, n_params=3)
    if at is None:
        i = F.explode(F.sequence(F.lit(0), F.lit(int(n_points) - 1))).alias("_i")
        grid = fit.select(*keys, "_xmin", "_xmax", i).withColumn(
            "fit_x",
            F.col("_xmin")
            + F.col("_i")
            * (F.col("_xmax") - F.col("_xmin"))
            / F.lit(float(n_points - 1)),
        ).select(*keys, "fit_x")
    else:
        grid = at.select(*keys, F.col(x).cast("double").alias("fit_x"))
    j = (
        grid.join(F.broadcast(fit), on=keys) if keys
        else grid.crossJoin(F.broadcast(fit))
    )
    fx = F.col("fit_x")
    fx2 = fx * fx
    quad_form = (
        F.col("_a00")
        + fx2 * F.col("_a11")
        + fx2 * fx2 * F.col("_a22")
        + 2.0 * (fx * F.col("_a01") + fx2 * F.col("_a02")
                 + fx * fx2 * F.col("_a12"))
    )
    stdc = F.col("se") * F.sqrt(F.try_divide(quad_form, F.col("_adet")))
    lev = 1.0 / F.col("n") + F.try_divide(
        (fx - F.col("_mx")) ** 2, F.col("_sxx")
    )
    dy = F.col("_tq") * F.col("se") * F.sqrt(1.0 + lev)
    fit_y = F.col("c0") + F.col("c1") * fx + F.col("c2") * fx2
    return j.select(
        *keys,
        "fit_x",
        fit_y.alias("fit_y"),
        stdc.alias("std"),
        (fit_y - 1.96 * stdc).alias("nom_lower_ci95"),
        (fit_y + 1.96 * stdc).alias("nom_upper_ci95"),
        (fit_y - dy).alias("lower_predband"),
        (fit_y + dy).alias("upper_predband"),
        "c0", "c1", "c2", "se", F.col("n").cast("long").alias("n"),
    )


def linear_predict(
    fit: DataFrame, pts: DataFrame, x: str, on: Sequence[str] = ()
) -> DataFrame:
    """Attach fitted values (reference regression.py fitted_values):
    broadcast the per-key coefficient table onto the points."""
    keys = list(on)
    sel = fit.select(*keys, "slope", "intercept")
    joined = (
        pts.join(F.broadcast(sel), on=keys) if keys
        else pts.crossJoin(F.broadcast(sel))
    )
    return joined.withColumn(
        "y_fit", F.col("intercept") + F.col("slope") * F.col(x).cast("double")
    )


def isotonic_fit(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = ("source", "doc_id"),
) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression per series via
    Pool-Adjacent-Violators (Ayer et al. 1955 / Barlow et al. 1972):
    the unique least-squares fit under the ordering constraint — the
    shape-constrained complement of this module's parametric fits
    (reference fits are unconstrained least squares,
    diive/core/dfun/fits.py:74-260).

    The PAVA stack pass is inherently sequential along a series, so it
    runs as a numpy kernel per series (the lttb/LOF contract: series
    are independent and parallelize across the cluster; one series
    must fit a worker, which n_tok bounds by construction).  Merging
    on ``>=`` yields MAXIMAL blocks, giving the standard uniqueness
    characterization the caller can verify in-query:

    1. fitted is non-decreasing;
    2. each maximal constant block's fitted value is the block mean;
    3. within every block each proper prefix's mean is >= the block
       mean (no split improves the fit).

    Returns one row per non-null reading: keys, axis, value, fitted.
    """
    keys = list(key_cols)
    import numpy as np
    import pandas as pd

    in_df = df.select(
        *keys,
        F.col(axis_col).cast("long").alias(axis_col),
        F.col(value_col).cast("double").alias(value_col),
    ).where(F.col(value_col).isNotNull())
    out_schema = in_df.withColumn(
        "fitted", F.lit(0.0).cast("double")
    ).schema

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(axis_col).reset_index(drop=True)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        sums: list = []
        cnts: list = []
        for x in v:
            s, c = float(x), 1
            while sums and sums[-1] / cnts[-1] >= s / c:
                s += sums.pop()
                c += cnts.pop()
            sums.append(s)
            cnts.append(c)
        fitted = np.concatenate(
            [np.full(c, s / c) for s, c in zip(sums, cnts)]
        ) if len(v) else np.empty(0)
        pdf["fitted"] = fitted
        return pdf

    return in_df.groupBy(*keys).applyInPandas(_kernel, schema=out_schema)
