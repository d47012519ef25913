"""Quadratic fit / BinFitter / CriticalDays (reference
core/dfun/fits.py:74-260, binfitter.py:67-560, criticaldays.py:29-473)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.operators.fits import (
    bin_fitter,
    critical_days,
    quadratic_fit,
    quadratic_predict,
    quadratic_roots,
)


def _parabola(rng, n=500, c=(-6.0, 8.0, -1.0), noise=0.3):
    x = rng.uniform(0, 10, n)
    y = c[0] + c[1] * x + c[2] * x * x + rng.normal(0, noise, n)
    return pd.DataFrame({"source": "s", "pos": np.arange(n), "x": x, "y": y})


def test_quadratic_fit_matches_polyfit(spark):
    rng = np.random.default_rng(9)
    pdf = _parabola(rng)
    got = quadratic_fit(spark.createDataFrame(pdf), "x", "y").collect()[0]
    exp = np.polyfit(pdf["x"], pdf["y"], 2)  # [c2, c1, c0]
    assert abs(got["c0"] - exp[2]) < 1e-6
    assert abs(got["c1"] - exp[1]) < 1e-6
    assert abs(got["c2"] - exp[0]) < 1e-6
    assert got["r2"] > 0.98 and got["n"] == 500


def test_quadratic_roots_closed_form(spark):
    # y = -(x-2)(x-6) = -x^2 + 8x - 12 -> roots 2 and 6
    fit = spark.createDataFrame(
        [(-12.0, 8.0, -1.0), (1.0, 0.0, 1.0), (5.0, -2.0, 0.0)],
        "c0 double, c1 double, c2 double",
    )
    rows = quadratic_roots(fit).collect()
    assert abs(rows[0]["root_lo"] - 2.0) < 1e-12
    assert abs(rows[0]["root_hi"] - 6.0) < 1e-12
    assert rows[1]["root_lo"] is None          # negative discriminant
    assert abs(rows[2]["root_lo"] - 2.5) < 1e-12  # linear degenerate


def test_bin_fitter_recovers_curve(spark):
    rng = np.random.default_rng(11)
    pdf = _parabola(rng, n=2000)
    pred, fit = bin_fitter(
        spark.createDataFrame(pdf), "x", "y", n_bins=10, tiebreak_cols=["pos"]
    )
    f = fit.collect()[0]
    assert abs(f["c2"] + 1.0) < 0.15
    p = pred.toPandas().sort_values("xbin")
    assert len(p) == 10
    # predictions track the bin medians
    assert np.median(np.abs(p["y_fit"] - p["y_med"])) < 0.5


def test_critical_days_bootstrap_threshold(spark):
    """The upper zero crossing of y = -(x-2)(x-6) is x=6: the bootstrap
    threshold must recover it with a tight CI, deterministically."""
    rng = np.random.default_rng(13)
    pdf = _parabola(rng, n=400, c=(-12.0, 8.0, -1.0), noise=0.5)
    df = spark.createDataFrame(pdf)
    out1 = critical_days(df, "x", "y", n_boot=60, id_cols=["pos"]).collect()[0]
    out2 = critical_days(df, "x", "y", n_boot=60, id_cols=["pos"]).collect()[0]
    assert out1["thres_median"] == out2["thres_median"]   # deterministic
    assert abs(out1["thres_median"] - 6.0) < 0.1
    assert out1["thres_p16"] <= out1["thres_median"] <= out1["thres_p84"]
    assert out1["n_boot_ok"] >= 55


def test_critical_heat_days_p95(spark):
    """criticalheatdays.py:19-473: top-bin coincidence of TA and VPD
    defines CHDs; thresholds are that subset's driver minima."""
    from diive_spark.operators.flux import critical_heat_days_p95

    rng = np.random.default_rng(5)
    n = 400
    ta = rng.uniform(5, 30, n)
    vpd = ta * 0.6 + rng.normal(0, 2, n)     # correlated drivers
    flux = -ta * 0.3 + rng.normal(0, 1, n)
    daily = pd.DataFrame({"day": np.arange(n), "ta": ta, "vpd": vpd, "flux": flux})
    res = critical_heat_days_p95(
        spark.createDataFrame(daily), "ta", "vpd", "flux",
        n_bins=20, tiebreak_cols=["day"],
    )
    th = res["thresholds"].collect()[0]
    assert th["n_chd"] >= 1 and th["n_nchd"] >= 1
    # CHD thresholds sit in the drivers' top tails
    assert th["thres_chd_ta"] > np.quantile(ta, 0.9)
    assert th["thres_chd_vpd"] > np.quantile(vpd, 0.9)
    # near-critical band sits below the critical threshold
    assert th["thres_nchd_ta_lo"] < th["thres_chd_ta"]
    assert th["thres_nchd_ta_hi"] <= th["thres_chd_ta"]
    binned = res["binned"].toPandas()
    assert set(binned["bin_ta"].unique()) <= set(range(0, 100, 5))
    comb = res["combobins"].toPandas()
    assert {"flux_mean", "flux_sd", "n"} <= set(comb.columns)


def test_co2_penalty_composition(spark):
    """co2_penalty.py:25-393: NEP removed on critical heat days is
    RF-gapfilled from normal days; penalty = gapfilled - observed."""
    from diive_spark.operators.flux import co2_penalty

    rng = np.random.default_rng(8)
    n, day_len = 960, 48                      # 20 days
    pos = np.arange(n)
    diel = -10 * np.sin(2 * np.pi * pos / day_len).clip(min=0)  # uptake dips
    ta = 15 + 5 * np.sin(2 * np.pi * pos / day_len)
    vpd = 8 + 4 * np.sin(2 * np.pi * pos / day_len)
    hot = (pos // day_len >= 8) & (pos // day_len <= 9)   # days 8-9 hot
    ta = ta + np.where(hot, 15.0, 0.0)
    vpd = vpd + np.where(hot, 10.0, 0.0)
    nep = diel + rng.normal(0, 0.3, n) + np.where(hot, 6.0, 0.0)  # uptake lost
    pdf = pd.DataFrame({
        "source": "s", "doc_id": "d", "pos": pos,
        "ta": ta, "vpd": vpd, "nep": nep,
    })
    hires, per_period = co2_penalty(
        spark.createDataFrame(pdf), "ta", "vpd", "nep",
        thres_chd_ta=25.0, thres_chd_vpd=15.0, day_len=day_len,
        period_len=day_len * 10, n_trees=20, cycle=day_len,
    )
    got = hires.toPandas().sort_values("pos").reset_index(drop=True)
    assert (got.loc[hot, "flag_chd"] == 1).all()
    assert (got.loc[~hot, "flag_chd"] == 0).all()
    # off-CHD rows: gapfill passes observed through -> penalty exactly 0
    off = got.loc[~hot, "penalty"].dropna()
    assert np.allclose(off, 0.0, atol=1e-9)
    # on CHD days the fill learns the normal diel uptake -> negative penalty
    on = got.loc[hot, "penalty"].dropna()
    assert on.mean() < -2.0
    pp = per_period.toPandas().sort_values("_period")
    assert pp["num_chds"].tolist() == [2, 0]


def test_linear_fit_matches_numpy_ols(spark):
    """Closed-form OLS (reference core/dfun/regression.py:6-57 without
    statsmodels) vs numpy polyfit + manual r2 on a seeded noisy line,
    NaNs dropped as the reference's dropna does."""
    from diive_spark.operators.fits import linear_fit, linear_predict

    rng = np.random.RandomState(3)
    x = np.arange(500, dtype=float)
    y = 2.5 * x - 40.0 + rng.normal(0, 25.0, 500)
    y[::17] = np.nan                              # holes must be dropped
    pdf = pd.DataFrame({"g": "a", "x": x, "y": y})
    got = linear_fit(
        spark.createDataFrame(pdf), y="y", x="x", key_cols=["g"]
    ).toPandas().iloc[0]

    m = ~np.isnan(y)
    k, d = np.polyfit(x[m], y[m], 1)
    resid = y[m] - (k * x[m] + d)
    ss_res = float((resid ** 2).sum())
    ss_tot = float(((y[m] - y[m].mean()) ** 2).sum())
    r2 = 1 - ss_res / ss_tot
    n = int(m.sum())
    r2_adj = 1 - (1 - r2) * (n - 1) / (n - 2)

    assert got["n"] == n
    assert abs(got["slope"] - k) < 1e-9
    assert abs(got["intercept"] - d) < 1e-8
    assert abs(got["r2"] - r2) < 1e-9
    assert abs(got["r2_adj"] - r2_adj) < 1e-9

    fitted = linear_predict(
        linear_fit(spark.createDataFrame(pdf), "y", "x", ["g"]),
        spark.createDataFrame(pdf), "x", on=["g"],
    ).toPandas().sort_values("x")
    assert np.allclose(fitted["y_fit"], k * x + d, atol=1e-7)


def test_linear_fit_degenerate_groups_yield_null_not_crash(spark):
    """ANSI mode turns /0 into a job abort; degenerate groups
    (constant x, n<=2) must yield NULL fit columns instead."""
    from diive_spark.operators.fits import linear_fit

    rows = [("const_x", 1.0, float(i)) for i in range(5)]
    rows += [("two_pts", 0.0, 1.0), ("two_pts", 1.0, 3.0)]
    rows += [("good", float(i), 2.0 * i + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in linear_fit(df, "y", "x", ["g"]).collect()}
    assert out["const_x"]["slope"] is None
    assert out["two_pts"]["r2_adj"] is None        # n-2 == 0
    assert abs(out["two_pts"]["slope"] - 2.0) < 1e-12
    assert abs(out["good"]["slope"] - 2.0) < 1e-12
    assert abs(out["good"]["r2"] - 1.0) < 1e-12


def test_studentt_ppf_matches_scipy_reference_values(spark):
    """Pure-numpy t_ppf vs hardcoded scipy.stats.t.ppf values (scipy is
    not in this container; values generated offline from the public
    table) — the quantile the reference uses for prediction bands."""
    from diive_spark.functions.studentt import t_cdf, t_ppf

    cases = [
        (0.975, 10, 2.2281388519649385),
        (0.975, 2, 4.302652729911275),
        (0.975, 100, 1.9839715184496334),
        (0.995, 5, 4.0321429836559324),
        (0.975, 1, 12.706204736432095),
        (0.025, 10, -2.2281388519649385),
        (0.975, 47, 2.011740513729764),
    ]
    for p, nu, exp in cases:
        assert abs(float(t_ppf(p, nu)[0]) - exp) < 1e-7, (p, nu)
    # cdf/ppf roundtrip
    ps = np.array([0.01, 0.2, 0.5, 0.9, 0.999])
    nus = np.array([3.0, 9.0, 30.0, 120.0, 7.0])
    assert np.allclose(t_cdf(t_ppf(ps, nus), nus), ps, atol=1e-10)


def _bands_oracle(x, y, px, p_params, conf=0.95):
    """Numpy closed-form twin of the reference Fitter band math:
    OLS via normal equations, CI std from se^2 * v'(X'X)^-1 v,
    PI from the simple-leverage formula with the exact t quantile."""
    from diive_spark.functions.studentt import t_ppf

    n = len(x)
    X = np.vander(x, p_params, increasing=True)   # [1, x, (x^2)]
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    se = np.sqrt((resid ** 2).sum() / (n - p_params))
    cov_scaled = np.linalg.inv(X.T @ X)
    PX = np.vander(px, p_params, increasing=True)
    std = se * np.sqrt(np.einsum("ij,jk,ik->i", PX, cov_scaled, PX))
    yp = PX @ beta
    q = float(t_ppf(1 - (1 - conf) / 2, n - p_params)[0])
    lev = 1.0 / n + (px - x.mean()) ** 2 / ((x - x.mean()) ** 2).sum()
    dy = q * se * np.sqrt(1.0 + lev)
    return beta, yp, std, yp - 1.96 * std, yp + 1.96 * std, yp - dy, yp + dy


def test_linear_fit_bands_matches_numpy_oracle(spark):
    from diive_spark.operators.fits import linear_fit_bands

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 10, 200)
    y = 3.0 * x + 2.0 + rng.normal(0, 1.5, 200)
    pdf = pd.DataFrame({"g": "a", "x": x, "y": y})
    out = (
        linear_fit_bands(spark.createDataFrame(pdf), "y", "x", ["g"],
                         n_points=25)
        .orderBy("fit_x").toPandas()
    )
    px = out["fit_x"].to_numpy()
    assert len(px) == 25
    assert abs(px[0] - x.min()) < 1e-9 and abs(px[-1] - x.max()) < 1e-9
    beta, yp, std, clo, chi, plo, phi = _bands_oracle(x, y, px, 2)
    assert np.allclose(out["fit_y"], yp, atol=1e-8)
    assert np.allclose(out["std"], std, atol=1e-8)
    assert np.allclose(out["nom_lower_ci95"], clo, atol=1e-8)
    assert np.allclose(out["nom_upper_ci95"], chi, atol=1e-8)
    assert np.allclose(out["lower_predband"], plo, atol=1e-8)
    assert np.allclose(out["upper_predband"], phi, atol=1e-8)
    # bands nest: PI strictly outside CI
    assert (out["lower_predband"] < out["nom_lower_ci95"]).all()
    assert (out["upper_predband"] > out["nom_upper_ci95"]).all()


def test_quadratic_fit_bands_matches_numpy_oracle(spark):
    from diive_spark.operators.fits import quadratic_fit_bands

    rng = np.random.default_rng(11)
    x = rng.uniform(-4, 6, 300)
    y = -1.2 * x * x + 4.0 * x + 7.0 + rng.normal(0, 2.0, 300)
    pdf = pd.DataFrame({"g": "a", "x": x, "y": y})
    out = (
        quadratic_fit_bands(spark.createDataFrame(pdf), "y", "x", ["g"],
                            n_points=30)
        .orderBy("fit_x").toPandas()
    )
    px = out["fit_x"].to_numpy()
    beta, yp, std, clo, chi, plo, phi = _bands_oracle(x, y, px, 3)
    assert np.allclose([out["c0"][0], out["c1"][0], out["c2"][0]], beta,
                       atol=1e-6)
    assert np.allclose(out["fit_y"], yp, atol=1e-6)
    assert np.allclose(out["std"], std, atol=1e-6)
    assert np.allclose(out["nom_lower_ci95"], clo, atol=1e-6)
    assert np.allclose(out["upper_predband"], phi, atol=1e-6)
    assert (out["lower_predband"] < out["nom_lower_ci95"]).all()


def test_fit_bands_at_points_and_degenerate(spark):
    """`at=` evaluation points pass through; degenerate groups (n<=p)
    yield NULL bands instead of aborting under ANSI mode."""
    from diive_spark.operators.fits import linear_fit_bands

    rows = [("good", float(i), 2.0 * i + 1.0) for i in range(10)]
    rows += [("tiny", 0.0, 1.0), ("tiny", 1.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    at = spark.createDataFrame(
        [("good", 2.5), ("good", 7.5), ("tiny", 0.5)], "g string, x double"
    )
    out = {(r["g"], r["fit_x"]): r
           for r in linear_fit_bands(df, "y", "x", ["g"], at=at).collect()}
    g = out[("good", 2.5)]
    assert abs(g["fit_y"] - 6.0) < 1e-9
    assert g["lower_predband"] is not None
    t = out[("tiny", 0.5)]
    assert t["lower_predband"] is None        # n-2 == 0 -> NULL tq/se
