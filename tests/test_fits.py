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
