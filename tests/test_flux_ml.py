"""EddyPro flags, flux ops, ML gap fill, LOF."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from diive_spark.operators.eddypro import (
    completeness_flag,
    level2_battery,
    scf_flag,
    signal_strength_flag,
    storage_correction,
    vm97_digit_flag,
)
from diive_spark.operators.flux import (
    daily_full_gate,
    detection_limit_from_far_lags,
    lagged_crosscovariance,
    propagate_uncertainty,
    random_uncertainty_banded,
    ustar_scenarios,
)
from diive_spark.operators.ml_gapfill import rf_gapfill
from diive_spark.operators.lof import HAVE_SKLEARN, lof_flag

from .conftest import seeded_series


def test_eddypro_flags(spark):
    df = spark.createDataFrame(
        [(1, 45.0, 8110, 1700, 1.5, 0),
         (2, 80.0, 8019, 1400, 2.5, 2),
         (3, None, None, None, None, None)],
        "id long, signal double, vm97 long, n_hf long, scf double, ssitc int",
    )
    out = signal_strength_flag(df, "signal", thres=60.0)
    out = vm97_digit_flag(out, "vm97", 1, "flag_vm97_t1")
    out = vm97_digit_flag(out, "vm97", 2, "flag_vm97_t2")
    out = vm97_digit_flag(out, "vm97", 3, "flag_vm97_t3")
    out = completeness_flag(out, "n_hf", expected=1800, min_frac=0.9)
    out = scf_flag(out, "scf", thres=2.0)
    r = {row["id"]: row for row in out.collect()}
    assert r[1]["flag_signal"] == 2 and r[2]["flag_signal"] == 0
    assert r[1]["flag_vm97_t1"] == 2      # 8110 -> digit1 = 1
    assert r[1]["flag_vm97_t2"] == 2      # digit2 = 1
    assert r[2]["flag_vm97_t1"] == 0      # 8019 -> digit1 = 0
    assert r[2]["flag_vm97_t2"] == 2      # digit2 = 1 -> hard
    assert r[2]["flag_vm97_t3"] is None   # digit3 = 9 -> unknown
    assert r[1]["flag_completeness"] == 0 and r[2]["flag_completeness"] == 2
    assert r[2]["flag_scf"] == 2
    assert r[3]["flag_signal"] is None

    df2, flags = level2_battery(df, ssitc_col="ssitc", signal_col="signal",
                                vm97_col="vm97", vm97_tests={"spikes": 1})
    assert flags == ["flag_ssitc", "flag_signal", "flag_vm97_spikes"]

    sc = storage_correction(
        spark.createDataFrame([(1.0, 0.25)], "flux double, storage double"),
        "flux", "storage")
    assert sc.first()["flux_L31"] == 1.25


def test_ustar_scenarios(spark):
    pdf = seeded_series(n=200, gap_frac=0.0)
    rng = np.random.default_rng(4)
    pdf["ustar"] = rng.uniform(0, 1, len(pdf))
    out = (
        ustar_scenarios(spark.createDataFrame(pdf), thresholds=[0.1, 0.5, 0.9])
        .toPandas().set_index("ustar_threshold").sort_index()
    )
    exp = [(pdf["ustar"] >= u).sum() for u in (0.1, 0.5, 0.9)]
    assert list(out["n_survivors"]) == exp
    assert (out["n_total"] == 200).all()


def test_lagged_crosscovariance_finds_true_lag(spark):
    rng = np.random.default_rng(8)
    n = 2000
    w = rng.normal(0, 1, n)
    c = np.roll(w, 5) + rng.normal(0, 0.1, n)  # c_t = w_(t-5): c leads w by -5
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n),
                        "w": w, "c": c})
    cov = lagged_crosscovariance(
        spark.createDataFrame(pdf), "w", "c", lags=list(range(-10, 11))
    )
    best = cov.where(F.col("abs_rank") == 1).first()
    assert best["lag"] == 5  # c_(t+5) == w_t
    dl = detection_limit_from_far_lags(cov, far_lag_min=8)
    assert dl.first()["detection_limit"] < 0.3


def test_random_uncertainty(spark):
    pdf = seeded_series(n=300, gap_frac=0.0)
    out = random_uncertainty_banded(spark.createDataFrame(pdf), band=20)
    got = out.toPandas().sort_values("pos").reset_index(drop=True)
    i = 150
    seg = pdf["value"].iloc[130:171]
    assert abs(got.loc[i, "unc"] - seg.std()) < 1e-9
    prop = propagate_uncertainty(out).first()
    assert prop["unc_propagated"] > 0


def test_daily_full_gate(spark):
    pdf = seeded_series(n=200, gap_frac=0.0)
    pdf.loc[pdf["pos"] >= 170, "value"] = None  # last bucket incomplete
    out = daily_full_gate(
        spark.createDataFrame(pdf), bucket=48, required=48, offset=0
    ).toPandas()
    # buckets 0,1,2 complete (48 values), bucket 3 (144..191) has nulls from 170
    assert sorted(out["day_bucket"]) == [0, 1, 2]


def test_rf_gapfill_learns_structure(spark):
    rng = np.random.default_rng(12)
    n = 1200
    base = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64)
    v = base + rng.normal(0, 1.0, n)
    v[rng.random(n) < 0.15] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    out, scores = rf_gapfill(spark.createDataFrame(pdf), cycle=64, n_trees=20)
    got = out.toPandas().sort_values("pos").reset_index(drop=True)
    assert got["value_gfRF"].isnull().sum() <= np.isnan(v).sum() * 0.2
    filled = got[got["value_gfRF_flag"] >= 1]
    err = np.abs(filled["value_gfRF"].values - base[filled["pos"].values])
    assert np.median(err) < 5.0  # learned the diel-like cycle
    assert scores["full_model"]["r2"] > 0.5


def test_lof_flag(spark):
    """Runs on the numpy exact-LOF kernel when sklearn is absent."""
    pdf = seeded_series(n=400, gap_frac=0.05)
    pdf.loc[200, "value"] = 500.0
    out = lof_flag(spark.createDataFrame(pdf), n_neighbors=20)
    got = out.toPandas()
    assert got.loc[got["pos"] == 200, "flag_lof"].iloc[0] == 2


def test_regression_scores_battery_matches_numpy(spark):
    """Full score battery (reference core/ml/common.py:126-176):
    mae/medae/mse/rmse/mape/maxe/r2 against numpy-computed values."""
    from diive_spark.operators.ml_gapfill import regression_scores

    rng = np.random.default_rng(3)
    y = rng.normal(10, 3, 500)
    p = y + rng.normal(0, 1, 500)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "p": p}))
    got = regression_scores(df, "y", "p")
    err = p - y
    exp = {
        "mae": np.mean(np.abs(err)),
        "medae": np.median(np.abs(err)),
        "mse": np.mean(err**2),
        "rmse": np.sqrt(np.mean(err**2)),
        "mape": np.mean(np.abs(err) / np.abs(y)),
        "maxe": np.max(np.abs(err)),
        "r2": 1 - np.sum(err**2) / np.sum((y - y.mean()) ** 2),
    }
    for k, v in exp.items():
        assert abs(got[k] - v) < 1e-9, k


def test_rf_feature_reduction_rejects_noise(spark):
    """randomforest_ts.py:345-398 parity: with a seeded random
    benchmark, the informative lag/phase features survive and the
    importances are deterministic across runs."""
    from diive_spark.operators.ml_gapfill import build_features, reduce_features

    rng = np.random.default_rng(12)
    n = 1200
    base = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64)
    v = base + rng.normal(0, 1.0, n)
    v[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    feat_df, full_feats, _ = build_features(spark.createDataFrame(pdf))

    def run():
        return reduce_features(
            feat_df, full_feats, "value",
            order_cols=["source", "doc_id", "pos"], n_trees=20, seed=7,
        )

    acc1, rej1, imp1 = run()
    acc2, rej2, imp2 = run()
    assert acc1 == acc2 and rej1 == rej2          # deterministic
    assert imp1 == imp2
    # the cyclic phase drives the signal: it must beat the random noise
    assert "feat_phase" in acc1
    assert set(acc1) | set(rej1) == set(full_feats)
    assert "feat_RANDOM" in imp1


def test_rf_gapfill_with_reduction_end_to_end(spark):
    rng = np.random.default_rng(12)
    n = 800
    base = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64)
    v = base + rng.normal(0, 1.0, n)
    v[rng.random(n) < 0.15] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    out, scores = rf_gapfill(
        spark.createDataFrame(pdf), cycle=64, n_trees=20,
        feature_reduction=True, importance="impurity",
    )
    assert "feature_reduction" in scores
    fr = scores["feature_reduction"]
    assert set(fr) == {"accepted_features", "rejected_features", "importances"}
    assert {"mae", "medae", "mse", "rmse", "mape", "maxe", "r2"} <= set(
        scores["full_model"]
    )
    got = out.toPandas()
    assert set(got["value_gfRF_flag"].dropna()) <= {0, 1, 2}


def test_randunc_m2_m3_cascade_matches_pandas(spark):
    """PAS20 RANDUNC methods 2-3 (uncertainty.py:291-395) vs a direct
    pandas/numpy oracle with the same positional semantics."""
    from diive_spark.operators.flux import random_uncertainty_pas20

    rng = np.random.default_rng(21)
    n, day_len, band, wdays, wtod = 480, 48, 8, 3, 2
    flux = 10 + 8 * np.sin(2 * np.pi * np.arange(n) / day_len) + rng.normal(0, 1, n)
    v = flux.copy()
    v[rng.random(n) < 0.30] = np.nan
    v[100:130] = np.nan                     # block gaps -> m1 failures
    v[290:340] = np.nan
    pdf = pd.DataFrame({
        "source": "s", "doc_id": "d", "pos": np.arange(n),
        "value": v, "flux_gf": flux,
    })
    got = (
        random_uncertainty_pas20(
            spark.createDataFrame(pdf), band=band, day_len=day_len,
            wdays=wdays, wtod=wtod, min_vals=5,
        )
        .toPandas().sort_values("pos").reset_index(drop=True)
    )

    # pandas oracle
    unc = np.full(n, np.nan)
    for i in range(n):
        w = v[(np.abs(np.arange(n) - i) <= band)]
        w = w[~np.isnan(w)]
        if len(w) >= 5:
            unc[i] = np.std(w, ddof=1)
    m1 = unc.copy()
    day, tod = np.arange(n) // day_len, np.arange(n) % day_len
    for i in range(n):                       # method 2 reads m1 only
        if not np.isnan(unc[i]):
            continue
        add = max(flux[i] * 0.2, 2.0)
        td = np.abs(tod - tod[i])
        sel = (
            (np.abs(day - day[i]) <= wdays)
            & (np.minimum(td, day_len - td) <= wtod)
            & (flux >= flux[i] - add) & (flux <= flux[i] + add)
            & ~np.isnan(m1)
        )
        if sel.any():
            unc[i] = np.median(m1[sel])
    m2 = unc.copy()
    for i in range(n):                       # method 3 reads m1+m2
        if not np.isnan(unc[i]):
            continue
        add = max(flux[i] * 0.2, 2.0)
        sel = (flux >= flux[i] - add) & (flux <= flux[i] + add) & ~np.isnan(m2)
        if sel.any():
            unc[i] = np.median(m2[sel])

    assert np.allclose(got["unc"].values, unc, equal_nan=True, atol=1e-9)
    # method flags: 1 where m1 hit, 2 where m2 filled, 3 where m3 filled
    exp_flag = np.where(~np.isnan(m1), 1.0,
               np.where(~np.isnan(m2), 2.0,
               np.where(~np.isnan(unc), 3.0, np.nan)))
    assert np.allclose(got["unc_method"].astype(float).values, exp_flag,
                       equal_nan=True)
    assert (got["unc_method"] == 2).sum() > 0   # the cascade actually ran


def test_lof_numpy_kernel_properties():
    """Pandas/numpy oracle for the LOF kernel: a gross spike in a tight
    cluster scores far above 1; cluster members stay near 1; the
    'auto' rule flags exactly the spike."""
    from diive_spark.operators.lof import _predict_numpy, lof_scores_numpy

    rng = np.random.default_rng(4)
    x = np.concatenate([rng.normal(10, 0.5, 200), [60.0]])
    lof = lof_scores_numpy(x, k=20)
    assert lof[-1] > 5.0
    assert np.median(lof[:-1]) < 1.2
    pred = _predict_numpy(x, 20, "auto")
    assert pred[-1] == -1
    assert (pred[:-1] == -1).sum() <= 20   # tail points may exceed 1.5
    assert np.argmax(lof) == len(x) - 1     # the spike dominates
    # fixed-contamination rule: exactly ~5% flagged
    pred5 = _predict_numpy(x, 20, 0.05)
    assert 1 <= (pred5 == -1).sum() <= 12


def test_optimize_rf_params_grid(spark):
    """OptimizeParamsRFTS analog (randomforest_ts.py:42-160): CV grid
    search returns per-cell RMSE and a best cell."""
    from diive_spark.operators.ml_gapfill import optimize_rf_params

    rng = np.random.default_rng(17)
    n = 600
    v = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64) + rng.normal(0, 1, n)
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    res = optimize_rf_params(
        spark.createDataFrame(pdf),
        num_trees_grid=(5, 15), max_depth_grid=(3, 6), n_folds=2,
    )
    assert len(res["cv_results"]) == 4
    assert res["best_params"]["numTrees"] in (5, 15)
    assert res["best_rmse"] == min(c["rmse"] for c in res["cv_results"])
    # deeper/larger forest should not be worse than the tiny one here
    assert res["best_rmse"] < 3.0


def test_storage_correction_gapfilled(spark):
    from diive_spark.operators.eddypro import storage_correction_gapfilled

    rng = np.random.default_rng(19)
    n = 400
    storage = 2 + np.sin(2 * np.pi * np.arange(n) / 64) + rng.normal(0, 0.1, n)
    storage_obs = storage.copy()
    storage_obs[rng.random(n) < 0.2] = np.nan
    flux = rng.normal(-5, 1, n)
    pdf = pd.DataFrame({
        "source": "s", "doc_id": "d", "pos": np.arange(n),
        "flux": flux, "storage": storage_obs,
    })
    out, scores = storage_correction_gapfilled(
        spark.createDataFrame(pdf), "flux", "storage",
        n_trees=15, cycle=64,
    )
    got = out.toPandas().sort_values("pos")
    filled = got["storage_gfRF"].notna().sum()
    assert filled > got["storage"].notna().sum()    # gaps actually filled
    have = got["flux_L31"].notna()
    assert np.allclose(
        got.loc[have, "flux_L31"],
        got.loc[have, "flux"] + got.loc[have, "storage_gfRF"],
    )


def test_rf_gapfill_golden_values_seed42(spark):
    """Reference test philosophy (tests/test_gapfilling.py:70-74):
    deterministic-seed EXACT golden outputs — mae, r2, gap-filled
    column sum, and flag-1 count pinned for random_state=42."""
    rng = np.random.default_rng(42)
    n = 800
    base = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64)
    v = base + rng.normal(0, 1.0, n)
    v[rng.random(n) < 0.15] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    out, sc = rf_gapfill(spark.createDataFrame(pdf), cycle=64, n_trees=20, seed=42)
    g = out.toPandas()
    assert round(sc["full_model"]["mae"], 10) == 1.0579793052
    assert round(sc["full_model"]["r2"], 10) == 0.9910102399
    assert round(float(g["value_gfRF"].sum()), 6) == 40391.230947
    assert int((g["value_gfRF_flag"] == 1).sum()) == 74


def test_quick_rf_fill_one_call(spark):
    rng = np.random.default_rng(23)
    n = 500
    v = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64) + rng.normal(0, 1, n)
    v[rng.random(n) < 0.1] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    from diive_spark.operators.ml_gapfill import quick_rf_fill

    out, sc = quick_rf_fill(spark.createDataFrame(pdf))
    g = out.toPandas()
    assert g["value_gfRF"].isna().sum() < np.isnan(v).sum()
    assert sc["full_model"]["r2"] > 0.5


def test_ustar_mpt_recovers_plateau(spark):
    """Seeded MPT oracle: NEE saturates above ustar=0.3, so the
    detected season threshold must land at the first u* subclass on the
    plateau (~0.3 given 20 subclasses over [0, 0.8])."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.flux import ustar_mpt_threshold

    rng = np.random.RandomState(11)
    n = 4000
    ustar = rng.uniform(0, 0.8, n)
    ta = rng.uniform(-5, 25, n)
    nee = np.minimum(ustar, 0.3) / 0.3 * 10.0 + rng.normal(0, 0.05, n)
    pdf = pd.DataFrame({
        "rid": np.arange(n), "ustar": ustar, "ta": ta, "nee": nee,
    })
    out = ustar_mpt_threshold(
        spark.createDataFrame(pdf), nee_col="nee", ta_col="ta",
        ustar_col="ustar", tiebreak_col="rid",
    ).toPandas()
    assert len(out) == 1
    thr = out.iloc[0]["ustar_threshold"]
    assert 0.25 < thr < 0.42, thr
    assert out.iloc[0]["n_classes_used"] >= 4
    assert out.iloc[0]["n_classes_total"] == 6


def test_gbt_gapfill_learns_structure(spark):
    """model='gbt' swaps the bagged forest for Spark ML gradient-
    boosted trees (the XGBoostTS analog) with identical plumbing:
    fills, flags, and score battery all present; learns the cycle."""
    rng = np.random.default_rng(12)
    n = 1200
    base = 50 + 20 * np.sin(2 * np.pi * np.arange(n) / 64)
    v = base + rng.normal(0, 1.0, n)
    v[rng.random(n) < 0.15] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    out, scores = rf_gapfill(
        spark.createDataFrame(pdf), cycle=64, n_trees=15, model="gbt"
    )
    got = out.toPandas().sort_values("pos").reset_index(drop=True)
    filled = got[got["value_gfRF_flag"] >= 1]
    assert len(filled) > 0
    err = np.abs(filled["value_gfRF"].values - base[filled["pos"].values])
    assert np.median(err) < 5.0
    assert scores["full_model"]["r2"] > 0.5
    import pytest

    with pytest.raises(ValueError):
        rf_gapfill(spark.createDataFrame(pdf), model="nope")
