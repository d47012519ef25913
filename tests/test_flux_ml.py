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


@pytest.mark.skipif(not HAVE_SKLEARN, reason="sklearn not installed")
def test_lof_flag(spark):
    pdf = seeded_series(n=400, gap_frac=0.05)
    pdf.loc[200, "value"] = 500.0
    out = lof_flag(spark.createDataFrame(pdf), n_neighbors=20)
    got = out.toPandas()
    assert got.loc[got["pos"] == 200, "flag_lof"].iloc[0] == 2
