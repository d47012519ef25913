"""Outlier flags + repeat protocol + QCF vs pandas oracles.

Parity pins: population std for z-score (funcs.py:37-41), sample std +
centered rolling median for LocalSD (localsd.py:80-91), QCF truth table
(qcf.py:241-292)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.operators.outliers import (
    abs_limits_flag,
    local_sd_flag,
    manual_removal_flag,
    missing_vals_flag,
    repeat_until_clean,
    zscore_flag,
    zscore_increments_flag,
)
from diive_spark.operators.qcf import apply_qcf, qcf_flag

from .conftest import seeded_series


def spiked_series(n=400, seed=11, n_spikes=6):
    pdf = seeded_series(n=n, seed=seed, gap_frac=0.05)
    rng = np.random.default_rng(seed + 1)
    idx = rng.choice(np.flatnonzero(pdf["value"].notna()), n_spikes, replace=False)
    pdf.loc[idx, "value"] += 200.0  # ~20 sigma
    return pdf


def test_zscore_flag_population_std(spark):
    pdf = spiked_series()
    got = (
        zscore_flag(spark.createDataFrame(pdf), thres=4.0)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    s = pdf["value"]
    z = np.abs((s - s.mean()) / s.std(ddof=0))  # POPULATION std
    exp = pd.Series(np.where(s.isnull(), np.nan, np.where(z > 4.0, 2, 0)))
    np.testing.assert_allclose(got["flag_zscore"].values.astype(float), exp.values,
                               equal_nan=True)


def test_zscore_repeat_until_clean(spark):
    pdf = spiked_series()
    sdf = spark.createDataFrame(pdf)

    def fn(df, vcol, fcol):
        return zscore_flag(df, thres=4.0, value_col=vcol, flag_col=fcol)

    out, n_iter = repeat_until_clean(sdf, fn, flag_col="flag_z")
    got = out.toPandas().sort_values("pos").reset_index(drop=True)

    # pandas oracle: iterate until clean
    s = pdf["value"].copy()
    rejected = pd.Series(False, index=s.index)
    for _ in range(30):
        z = np.abs((s - s.mean()) / s.std(ddof=0))
        new = z > 4.0
        if new.sum() == 0:
            break
        rejected |= new
        s[new] = np.nan
    exp = np.where(pdf["value"].isnull(), np.nan, np.where(rejected, 2, 0))
    np.testing.assert_allclose(got["flag_z"].values.astype(float), exp, equal_nan=True)
    assert n_iter >= 2  # the 20-sigma spikes guarantee multiple iterations


def test_local_sd_matches_pandas(spark):
    pdf = spiked_series(n=500)
    win = 30
    got = (
        local_sd_flag(spark.createDataFrame(pdf), winsize=win, n_sd=5.0)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    s = pdf["value"].dropna()
    rmed = s.rolling(win, center=True, min_periods=3).median()
    rsd = s.rolling(win, center=True, min_periods=3).std()
    upper, lower = rmed + 5.0 * rsd, rmed - 5.0 * rsd
    rej = (s > upper) | (s < lower)
    exp = pd.Series(np.nan, index=pdf.index)
    exp[s.index] = np.where(rej, 2, 0)
    # min_periods NaN limits -> pandas comparison False -> flag 0 (ok);
    # our impl leaves flag NULL there: accept either by comparing rejected set
    got_rej = set(got.loc[got["flag_localsd"] == 2, "pos"])
    exp_rej = set(pdf.loc[exp == 2, "pos"]) if (exp == 2).any() else set()
    assert got_rej == exp_rej


def test_abs_limits_and_manual_and_missing(spark):
    pdf = seeded_series(n=200, gap_frac=0.1)
    sdf = spark.createDataFrame(pdf)
    got = abs_limits_flag(sdf, lo=30.0, hi=70.0).toPandas().sort_values("pos")
    s = pdf["value"]
    exp_rej = ((s < 30) | (s > 70)) & s.notnull()
    assert set(got.loc[got["flag_abslim"] == 2, "pos"]) == set(pdf.loc[exp_rej, "pos"])

    got2 = manual_removal_flag(sdf, ranges=[(10, 20), (100, 110)]).toPandas()
    rej2 = got2.loc[got2["flag_manual"] == 2, "pos"]
    exp2 = pdf[(pdf["pos"].between(10, 20) | pdf["pos"].between(100, 110))
               & pdf["value"].notna()]["pos"]
    assert set(rej2) == set(exp2)

    got3 = missing_vals_flag(sdf).toPandas()
    assert (got3["flag_missing"] == 2).sum() == s.isnull().sum()


def test_zscore_increments(spark):
    pdf = seeded_series(n=300, gap_frac=0.0, seed=5)
    pdf.loc[150, "value"] += 500  # one huge jump
    got = zscore_increments_flag(spark.createDataFrame(pdf), thres=10.0).toPandas()
    assert got.loc[got["pos"] == 150, "flag_zscore_incr"].iloc[0] == 2


def test_qcf_truth_table(spark):
    # F4 fixture: rows pinning the QCF rules (qcf.py:241-262)
    rows = [
        # (f1, f2, f3, f4, f5, expected_qcf)
        (0, 0, 0, 0, 0, 0),      # all clean
        (1, 0, 0, 0, 0, 1),      # 1 soft
        (1, 1, 1, 0, 0, 1),      # 3 soft
        (1, 1, 1, 1, 0, 2),      # 4 soft -> reject
        (2, 0, 0, 0, 0, 2),      # 1 hard -> reject
        (2, 1, 1, 0, 0, 2),      # hard + soft -> reject
    ]
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)],
        "id int, f1 int, f2 int, f3 int, f4 int, f5 int, expected int",
    )
    got = qcf_flag(df, ["f1", "f2", "f3", "f4", "f5"]).toPandas().sort_values("id")
    assert (got["qcf"] == got["expected"]).all()


def test_apply_qcf_filtering(spark):
    pdf = spiked_series()
    sdf = zscore_flag(spark.createDataFrame(pdf), thres=4.0)
    q = apply_qcf(qcf_flag(sdf, ["flag_zscore"]))
    n_rej = q.where((F.col("qcf") == 2) & F.col("value_qcf").isNull()
                    & F.col("value").isNotNull()).count()
    assert n_rej == q.where(F.col("qcf") == 2).count()


def test_zscore_flag_tokens_matches_generic_path(spark):
    """The fused array-side z-score must agree row-for-row with
    series_view |> zscore_flag (same population, same flags) including
    NA-sentinel gaps."""
    from diive_spark.datagen import NA_SENTINEL, series_view, tokens_table
    from diive_spark.operators.outliers import zscore_flag_tokens

    toks = tokens_table(spark, n_docs=60, seed=7)
    generic = zscore_flag(series_view(toks), thres=2.5).select(
        "source", "doc_id", "pos", "value", "flag_zscore"
    )
    fused = zscore_flag_tokens(toks, thres=2.5, na_sentinel=NA_SENTINEL)
    a = sorted(map(tuple, generic.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b

    # plan: no join, no aggregate exchange — a single narrow map
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_zscore_flag_null_stratum_is_its_own_population(spark):
    """Rows whose strata value is NULL form their own z-score
    population (Window.partitionBy semantics): the aggregate+join-back
    rewrite must join null-safely or NULL-stratum outliers silently
    pass unflagged."""
    rng = np.random.default_rng(7)
    base = rng.normal(10.0, 1.0, 300)
    pdf = pd.DataFrame({
        "source": "s1", "doc_id": 1,
        "pos": np.arange(300),
        "value": base,
        "daytime": [1 if i % 3 == 0 else (0 if i % 3 == 1 else None)
                    for i in range(300)],
    })
    pdf.loc[2, "value"] += 200.0      # spike inside the NULL stratum
    got = zscore_flag(
        spark.createDataFrame(pdf), thres=4.0, strata_col="daytime",
    ).toPandas().set_index("pos")
    assert got.loc[2, "flag_zscore"] == 2          # flagged, not skipped
    nulls = got[got["daytime"].isna()]
    assert (nulls["flag_zscore"] != 0).sum() == 1  # only the spike


def test_ewma_chart_matches_numpy_and_catches_drift(spark):
    """ewma_chart vs a numpy fold twin (same truncated recursion), and
    the chart property: a planted level-shift segment — each point too
    mild for a 4-sigma z-score — is caught by the EWMA drift signal."""
    from diive_spark.operators.outliers import ewma_chart

    rng = np.random.default_rng(17)
    n = 2000
    v = rng.normal(0.0, 1.0, n)
    v[1200:1300] += 4.0                       # slow-shift segment
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    out = (
        ewma_chart(spark.createDataFrame(pdf), alpha=0.2, window=64,
                   n_sigma=3.0, key_cols=["source", "doc_id"])
        .orderBy("pos").toPandas()
    )
    # numpy twin: exact truncated fold per position
    a, w = 0.2, 64
    exp = np.empty(n)
    for t in range(n):
        seg = v[max(0, t - w + 1): t + 1]
        acc = seg[0]
        for x in seg[1:]:
            acc = acc * (1 - a) + a * x
        exp[t] = acc
    assert np.allclose(out.ewma.to_numpy(), exp, atol=1e-12)
    m, sd = v.mean(), v.std()
    lim = 3.0 * sd * np.sqrt(a / (2 - a))
    assert (out.flag_ewma.to_numpy() == np.where(
        np.abs(exp - m) > lim, 2, 0)).all()
    # drift caught inside the shifted segment...
    assert out.flag_ewma.to_numpy()[1210:1300].max() == 2
    # ...where a 4-sigma per-point z-score misses almost all of it
    assert (np.abs((v[1200:1300] - m) / sd) < 4.0).mean() > 0.9


def test_cusum_chart_matches_numpy_and_finds_changepoint(spark):
    """cusum_chart vs a numpy clamped-fold twin, and the changepoint
    property: a persistent +1.2-sigma shift — far too small for any
    per-point test — accumulates past h within the shifted region."""
    from diive_spark.operators.outliers import cusum_chart

    rng = np.random.default_rng(23)
    n = 2000
    v = rng.normal(0.0, 1.0, n)
    v[1000:1300] += 1.2                      # small persistent shift
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    # h=8: above this seed's worst in-control excursion (7.1 — with
    # k=0.5 the textbook h=5 has ARL0 ~ 930, so one false alarm per
    # ~1000 in-control samples is EXPECTED; the property under test is
    # the changepoint, not the false-alarm rate)
    k, h, w = 0.5, 8.0, 128
    out = (
        cusum_chart(spark.createDataFrame(pdf), k=k, h=h, window=w,
                    key_cols=["source", "doc_id"])
        .orderBy("pos").toPandas()
    )
    m, sd = v.mean(), v.std()
    z = (v - m) / sd
    hi = np.empty(n)
    lo = np.empty(n)
    for t in range(n):
        seg = z[max(0, t - w + 1): t + 1]
        a = b = 0.0
        for x in seg:
            a = max(0.0, a + x - k)
            b = max(0.0, b - x - k)
        hi[t], lo[t] = a, b
    assert np.allclose(out.cusum_hi.to_numpy(), hi, atol=1e-12)
    assert np.allclose(out.cusum_lo.to_numpy(), lo, atol=1e-12)
    exp_flag = np.where((hi > h) | (lo > h), 2, 0)
    assert (out.flag_cusum.to_numpy() == exp_flag).all()
    # the shift is caught shortly after onset...
    assert out.flag_cusum.to_numpy()[1000:1100].max() == 2
    # ...and before onset the chart is quiet
    assert out.flag_cusum.to_numpy()[:990].max() == 0
    # while per-point 4-sigma z-scores miss essentially all of it
    assert (np.abs(z[1000:1300]) < 4.0).mean() > 0.99


def test_ewma_cusum_kernel_parity(spark):
    """kernel=True (Arrow numpy sweep) vs the collect_list fold path:
    ewma values BIT-identical (fold over raw values, identical op
    order); cusum values to 1e-9 (fold input z depends on numpy-vs-JVM
    mean/sd summation order); flags exactly equal on both.  Multiple
    series + a null reading to exercise grouping and the non-null
    contract."""
    from diive_spark.operators.outliers import cusum_chart, ewma_chart

    rng = np.random.default_rng(31)
    frames = []
    for d in ("d1", "d2", "d3"):
        v = rng.normal(0.0, 1.0, 700)
        v[400:480] += 2.5
        pdf = pd.DataFrame({"source": "s", "doc_id": d,
                            "pos": np.arange(700), "value": v})
        frames.append(pdf)
    pdf = pd.concat(frames, ignore_index=True)
    pdf.loc[5, "value"] = np.nan
    df = spark.createDataFrame(pdf).repartition(8).cache()

    key = ["source", "doc_id", "pos"]
    e_fold = (ewma_chart(df, alpha=0.2, window=64,
                         key_cols=["source", "doc_id"])
              .orderBy(*key).toPandas())
    e_kern = (ewma_chart(df, alpha=0.2, window=64,
                         key_cols=["source", "doc_id"], kernel=True)
              .orderBy(*key).toPandas())
    assert (e_fold.ewma.to_numpy() == e_kern.ewma.to_numpy()).all()
    assert (e_fold.flag_ewma.to_numpy() == e_kern.flag_ewma.to_numpy()).all()
    assert len(e_fold) == 3 * 700 - 1          # null reading dropped

    c_fold = (cusum_chart(df, k=0.5, h=6.0, window=128,
                          key_cols=["source", "doc_id"])
              .orderBy(*key).toPandas())
    c_kern = (cusum_chart(df, k=0.5, h=6.0, window=128,
                          key_cols=["source", "doc_id"], kernel=True)
              .orderBy(*key).toPandas())
    assert np.allclose(c_fold.cusum_hi, c_kern.cusum_hi, atol=1e-9)
    assert np.allclose(c_fold.cusum_lo, c_kern.cusum_lo, atol=1e-9)
    assert (c_fold.flag_cusum.to_numpy() == c_kern.flag_cusum.to_numpy()).all()
    assert c_kern.flag_cusum.max() == 2        # shift still caught


def test_seasonal_zscore_catches_in_phase_anomaly(spark):
    """seasonal_zscore_flag vs a pandas twin (phase-median detrend +
    residual z), and the property that motivates it: an anomaly parked
    at the cycle trough — invisible to a plain z-score because the
    cycle dominates the variance — is flagged on the residual."""
    from diive_spark.operators.outliers import seasonal_zscore_flag

    rng = np.random.default_rng(29)
    n, period = 2880, 288
    pos = np.arange(n)
    v = 50 + 30 * np.sin(2 * np.pi * pos / period) + rng.normal(0, 1, n)
    trough = 3 * period + period * 3 // 4          # sin == -1 here
    v[trough] += 15.0                              # within global range
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": pos, "value": v})
    out = (
        seasonal_zscore_flag(spark.createDataFrame(pdf), period=period,
                             thres=4.0, key_cols=["source", "doc_id"])
        .orderBy("pos").toPandas()
    )
    p = pdf.copy()
    p["ph"] = p.pos % period
    p["r"] = p.value - p.groupby("ph").value.transform("median")
    z = np.abs((p.r - p.r.mean()) / p.r.std(ddof=0))
    exp = np.where(z > 4.0, 2, 0)
    assert np.allclose(out["resid"].to_numpy(), p.r.to_numpy(), atol=1e-9)
    assert (out.flag_seasonal_z.to_numpy() == exp).all()
    assert out.flag_seasonal_z.to_numpy()[trough] == 2   # caught
    # the plain z-score is blind to it (cycle variance swamps it)
    assert abs(v[trough] - v.mean()) / v.std() < 4.0


def test_robust_zscore_resists_masking(spark):
    """robust_zscore_flag vs a pandas median/MAD twin, and the masking
    property: a gross outlier inflates mean/sd enough that plain
    zScore misses a second, modest outlier — the MAD score flags
    both."""
    from diive_spark.operators.outliers import robust_zscore_flag

    rng = np.random.default_rng(53)
    v = rng.normal(0.0, 1.0, 500)
    v[100] = 500.0                                # gross outlier
    v[200] = 9.0                                  # modest outlier
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(500), "value": v})
    out = (
        robust_zscore_flag(spark.createDataFrame(pdf), thres=3.5,
                           key_cols=["source", "doc_id"])
        .orderBy("pos").toPandas()
    )
    md = np.median(v)
    mad = np.median(np.abs(v - md))
    m = 0.6745 * (v - md) / mad
    exp = np.where(np.abs(m) > 3.5, 2, 0)
    assert (out.flag_robust_z.to_numpy() == exp).all()
    assert out.flag_robust_z[100] == 2 and out.flag_robust_z[200] == 2
    # plain z-score: the 500 masks the 9 (sd blown up)
    z200 = abs(v[200] - v.mean()) / v.std()
    assert z200 < 4.0


def test_local_sd_kernel_path_is_bit_identical(spark):
    """local_sd_flag(kernel=True) — the pandas-rolling Arrow kernel —
    must agree row-for-row with the JVM percentile-window path on the
    same input (including the min_periods NULL band and null values)."""
    from diive_spark.operators.outliers import local_sd_flag

    pdf = spiked_series(n=600, seed=19)
    sdf = spark.createDataFrame(pdf)
    a = (
        local_sd_flag(sdf, winsize=30, n_sd=5.0)
        .orderBy("pos").toPandas()[["pos", "flag_localsd"]]
    )
    b = (
        local_sd_flag(sdf, winsize=30, n_sd=5.0, kernel=True)
        .orderBy("pos").toPandas()[["pos", "flag_localsd"]]
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True).astype({"flag_localsd": "Float64"}),
        b.reset_index(drop=True).astype({"flag_localsd": "Float64"}),
    )
