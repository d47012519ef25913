"""Oracle-twin tests for the forecast / spectral / LM-fluency additions:
kalman_local_level, seasonal_decompose, seasonal_naive_backtest,
dft_power_peak, pacf_yule_walker, bigram_logprob_score, tfidf_top_terms.

Every numeric operator is checked against a definitional numpy/pandas
twin (exact recurrence loop, numpy rfft periodogram, full
Durbin-Levinson recursion) plus a planted-signal sanity case, and the
shuffle-shape claims carry plan gates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import seeded_series


def _one_series(pdf, spark):
    return spark.createDataFrame(pdf)


# ------------------------------------------------------------- kalman

def test_kalman_matches_numpy_loop(spark):
    pdf = seeded_series(n=300, gap_frac=0.1, seed=11)
    from diive_spark.operators.forecast import kalman_local_level

    q, r = 0.2, 4.0
    got = kalman_local_level(
        _one_series(pdf, spark), q=q, r=r
    ).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    m, p, sse = x[0], r, 0.0
    for xi in x[1:]:
        p_pred = p + q
        gain = p_pred / (p_pred + r)
        innov = xi - m
        m = m + gain * innov
        p = (1 - gain) * p_pred
        sse += innov * innov
    assert got["n"] == len(x)
    assert abs(got["level"] - m) < 1e-12
    assert abs(got["p_var"] - p) < 1e-12
    assert abs(got["gain"] - (p + q) / ((p + q) + r)) < 1e-12
    assert abs(got["rmse"] - math.sqrt(sse / (len(x) - 1))) < 1e-12


def test_kalman_constant_series_locks_on(spark):
    # constant observations: level == the constant, innovations after
    # the first are 0, P converges toward the steady-state fixed point
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(60),
         "value": 7.5}
    )
    from diive_spark.operators.forecast import kalman_local_level

    got = kalman_local_level(_one_series(pdf, spark), q=0.2, r=4.0)
    row = got.toPandas().iloc[0]
    assert abs(row["level"] - 7.5) < 1e-12
    assert row["rmse"] < 1e-12
    # steady-state P* solves P = (1-K)(P+q) with K = (P+q)/(P+q+r)
    pstar = row["p_var"]
    p_pred = pstar + 0.2
    assert abs((1 - p_pred / (p_pred + 4.0)) * p_pred - pstar) < 1e-9


def test_kalman_single_point(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [3], "value": [9.0]}
    )
    from diive_spark.operators.forecast import kalman_local_level

    row = kalman_local_level(_one_series(pdf, spark)).toPandas().iloc[0]
    assert row["n"] == 1 and abs(row["level"] - 9.0) < 1e-12
    assert pd.isna(row["rmse"])


# ---------------------------------------------------------- decompose

def test_seasonal_decompose_recovers_planted_profile(spark):
    # pure trend + period-7 profile, no noise: the re-centered phase
    # means must equal the planted profile (itself re-centered) and
    # strength must be ~1 (residual variance ~0)
    period = 7
    prof = np.array([4.0, -2.0, 1.0, 0.0, -3.0, 2.5, -2.5])
    pos = np.arange(140)
    v = 100.0 + 0.25 * pos + prof[pos % period]
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.forecast import seasonal_decompose

    got = (
        seasonal_decompose(_one_series(pdf, spark), period=period)
        .toPandas()
        .sort_values("phase")
        .reset_index(drop=True)
    )
    want = prof - prof.mean()
    assert len(got) == period
    np.testing.assert_allclose(got["seasonal"], want, atol=1e-9)
    assert (got["strength"] > 0.999999).all()


def test_seasonal_decompose_matches_pandas_twin(spark):
    pdf = seeded_series(n=240, gap_frac=0.12, seed=3)
    period, h = 7, 3
    from diive_spark.operators.forecast import seasonal_decompose

    got = (
        seasonal_decompose(_one_series(pdf, spark), period=period)
        .toPandas()
        .sort_values("phase")
        .reset_index(drop=True)
    )
    s = pdf.set_index("pos")["value"]
    # centered MA on the pos grid, full-window gated
    trend = s.rolling(period, center=True, min_periods=period).mean()
    det = (s - trend).dropna()
    phase = det.index.to_numpy() % period
    raw = pd.Series(det.to_numpy()).groupby(phase).mean()
    seasonal = raw - raw.mean()
    resid = det.to_numpy() - seasonal.reindex(phase).to_numpy()
    strength = max(
        0.0, 1.0 - np.var(resid, ddof=1) / np.var(det.to_numpy(), ddof=1)
    )
    np.testing.assert_allclose(
        got["seasonal"], seasonal.sort_index().to_numpy(), atol=1e-9
    )
    np.testing.assert_allclose(got["strength"], strength, atol=1e-9)
    counts = pd.Series(1, index=phase).groupby(level=0).sum()
    np.testing.assert_array_equal(
        got["n_phase"], counts.sort_index().to_numpy()
    )


# ----------------------------------------------------------- backtest

def test_seasonal_naive_backtest_matches_pandas(spark):
    pdf = seeded_series(n=400, gap_frac=0.15, seed=21)
    period = 48
    from diive_spark.operators.forecast import seasonal_naive_backtest

    got = seasonal_naive_backtest(
        _one_series(pdf, spark), period=period
    ).toPandas().iloc[0]
    s = pdf.set_index("pos")["value"].dropna()
    full = s.reindex(np.arange(pdf["pos"].max() + 1))

    def metrics(k):
        e = (full - full.shift(k)).dropna()
        return len(e), e.abs().mean(), math.sqrt((e**2).mean()), e.mean()

    n_s, mae_s, rmse_s, bias_s = metrics(period)
    n_1, mae_1, _, _ = metrics(1)
    assert got["n_seasonal"] == n_s and got["n_naive"] == n_1
    assert abs(got["mae"] - mae_s) < 1e-9
    assert abs(got["rmse"] - rmse_s) < 1e-9
    assert abs(got["bias"] - bias_s) < 1e-9
    assert abs(got["mae_naive"] - mae_1) < 1e-9
    assert abs(got["skill"] - (1 - mae_s / mae_1)) < 1e-9


def test_seasonal_naive_perfect_on_periodic_signal(spark):
    pos = np.arange(200)
    v = 10.0 + np.where(pos % 48 < 24, 5.0, -5.0)
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.forecast import seasonal_naive_backtest

    got = seasonal_naive_backtest(
        _one_series(pdf, spark), period=48
    ).toPandas().iloc[0]
    assert got["mae"] < 1e-12 and got["rmse"] < 1e-12
    assert got["skill"] > 0.999  # naive-1 misses every square edge


def test_seasonal_naive_no_join_single_exchange(spark):
    from diive_spark.operators.forecast import seasonal_naive_backtest
    from diive_spark.queries import series

    out = seasonal_naive_backtest(series(spark, "/root/testdata/sf0.01"),
                                  period=48)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # series() itself needs one exchange for its row_number window; the
    # backtest adds no second hash partitioning (window + agg reuse it)
    assert plan.count("Exchange hashpartitioning") <= 2, plan


# ---------------------------------------------------------------- dft

def test_dft_peak_finds_planted_sinusoid(spark):
    n, k_true = 256, 5
    pos = np.arange(n)
    v = 50.0 + 12.0 * np.sin(2 * np.pi * k_true * pos / n)
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.spectral import dft_power_peak

    got = dft_power_peak(_one_series(pdf, spark), max_k=24)
    row = got.toPandas().iloc[0]
    assert row["k_peak"] == k_true
    assert abs(row["period"] - n / k_true) < 1e-9
    assert row["power_frac"] > 0.999
    # periodogram value of a pure tone: |S|^2 = (A*n/2)^2
    assert abs(row["power"] - (12.0 * n / 2) ** 2) < 1e-3


def test_dft_power_matches_numpy_rfft(spark):
    pdf = seeded_series(n=180, gap_frac=0.1, seed=5)
    from diive_spark.operators.spectral import dft_power_peak

    row = dft_power_peak(
        _one_series(pdf, spark), max_k=24
    ).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    x = x - x.mean()
    spec = np.abs(np.fft.rfft(x)) ** 2
    band = spec[1 : min(24, len(x) // 2) + 1]
    k_np = int(np.argmax(np.round(band, 6))) + 1
    assert row["k_peak"] == k_np
    assert abs(row["power"] - band[k_np - 1]) < 1e-6 * band[k_np - 1]
    assert abs(row["power_frac"] - band[k_np - 1] / band.sum()) < 1e-9


def test_dft_short_series_nulls(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0, 1, 2],
         "value": [1.0, 2.0, 3.0]}
    )
    from diive_spark.operators.spectral import dft_power_peak

    row = dft_power_peak(_one_series(pdf, spark)).toPandas().iloc[0]
    assert row["n"] == 3 and pd.isna(row["k_peak"])


# --------------------------------------------------------------- pacf

def test_pacf_matches_full_durbin_levinson(spark):
    pdf = seeded_series(n=400, gap_frac=0.08, seed=13)
    from diive_spark.operators.spectral import pacf_yule_walker

    row = pacf_yule_walker(_one_series(pdf, spark)).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    m = x.mean()
    d = x - m
    den = (d * d).sum()
    # the operator's r_k assembles the pair sums from raw cross-moments;
    # replay the DEFINITIONAL form so the algebra itself is what's tested
    r = [1.0]
    for k in (1, 2, 3):
        r.append(((x[k:] - m) * (x[:-k] - m)).sum() / den)
    # full Durbin-Levinson
    phi_prev = [r[1]]
    pacf = [r[1]]
    for k in (2, 3):
        num = r[k] - sum(
            phi_prev[j] * r[k - 1 - j] for j in range(len(phi_prev))
        )
        denk = 1 - sum(
            phi_prev[j] * r[j + 1] for j in range(len(phi_prev))
        )
        phik = num / denk
        phi_prev = [
            phi_prev[j] - phik * phi_prev[len(phi_prev) - 1 - j]
            for j in range(len(phi_prev))
        ] + [phik]
        pacf.append(phik)
    assert row["n"] == len(x)
    assert abs(row["pacf1"] - pacf[0]) < 1e-9
    assert abs(row["pacf2"] - pacf[1]) < 1e-9
    assert abs(row["pacf3"] - pacf[2]) < 1e-9


def test_pacf_ar1_cuts_off_after_lag1(spark):
    rng = np.random.default_rng(17)
    n, phi = 4000, 0.7
    x = np.zeros(n)
    eps = rng.normal(0, 1, n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(n), "value": x}
    )
    from diive_spark.operators.spectral import pacf_yule_walker

    row = pacf_yule_walker(_one_series(pdf, spark)).toPandas().iloc[0]
    assert abs(row["pacf1"] - phi) < 0.05
    assert abs(row["pacf2"]) < 0.05 and abs(row["pacf3"]) < 0.05


def test_pacf_degenerate_constant_is_null(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(20), "value": 4.2}
    )
    from diive_spark.operators.spectral import pacf_yule_walker

    row = pacf_yule_walker(_one_series(pdf, spark)).toPandas().iloc[0]
    assert pd.isna(row["r1"]) and pd.isna(row["pacf3"])


# ------------------------------------------------------------ text LM

def test_bigram_logprob_hand_computed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["a b a b", "a b", "c"]}
        )
    )
    from diive_spark.operators.textstats import bigram_logprob_score

    got = (
        bigram_logprob_score(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # corpus bigrams: (a,b) x3, (b,a) x1; contexts: a->3, b->1; V=3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    lp1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert got.loc[1, "n_bigrams"] == 3
    assert abs(got.loc[1, "bigram_logprob"] - lp1) < 1e-12
    assert got.loc[2, "n_bigrams"] == 1
    assert abs(got.loc[2, "bigram_logprob"] - math.log(p_ab)) < 1e-12
    assert got.loc[3, "n_bigrams"] == 0
    assert pd.isna(got.loc[3, "bigram_logprob"])


def test_bigram_scores_order_sensitivity(spark):
    # same unigrams, scrambled order: the scrambled doc must score
    # strictly lower — the signal unigram_logprob cannot see
    base = "the quick brown fox jumps over the lazy dog " * 5
    scrambled = " ".join(reversed(base.split()))
    rows = [(i, base) for i in range(10)] + [(99, scrambled)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    from diive_spark.operators.textstats import bigram_logprob_score

    got = bigram_logprob_score(docs).toPandas().set_index("doc_id")
    assert got.loc[99, "bigram_logprob"] < got.loc[0, "bigram_logprob"] - 0.5


def test_tfidf_matches_pandas_twin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from diive_spark.operators.textstats import tfidf_top_terms

    got = tfidf_top_terms(docs, top_k=5).toPandas()
    pdf = docs.select("doc_id", "source", "text").toPandas()
    rows = []
    for _, rr in pdf.iterrows():
        for w in rr["text"].strip().lower().split():
            rows.append((rr["doc_id"], rr["source"], w))
    tok = pd.DataFrame(rows, columns=["doc_id", "source", "term"])
    tf = tok.groupby(["source", "term"]).size().rename("tf").reset_index()
    dfreq = (
        tok.groupby("term")["doc_id"].nunique().rename("df").reset_index()
    )
    nd = pdf["doc_id"].nunique()
    sc = tf.merge(dfreq, on="term")
    sc["score"] = sc["tf"] * np.log(nd / sc["df"])
    sc["rscore"] = sc["score"].round(6)
    sc = sc.sort_values(
        ["source", "rscore", "term"], ascending=[True, False, True]
    )
    sc["rank"] = sc.groupby("source").cumcount() + 1
    want = sc[sc["rank"] <= 5]
    merged = got.merge(
        want, on=["source", "rank"], suffixes=("", "_w"), how="outer",
        indicator=True,
    )
    assert (merged["_merge"] == "both").all()
    assert (merged["term"] == merged["term_w"]).all()
    np.testing.assert_allclose(merged["score"], merged["score_w"], atol=1e-9)


def test_tfidf_plan_no_cartesian_window_on_aggregate(spark):
    from diive_spark.operators.textstats import tfidf_top_terms

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        tfidf_top_terms(docs, top_k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the corpus-size side must arrive broadcast, never shuffled
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# -------------------------------------------------------------- hurst

def _hurst_numpy(x, sizes=(8, 16, 32, 64)):
    rows = []
    for s in sizes:
        rss = []
        nb = len(x) // s
        for b in range(nb):
            blk = x[b * s : (b + 1) * s]
            z = np.cumsum(blk - blk.mean())
            std = blk.std(ddof=0)
            if std > 0:
                rss.append((z.max() - z.min()) / std)
        rows.append((s, len(rss), np.mean(rss) if rss else np.nan))
    valid = [(np.log(s), np.log(rs)) for s, n, rs in rows if rs > 0]
    h = np.nan
    if len(valid) >= 2:
        xs = np.array([v[0] for v in valid])
        ys = np.array([v[1] for v in valid])
        p = len(xs)
        h = (p * (xs * ys).sum() - xs.sum() * ys.sum()) / (
            p * (xs * xs).sum() - xs.sum() ** 2
        )
    return rows, h


def test_hurst_matches_numpy_twin(spark):
    pdf = seeded_series(n=600, gap_frac=0.1, seed=31)
    from diive_spark.operators.spectral import hurst_rs

    got = (
        hurst_rs(_one_series(pdf, spark))
        .toPandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    x = pdf["value"].dropna().to_numpy()
    rows, h = _hurst_numpy(x)
    # the numpy twin's per-block Z uses cumsum(blk - mean) which equals
    # the operator's cs - k*mean identity exactly in real arithmetic
    for i, (s, nb, rs) in enumerate(rows):
        assert got.loc[i, "s"] == s and got.loc[i, "n_blocks"] == nb
        assert abs(got.loc[i, "avg_rs"] - rs) < 1e-9
    np.testing.assert_allclose(got["h"], h, atol=1e-9)


def test_hurst_separates_persistence_regimes(spark):
    rng = np.random.default_rng(7)
    n = 4096
    noise = rng.normal(0, 1, n)
    # persistent: heavy moving average of noise; antipersistent:
    # first-difference of noise (strong mean reversion)
    persistent = np.convolve(noise, np.ones(25) / 25, mode="same")
    antip = np.diff(noise, prepend=0.0)
    from diive_spark.operators.spectral import hurst_rs

    def h_of(v, tag):
        pdf = pd.DataFrame(
            {"source": "s", "doc_id": tag, "pos": np.arange(len(v)),
             "value": v}
        )
        return (
            hurst_rs(_one_series(pdf, spark)).toPandas()["h"].iloc[0]
        )

    h_noise = h_of(noise, "n")
    h_pers = h_of(persistent, "p")
    h_anti = h_of(antip, "a")
    assert 0.35 < h_noise < 0.7
    assert h_pers > h_noise + 0.15
    assert h_anti < h_noise - 0.1


def test_hurst_short_series_null_h(spark):
    # 12 readings: only size 8 yields a complete block -> p = 1 -> h null
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(12),
         "value": np.arange(12, dtype=float) ** 1.3}
    )
    from diive_spark.operators.spectral import hurst_rs

    got = hurst_rs(_one_series(pdf, spark)).toPandas()
    assert got["h"].isna().all()
    assert got.set_index("s").loc[8, "n_blocks"] == 1
    assert got.set_index("s").loc[64, "n_blocks"] == 0


# ---------------------------------------------------------------- dtw

def _zpaa(v, seg_n):
    v = pd.Series(v).dropna().to_numpy()
    n = len(v)
    sd = v.std(ddof=0)
    z = np.zeros(n) if sd == 0 else (v - v.mean()) / sd
    segs = (np.arange(n) * seg_n) // n
    return np.array([z[segs == s].mean() for s in range(min(seg_n, n))])


def _dtw_band_ref(x, y, radius):
    n, m = len(x), len(y)
    big = 1e30
    prev = [0.0] + [big] * m
    for i in range(1, n + 1):
        cur = [big]
        for j in range(1, m + 1):
            if abs(i - j) <= radius:
                c = abs(x[i - 1] - y[j - 1]) + min(
                    prev[j], prev[j - 1], cur[j - 1]
                )
            else:
                c = big
            cur.append(c)
        prev = cur
    return prev[m]


def test_dtw_matches_reference_dp(spark):
    rng = np.random.default_rng(23)
    series = {}
    rows = []
    for d in ["0", "1", "2"]:
        v = rng.normal(50, 10, 120)
        v[rng.random(120) < 0.1] = np.nan
        series[d] = v
        for p, val in enumerate(v):
            rows.append(("s", d, p, val))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    from diive_spark.operators.spectral import dtw_to_exemplar

    got = (
        dtw_to_exemplar(
            spark.createDataFrame(pdf), exemplar_doc="0",
            segments=8, radius=3,
        )
        .toPandas()
        .set_index("doc_id")
    )
    ref_sketch = _zpaa(series["0"], 8)
    for d in ["0", "1", "2"]:
        want = _dtw_band_ref(_zpaa(series[d], 8), ref_sketch, 3)
        assert abs(got.loc[d, "dtw"] - want) < 1e-9, d
    assert got.loc["0", "dtw"] < 1e-12  # self-distance


def test_dtw_warp_tolerance_beats_reversal(spark):
    # a locally time-warped copy of the exemplar shape must sit far
    # closer (in DTW) than the reversed shape — the property Euclidean
    # distance on aligned positions cannot deliver
    n = 192
    t = np.linspace(0, 4 * np.pi, n)
    base = np.sin(t) * 10 + 50
    warp = np.interp(
        np.linspace(0, 1, n) ** 1.15, np.linspace(0, 1, n), base
    )
    rows = []
    for d, v in [("0", base), ("w", warp), ("r", base[::-1])]:
        rows += [("s", d, p, float(x)) for p, x in enumerate(v)]
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    from diive_spark.operators.spectral import dtw_to_exemplar

    got = (
        dtw_to_exemplar(
            spark.createDataFrame(pdf), exemplar_doc="0",
            segments=24, radius=4,
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc["w", "dtw"] < 0.25 * got.loc["r", "dtw"]


def test_dtw_short_or_missing_exemplar_is_null(spark):
    rows = [("a", "0", p, float(p)) for p in range(30)]   # exemplar ok
    rows += [("a", "1", p, float(p)) for p in range(5)]   # too short
    rows += [("b", "1", p, float(p)) for p in range(30)]  # no exemplar
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    from diive_spark.operators.spectral import dtw_to_exemplar

    got = dtw_to_exemplar(
        spark.createDataFrame(pdf), exemplar_doc="0",
        segments=8, radius=3,
    ).toPandas().set_index(["source", "doc_id"])
    assert abs(got.loc[("a", "0"), "dtw"]) < 1e-12
    assert pd.isna(got.loc[("a", "1"), "dtw"])
    assert pd.isna(got.loc[("b", "1"), "dtw"])


# ------------------------------------------------------ variance ratio

def test_variance_ratio_matches_numpy(spark):
    pdf = seeded_series(n=500, gap_frac=0.1, seed=29)
    q = 4
    from diive_spark.operators.spectral import variance_ratio

    got = variance_ratio(_one_series(pdf, spark), q=q).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    n = len(x)
    mu = (x[-1] - x[0]) / (n - 1)
    d1 = x[1:] - x[:-1]
    dq = x[q:] - x[:-q]
    sig1 = ((d1 - mu) ** 2).sum() / (n - 1)
    sigq = ((dq - q * mu) ** 2).sum() / (q * (n - q))
    vr = sigq / sig1
    z = (vr - 1) * math.sqrt(3 * q * (n - q) / (2 * (2 * q - 1) * (q - 1)))
    assert got["n"] == n
    assert abs(got["mu"] - mu) < 1e-12
    assert abs(got["vr"] - vr) < 1e-9
    assert abs(got["z"] - z) < 1e-9


def test_variance_ratio_separates_regimes(spark):
    rng = np.random.default_rng(11)
    n = 4000
    eps = rng.normal(0, 1, n)
    walk = np.cumsum(eps)                      # random walk: VR ~ 1
    trend = np.cumsum(np.convolve(eps, np.ones(8) / 8, mode="same"))
    noise = eps                                # levels: mean-reverting
    from diive_spark.operators.spectral import variance_ratio

    def vr_of(v, tag):
        pdf = pd.DataFrame(
            {"source": "s", "doc_id": tag, "pos": np.arange(len(v)),
             "value": v}
        )
        return variance_ratio(
            _one_series(pdf, spark), q=4
        ).toPandas().iloc[0]

    r_walk, r_trend, r_noise = (
        vr_of(walk, "w"), vr_of(trend, "t"), vr_of(noise, "n")
    )
    assert 0.8 < r_walk["vr"] < 1.2 and abs(r_walk["z"]) < 3.0
    assert r_trend["vr"] > 1.5 and r_trend["z"] > 3.0
    assert r_noise["vr"] < 0.6 and r_noise["z"] < -3.0


def test_variance_ratio_constant_series_null(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(30), "value": 5.0}
    )
    from diive_spark.operators.spectral import variance_ratio

    got = variance_ratio(_one_series(pdf, spark)).toPandas().iloc[0]
    assert pd.isna(got["vr"]) and pd.isna(got["z"])


# --------------------------------------------------------- KL drift

def test_source_kl_hand_computed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2],
             "source": ["a", "b"],
             "text": ["x x y", "y z z z"]}
        )
    )
    from diive_spark.operators.textstats import source_kl_divergence

    got = source_kl_divergence(docs).toPandas().set_index("source")
    # corpus: x:2 y:2 z:3, total 7
    def kl(counts, tot):
        q = {"x": 2 / 7, "y": 2 / 7, "z": 3 / 7}
        return sum(
            (c / tot) * math.log((c / tot) / q[w])
            for w, c in counts.items()
        )

    assert got.loc["a", "n_tokens"] == 3 and got.loc["a", "n_vocab"] == 2
    assert abs(got.loc["a", "kl"] - kl({"x": 2, "y": 1}, 3)) < 1e-12
    assert abs(got.loc["b", "kl"] - kl({"y": 1, "z": 3}, 4)) < 1e-12
    assert abs(got.loc["a", "top_term_mass"] - 2 / 3) < 1e-12


def test_source_kl_nonneg_and_flags_drifted_source(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for d in range(40):
        words = rng.choice(vocab, 60)
        rows.append((d, "base", " ".join(words)))
    for d in range(40, 44):
        # drifted source writes from a disjoint vocabulary
        rows.append((d, "drift", " ".join(rng.choice(["q1", "q2"], 60))))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    from diive_spark.operators.textstats import source_kl_divergence

    got = source_kl_divergence(docs).toPandas().set_index("source")
    assert (got["kl"] >= -1e-12).all()
    assert got.loc["drift", "kl"] > got.loc["base", "kl"] + 1.0


# ----------------------------------------------------- zipf / novelty

def test_zipf_slope_matches_pandas_and_flags_degenerate(spark):
    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(200)]
    # zipfian source: word i with weight 1/(i+1); degenerate source:
    # one word dominates
    pz = 1.0 / np.arange(1, 201)
    pz /= pz.sum()
    rows = []
    for d in range(30):
        rows.append((d, "zipf", " ".join(rng.choice(vocab, 200, p=pz))))
    for d in range(30, 40):
        rows.append((d, "flat", " ".join(rng.choice(vocab[:50], 200))))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )
    from diive_spark.operators.textstats import zipf_slope

    got = zipf_slope(docs, max_rank=64).toPandas().set_index("source")
    # pandas twin
    pdf = docs.toPandas()
    for src in ["zipf", "flat"]:
        words = " ".join(pdf[pdf.source == src]["text"]).split()
        tf = pd.Series(words).value_counts()
        tf = tf.reset_index()
        tf.columns = ["w", "c"]
        tf = tf.sort_values(["c", "w"], ascending=[False, True]).head(64)
        x = np.log(np.arange(1, len(tf) + 1))
        y = np.log(tf["c"].to_numpy(dtype=float))
        p = len(x)
        slope = (p * (x * y).sum() - x.sum() * y.sum()) / (
            p * (x * x).sum() - x.sum() ** 2
        )
        assert abs(got.loc[src, "slope"] - slope) < 1e-9, src
    # zipfian text is much steeper than uniform text
    assert got.loc["zipf", "slope"] < got.loc["flat", "slope"] - 0.3


def test_ngram_novelty_hand_computed(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4],
             "text": [
                 "a b c d",          # trigrams: "a b c", "b c d" (new)
                 "a b c x",          # "a b c" old, "b c x" new -> 0.5
                 "a b c d",          # both old -> 0.0
                 "q r",              # too short -> 0 ngrams, null
             ]}
        )
    )
    from diive_spark.operators.textstats import ngram_novelty

    got = ngram_novelty(docs, n=3).toPandas().set_index("doc_id")
    assert got.loc[1, "n_ngrams"] == 2 and got.loc[1, "novelty"] == 1.0
    assert got.loc[2, "n_ngrams"] == 2 and got.loc[2, "novelty"] == 0.5
    assert got.loc[3, "n_ngrams"] == 2 and got.loc[3, "novelty"] == 0.0
    assert got.loc[4, "n_ngrams"] == 0 and pd.isna(got.loc[4, "novelty"])


def test_ngram_novelty_decays_on_redundant_corpus(spark):
    # every doc repeats the same passage plus a small unique tail: the
    # novelty curve must start at 1 and decay hard
    rows = []
    base = "the quick brown fox jumps over the lazy dog again and again"
    for d in range(20):
        rows.append((d, base + f" unique tail {d} here"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    from diive_spark.operators.textstats import ngram_novelty

    got = ngram_novelty(docs, n=3).toPandas().set_index("doc_id")
    assert got.loc[0, "novelty"] == 1.0
    assert (got.loc[5:, "novelty"] < 0.45).all()


# ------------------------------------------------- correlated pairs

def test_top_correlated_pairs_matches_pandas(spark):
    rng = np.random.default_rng(37)
    base = rng.normal(0, 1, 200)
    series = {
        "0": base + rng.normal(0, 0.1, 200),      # ~base
        "1": -base + rng.normal(0, 0.1, 200),     # anti-correlated
        "2": rng.normal(0, 1, 200),               # independent
        "3": base * 2 + 5 + rng.normal(0, 0.2, 200),
    }
    rows = []
    for d, v in series.items():
        rows += [("s", d, p, float(x)) for p, x in enumerate(v)]
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    from diive_spark.operators.spectral import top_correlated_pairs

    got = top_correlated_pairs(
        spark.createDataFrame(pdf), top_k=6, min_overlap=30
    ).toPandas()
    # pandas twin over all pairs
    import itertools

    want = []
    for a, b in itertools.combinations(sorted(series), 2):
        r = np.corrcoef(series[a], series[b])[0, 1]
        want.append((a, b, r))
    want.sort(key=lambda t: (-round(abs(t[2]), 6), t[0], t[1]))
    assert len(got) == 6
    for i, (a, b, r) in enumerate(want):
        assert got.loc[i, "doc_a"] == a and got.loc[i, "doc_b"] == b
        assert abs(got.loc[i, "r"] - r) < 1e-9
    # structure: the three base-linked pairs outrank the noise pairs
    top3 = set(map(tuple, got.loc[:2, ["doc_a", "doc_b"]].values))
    assert top3 == {("0", "1"), ("0", "3"), ("1", "3")}


def test_top_correlated_pairs_min_overlap_and_constant_guard(spark):
    rows = [("s", "0", p, float(p % 7)) for p in range(100)]
    rows += [("s", "1", p, 4.0) for p in range(100)]        # constant
    rows += [("s", "2", p, float(p % 7)) for p in range(10)]  # short
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    from diive_spark.operators.spectral import top_correlated_pairs

    got = top_correlated_pairs(
        spark.createDataFrame(pdf), top_k=5, min_overlap=30
    ).toPandas()
    # constant side -> null r dropped; short overlap dropped -> no rows
    assert len(got) == 0


# ---------------------------------------------------- sax_dtw_motifs

def _sax_word(v, seg_n, bps):
    sk = _zpaa(v, seg_n)
    if len(sk) < seg_n:
        return None, sk
    return "".join(chr(97 + int((p > np.asarray(bps)).sum())) for p in sk), sk


def test_sax_dtw_motifs_matches_reference(spark):
    # three shape families at different scales/offsets; SAX buckets by
    # shape (z-norm kills scale), then exact banded DTW within buckets
    from diive_spark.operators.analyses import SAX_BREAKPOINTS
    from diive_spark.operators.spectral import sax_dtw_motifs

    rng = np.random.default_rng(7)
    n, seg_n, alpha, radius = 96, 4, 4, 2
    t = np.arange(n)
    shapes = {
        "up": t * 1.0,
        "hat": np.minimum(t, n - 1 - t).astype(float),
        "sin": np.sin(2 * np.pi * t / n),
    }
    series, rows = {}, []
    d = 0
    for fam, base in shapes.items():
        for k in range(3):
            v = base * (1.0 + 3.0 * k) + 100.0 * k + rng.normal(0, 1e-3, n)
            series[str(d)] = v
            rows += [("s", str(d), p, float(x)) for p, x in enumerate(v)]
            d += 1
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    got = (
        sax_dtw_motifs(
            spark.createDataFrame(pdf), segments=seg_n, alphabet=alpha,
            radius=radius, max_bucket=32,
        )
        .toPandas()
        .sort_values(["sid_a", "sid_b"])
        .reset_index(drop=True)
    )
    bps = SAX_BREAKPOINTS[alpha]
    words, sketches = {}, {}
    for doc, v in series.items():
        w, sk = _sax_word(v, seg_n, bps)
        words[doc] = w
        sketches[doc] = sk
    buckets = {}
    for doc, w in words.items():
        buckets.setdefault(w, []).append(f"s|{doc}")
    want = {}
    for w, sids in buckets.items():
        if len(sids) < 2:
            continue
        sids = sorted(sids)
        for i in range(len(sids)):
            for j in range(i + 1, len(sids)):
                da, db = sids[i].split("|")[1], sids[j].split("|")[1]
                want[(sids[i], sids[j])] = (
                    w, len(sids),
                    _dtw_band_ref(sketches[da], sketches[db], radius),
                )
    assert len(got) == len(want) > 0
    for _, r in got.iterrows():
        w, nb, dist = want[(r["sid_a"], r["sid_b"])]
        assert r["word"] == w and r["n_series"] == nb
        assert r["pair_kind"] == "full"
        assert abs(r["dtw"] - dist) < 1e-9
    # same-family pairs must be near-zero, and every cross-family pair
    # (if bucketed together at this coarse word) strictly larger
    same = got[got.apply(
        lambda r: int(r["sid_a"].split("|")[1]) // 3
        == int(r["sid_b"].split("|")[1]) // 3, axis=1)]
    assert (same["dtw"] < 1e-2).all()


def test_sax_dtw_motifs_star_guard(spark):
    # one degenerate bucket (12 near-identical series) over max_bucket=5
    # degrades to 11 star rows against the min-sid anchor; a small
    # bucket stays full-pairs
    from diive_spark.operators.spectral import sax_dtw_motifs

    rng = np.random.default_rng(11)
    n = 64
    t = np.arange(n, dtype=float)
    rows = []
    for d in range(12):  # hot: all same up-ramp shape
        v = t + rng.normal(0, 1e-6, n)
        rows += [("hot", f"{d:02d}", p, float(x)) for p, x in enumerate(v)]
    for d in range(3):   # cold: hat shape
        v = np.minimum(t, n - 1 - t)
        rows += [("cold", f"{d:02d}", p, float(x)) for p, x in enumerate(v)]
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    got = sax_dtw_motifs(
        spark.createDataFrame(pdf), segments=4, alphabet=4, radius=2,
        max_bucket=5,
    ).toPandas()
    hot = got[got["sid_a"].str.startswith("hot")]
    cold = got[got["sid_a"].str.startswith("cold")]
    assert (hot["pair_kind"] == "star").all() and len(hot) == 11
    assert (hot["sid_a"] == "hot|00").all()          # min-sid anchor
    assert set(hot["sid_b"]) == {f"hot|{d:02d}" for d in range(1, 12)}
    assert (hot["dtw"] < 1e-3).all()
    assert (cold["pair_kind"] == "full").all() and len(cold) == 3


def test_sax_dtw_motifs_validation(spark):
    import pytest as _pt
    from diive_spark.operators.spectral import sax_dtw_motifs

    pdf = pd.DataFrame(
        [("s", "0", 0, 1.0)], columns=["source", "doc_id", "pos", "value"]
    )
    df = spark.createDataFrame(pdf)
    with _pt.raises(ValueError):
        sax_dtw_motifs(df, segments=1)
    with _pt.raises(ValueError):
        sax_dtw_motifs(df, radius=0)
    with _pt.raises(ValueError):
        sax_dtw_motifs(df, max_bucket=1)
    with _pt.raises(ValueError):
        sax_dtw_motifs(df, alphabet=9)


# ---------------------------------------------------- lomb_scargle_peak
def _lomb_np(t, y, max_k):
    """Definitional tau-corrected normalized Lomb-Scargle twin."""
    import numpy as np

    t = np.asarray(t, float)
    y = np.asarray(y, float)
    n = len(y)
    mu = y.sum() / n
    var = ((y - mu) ** 2).sum() / n
    span = t.max() - t.min() + 1.0
    best = None
    for k in range(1, max_k + 1):
        w = 2.0 * np.pi * k / span
        tau = np.arctan2(np.sin(2 * w * t).sum(), np.cos(2 * w * t).sum()) / (
            2 * w
        )
        c = np.cos(w * (t - tau))
        s = np.sin(w * (t - tau))
        cc, ss = (c * c).sum(), (s * s).sum()
        if cc <= 0 or ss <= 0:
            continue
        p = (((y - mu) * c).sum() ** 2 / cc + ((y - mu) * s).sum() ** 2 / ss) / (
            2 * var
        )
        if best is None or round(p, 6) > round(best[1], 6):
            best = (k, p)
    return best


def test_lomb_scargle_matches_numpy(spark, tiny_series, tiny_series_pd):
    from diive_spark.operators.spectral import lomb_scargle_peak

    got = (
        lomb_scargle_peak(tiny_series, max_k=12)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    pdf = tiny_series_pd.dropna(subset=["value"])
    n_checked = 0
    for _, row in got.iterrows():
        g = pdf[(pdf["source"] == row["source"]) & (pdf["doc_id"] == row["doc_id"])]
        if len(g) < 8 or g["value"].std() == 0:
            assert row["k_peak"] is None or np.isnan(row["k_peak"])
            continue
        k, p = _lomb_np(g["pos"].to_numpy(), g["value"].to_numpy(), 12)
        assert int(row["k_peak"]) == k, (row["source"], row["doc_id"])
        np.testing.assert_allclose(row["power"], p, rtol=1e-9)
        n_checked += 1
    assert n_checked >= 5


def test_lomb_scargle_finds_planted_freq_in_gappy_series(spark):
    """An irregularly-sampled sinusoid: 45% of samples removed in a
    deterministic non-uniform pattern.  Lomb-Scargle evaluates at the
    TRUE positions and must still nail the planted frequency."""
    from diive_spark.operators.spectral import lomb_scargle_peak

    n, k_true = 240, 6
    rows = []
    for i in range(n):
        if (i * 2654435761) % 100 < 45:  # deterministic 45% drop
            continue
        v = 10.0 * np.sin(2 * np.pi * k_true * i / n) + 0.01 * ((i * 7) % 13)
        rows.append(("s", "0", i, float(v)))
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    got = lomb_scargle_peak(df, max_k=12).collect()[0]
    assert got["k_peak"] == k_true
    assert got["power"] > 10  # strongly significant vs noise


def test_lomb_scargle_short_and_degenerate_null(spark):
    from diive_spark.operators.spectral import lomb_scargle_peak

    rows = [("a", "0", i, 1.0) for i in range(20)]  # zero variance
    rows += [("b", "0", i, float(i % 3)) for i in range(5)]  # n < 8
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = {(r["source"]): r for r in lomb_scargle_peak(df, max_k=4).collect()}
    assert out["a"]["k_peak"] is None and out["b"]["k_peak"] is None
    with pytest.raises(ValueError):
        lomb_scargle_peak(df, max_k=0)


# ------------------------------------------------------- allan_variance
def _allan_np(vals, tau):
    """Definitional non-overlapped AVAR twin; vals is the dense grid
    with NaN for missing."""
    import numpy as np

    v = np.asarray(vals, float)
    nb = len(v) // tau
    ms = []
    for b in range(nb):
        w = v[b * tau : (b + 1) * tau]
        ms.append(w.mean() if not np.isnan(w).any() else np.nan)
    d2 = [
        (ms[b + 1] - ms[b]) ** 2
        for b in range(nb - 1)
        if not (np.isnan(ms[b]) or np.isnan(ms[b + 1]))
    ]
    if not d2:
        return None
    return len(d2), 0.5 * sum(d2) / len(d2)


def test_allan_variance_matches_numpy(spark, tiny_series, tiny_series_pd):
    from diive_spark.operators.spectral import allan_variance

    got = (
        allan_variance(tiny_series, taus=(2, 4, 8))
        .orderBy("source", "doc_id", "tau")
        .toPandas()
    )
    assert len(got) > 0
    n_checked = 0
    for _, row in got.iterrows():
        g = tiny_series_pd[
            (tiny_series_pd["source"] == row["source"])
            & (tiny_series_pd["doc_id"] == row["doc_id"])
        ].sort_values("pos")
        grid = np.full(int(g["pos"].max()) + 1, np.nan)
        sub = g.dropna(subset=["value"])
        grid[sub["pos"].to_numpy()] = sub["value"].to_numpy()
        res = _allan_np(grid, int(row["tau"]))
        assert res is not None
        np_pairs, np_avar = res
        assert int(row["n_pairs"]) == np_pairs
        np.testing.assert_allclose(row["avar"], np_avar, rtol=1e-9)
        np.testing.assert_allclose(row["adev"], np.sqrt(np_avar), rtol=1e-9)
        n_checked += 1
    assert n_checked >= 10


def test_allan_variance_separates_noise_regimes(spark):
    """White noise: AVAR falls ~1/tau.  Random walk: AVAR grows with
    tau.  The log-log slope direction is the whole point of the
    statistic."""
    from diive_spark.operators.spectral import allan_variance

    rng = np.random.RandomState(7)
    wn = rng.randn(512)
    rw = np.cumsum(rng.randn(512))
    rows = [("wn", "0", i, float(wn[i])) for i in range(512)]
    rows += [("rw", "0", i, float(rw[i])) for i in range(512)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = allan_variance(df, taus=(2, 4, 8, 16, 32)).toPandas()
    wn_av = out[out["source"] == "wn"].sort_values("tau")["avar"].to_numpy()
    rw_av = out[out["source"] == "rw"].sort_values("tau")["avar"].to_numpy()
    assert wn_av[0] > wn_av[-1] * 4  # white noise decays
    assert rw_av[-1] > rw_av[0] * 4  # random walk grows


def test_allan_variance_gap_voids_bucket(spark):
    from diive_spark.operators.spectral import allan_variance

    # 8 points, null at pos 2 -> tau=2 buckets: [0,1] ok, [2,3] void,
    # [4,5] ok, [6,7] ok -> adjacent defined pairs: (2,3) only
    vals = [1.0, 3.0, None, 5.0, 2.0, 4.0, 6.0, 8.0]
    rows = [("a", "0", i, vals[i]) for i in range(8)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = allan_variance(df, taus=(2,)).collect()
    assert len(out) == 1
    r = out[0]
    # bucket means: 2.0, nan, 3.0, 7.0 -> one defined adjacent pair (3,7)
    assert r["n_pairs"] == 1
    np.testing.assert_allclose(r["avar"], 0.5 * (7.0 - 3.0) ** 2)
    with pytest.raises(ValueError):
        allan_variance(df, taus=(1,))


def test_lomb_allan_plan_single_exchange(spark, tiny_series):
    from diive_spark.operators.spectral import allan_variance, lomb_scargle_peak

    for op in (
        lomb_scargle_peak(tiny_series, max_k=4),
        allan_variance(tiny_series, taus=(2, 4)),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------- granger_lag1
def _granger_np(y, x):
    """Definitional lag-1 Granger twin via numpy lstsq."""
    import numpy as np

    yt, y1, x1 = [], [], []
    for t in range(1, len(y)):
        if not (np.isnan(y[t]) or np.isnan(y[t - 1]) or np.isnan(x[t - 1])):
            yt.append(y[t]); y1.append(y[t - 1]); x1.append(x[t - 1])
    yt, y1, x1 = map(np.asarray, (yt, y1, x1))
    n = len(yt)
    if n < 4:
        return n, None, None
    Ar = np.column_stack([np.ones(n), y1])
    Au = np.column_stack([np.ones(n), y1, x1])
    rr = yt - Ar @ np.linalg.lstsq(Ar, yt, rcond=None)[0]
    ru = yt - Au @ np.linalg.lstsq(Au, yt, rcond=None)[0]
    rss_r, rss_u = (rr ** 2).sum(), (ru ** 2).sum()
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    return n, f, (rss_r - rss_u) / rss_r


def _granger_frame(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    n = 200
    x = rng.randn(n).cumsum() * 0.2 + rng.randn(n)
    y = np.empty(n)
    y[0] = 0.0
    for t in range(1, n):  # y is driven by x at lag 1
        y[t] = 0.4 * y[t - 1] + 0.8 * x[t - 1] + 0.3 * rng.randn()
    z = rng.randn(n)  # independent
    rows = []
    for i in range(n):
        rows += [("s", "x", i, float(x[i])), ("s", "y", i, float(y[i])),
                 ("s", "z", i, float(z[i]))]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    return df, x, y, z


def test_granger_matches_numpy_and_finds_direction(spark):
    from diive_spark.operators.spectral import granger_lag1

    df, x, y, z = _granger_frame(spark)
    pairs = spark.createDataFrame(
        [("s", "x", "y"), ("s", "y", "z")],
        "source string, doc_a string, doc_b string",
    )
    got = {
        (r["doc_cause"], r["doc_effect"]): r
        for r in granger_lag1(df, pairs, min_overlap=30).collect()
    }
    assert len(got) == 4
    series = {"x": x, "y": y, "z": z}
    for (c, e), r in got.items():
        n, f, gain = _granger_np(series[e], series[c])
        assert r["n"] == n
        np.testing.assert_allclose(r["f_stat"], f, rtol=1e-7)
        np.testing.assert_allclose(r["r2_gain"], gain, rtol=1e-7)
    # direction: x->y must dominate y->x; independent z uninformative
    assert got[("x", "y")]["f_stat"] > 100
    assert got[("x", "y")]["f_stat"] > 10 * got[("y", "x")]["f_stat"]
    assert got[("y", "z")]["f_stat"] < 10


def test_granger_null_breaks_lag_chain(spark):
    """A null reading voids rows that need it, it does not shift the
    alignment."""
    from diive_spark.operators.spectral import granger_lag1

    vals_y = [1.0, 2.0, None, 4.0, 9.0, 3.0, 7.0, 5.0]
    vals_x = [2.0, 1.0, 3.0, 2.0, 4.0, 3.0, 5.0, 4.0]
    rows = [("s", "y", i, vals_y[i]) for i in range(8)]
    rows += [("s", "x", i, vals_x[i]) for i in range(8)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    pairs = spark.createDataFrame(
        [("s", "x", "y")], "source string, doc_a string, doc_b string"
    )
    out = {
        (r["doc_cause"], r["doc_effect"]): r
        for r in granger_lag1(df, pairs, min_overlap=4).collect()
    }
    # y_t usable at t in {1,4,5,6,7} minus t in {2,3} (y null at 2):
    # t=1 (y1=1), t=4..7 -> n=5
    assert out[("x", "y")]["n"] == 5
    np_n, np_f, _ = _granger_np(
        np.array([v if v is not None else np.nan for v in vals_y]),
        np.array(vals_x, dtype=float),
    )
    assert np_n == 5
    np.testing.assert_allclose(out[("x", "y")]["f_stat"], np_f, rtol=1e-7)


def test_granger_degenerate_and_validation(spark):
    from diive_spark.operators.spectral import granger_lag1

    # constant cause series -> c22 = 0 -> null stats
    rows = [("s", "y", i, float(i % 5)) for i in range(40)]
    rows += [("s", "c", i, 3.0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    pairs = spark.createDataFrame(
        [("s", "c", "y")], "source string, doc_a string, doc_b string"
    )
    out = {
        (r["doc_cause"], r["doc_effect"]): r
        for r in granger_lag1(df, pairs, min_overlap=4).collect()
    }
    assert out[("c", "y")]["f_stat"] is None
    with pytest.raises(ValueError):
        granger_lag1(df, pairs, min_overlap=3)


def test_granger_plan_broadcasts_pairs_no_cartesian(spark):
    from diive_spark.operators.spectral import granger_lag1

    df, *_ = _granger_frame(spark)
    pairs = spark.createDataFrame(
        [("s", "x", "y")], "source string, doc_a string, doc_b string"
    )
    plan = (
        granger_lag1(df, pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# -------------------------------------------------------- croston_forecast
def _croston_np(vals, alpha):
    z = p = None
    q = 0.0
    k = 0
    for x in vals:
        q += 1.0
        if x is None or (isinstance(x, float) and np.isnan(x)):
            continue
        if k == 0:
            z, p = x, q
        else:
            z = z + alpha * (x - z)
            p = p + alpha * (q - p)
        k += 1
        q = 0.0
    fc = z / p if (p or 0) > 0 else None
    return k, z, p, fc


def test_croston_matches_python_twin(spark, tiny_series, tiny_series_pd):
    from diive_spark.operators.forecast import croston_forecast

    got = (
        croston_forecast(tiny_series, alpha=0.1)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    assert len(got) > 0
    n_checked = 0
    for _, row in got.iterrows():
        g = tiny_series_pd[
            (tiny_series_pd["source"] == row["source"])
            & (tiny_series_pd["doc_id"] == row["doc_id"])
        ].sort_values("pos")
        vals = [None if pd.isna(v) else float(v) for v in g["value"]]
        k, z, p, fc = _croston_np(vals, 0.1)
        assert int(row["n_demands"]) == k
        np.testing.assert_allclose(row["z"], z, rtol=0, atol=0)
        np.testing.assert_allclose(row["p"], p, rtol=0, atol=0)
        np.testing.assert_allclose(row["forecast"], fc, rtol=0, atol=0)
        np.testing.assert_allclose(
            row["forecast_sba"], 0.95 * fc, rtol=0, atol=0
        )
        n_checked += 1
    assert n_checked >= 10


def test_croston_hand_case_and_edges(spark):
    from diive_spark.operators.forecast import croston_forecast

    # demands 4 at step 2, 6 after interval 3, 5 after interval 1
    vals = [None, 4.0, None, None, 6.0, 5.0]
    rows = [("s", "0", i, vals[i]) for i in range(6)]
    rows += [("e", "0", i, None) for i in range(4)]  # no demand at all
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = {r["source"]: r for r in croston_forecast(df, alpha=0.2).collect()}
    r = out["s"]
    z = 4.0
    z = z + 0.2 * (6.0 - z)   # 4.4
    z = z + 0.2 * (5.0 - z)   # 4.52
    p = 2.0
    p = p + 0.2 * (3.0 - p)   # 2.2
    p = p + 0.2 * (1.0 - p)   # 1.96
    assert r["n_demands"] == 3
    np.testing.assert_allclose(r["z"], z)
    np.testing.assert_allclose(r["p"], p)
    np.testing.assert_allclose(r["forecast"], z / p)
    e = out["e"]
    assert e["n_demands"] == 0 and e["forecast"] is None
    with pytest.raises(ValueError):
        croston_forecast(df, alpha=0.0)
    with pytest.raises(ValueError):
        croston_forecast(df, alpha=1.0)


# ---------------------------------------------------------- page_hinkley
def _ph_np(pairs, delta, lam):
    cnt = s = m = mm = 0.0
    alarms, first = 0, None
    for pos, x in pairs:
        cnt += 1.0
        s += x
        # left-assoc like the Spark fold: ((m + x) - s/cnt) - delta
        m = m + x - s / cnt - delta
        mm = min(mm, m)
        if m - mm > lam:
            alarms += 1
            if first is None:
                first = pos
            cnt = s = m = mm = 0.0
    return alarms, first, m - mm


def test_page_hinkley_matches_python_twin(spark, tiny_series, tiny_series_pd):
    from diive_spark.operators.outliers import page_hinkley

    got = (
        page_hinkley(tiny_series, delta=0.005, lam=30.0)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    assert len(got) > 0
    n_checked = 0
    for _, row in got.iterrows():
        g = (
            tiny_series_pd[
                (tiny_series_pd["source"] == row["source"])
                & (tiny_series_pd["doc_id"] == row["doc_id"])
            ]
            .dropna(subset=["value"])
            .sort_values("pos")
        )
        alarms, first, stat = _ph_np(
            list(zip(g["pos"], g["value"].astype(float))), 0.005, 30.0
        )
        assert int(row["n_alarms"]) == alarms
        assert (row["first_alarm"] is None and first is None) or int(
            row["first_alarm"]
        ) == first
        np.testing.assert_allclose(row["ph_stat"], stat, rtol=0, atol=0)
        n_checked += 1
    assert n_checked >= 10


def test_page_hinkley_detects_planted_shift(spark):
    from diive_spark.operators.outliers import page_hinkley

    rng = np.random.RandomState(3)
    base = rng.randn(300)
    shifted = base.copy()
    shifted[150:] += 3.0  # strong upward shift at pos 150
    rows = [("flat", "0", i, float(base[i])) for i in range(300)]
    rows += [("drift", "0", i, float(shifted[i])) for i in range(300)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = {r["source"]: r for r in page_hinkley(df, delta=0.1, lam=35.0).collect()}
    assert out["flat"]["n_alarms"] == 0
    assert out["drift"]["n_alarms"] >= 1
    assert 150 <= out["drift"]["first_alarm"] <= 200
    with pytest.raises(ValueError):
        page_hinkley(df, delta=-1)
    with pytest.raises(ValueError):
        page_hinkley(df, lam=0)


# ------------------------------------------------- permutation_entropy
def _pe_np(vals):
    """Definitional Bandt-Pompe order-3 twin (stable argsort ranks)."""
    pats = {}
    n = 0
    for t in range(len(vals) - 2):
        w = vals[t : t + 3]
        if any(v is None or (isinstance(v, float) and np.isnan(v)) for v in w):
            continue
        ranks = []
        for i, x in enumerate(w):
            r = sum(
                1 for j, y in enumerate(w)
                if y < x or (y == x and j < i)
            )
            ranks.append(r)
        pats[tuple(ranks)] = pats.get(tuple(ranks), 0) + 1
        n += 1
    if n == 0:
        return None
    h = math.log(n) - sum(c * math.log(c) for c in pats.values()) / n
    return n, len(pats), h / math.log(6.0)


def test_permutation_entropy_matches_python_twin(
    spark, tiny_series, tiny_series_pd
):
    from diive_spark.operators.spectral import permutation_entropy

    got = (
        permutation_entropy(tiny_series)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    assert len(got) > 0
    n_checked = 0
    for _, row in got.iterrows():
        g = tiny_series_pd[
            (tiny_series_pd["source"] == row["source"])
            & (tiny_series_pd["doc_id"] == row["doc_id"])
        ].sort_values("pos")
        res = _pe_np([None if pd.isna(v) else float(v) for v in g["value"]])
        assert res is not None
        nw, np_, pe = res
        assert int(row["n_windows"]) == nw
        assert int(row["n_patterns"]) == np_
        np.testing.assert_allclose(row["pe"], pe, rtol=1e-12)
        n_checked += 1
    assert n_checked >= 10


def test_permutation_entropy_separates_regimes_and_ties(spark):
    from diive_spark.operators.spectral import permutation_entropy

    rng = np.random.RandomState(5)
    rows = [("mono", "0", i, float(i)) for i in range(100)]  # 1 pattern
    rows += [("wn", "0", i, float(rng.randn())) for i in range(400)]
    rows += [("tie", "0", i, float([1, 1, 2][i % 3])) for i in range(60)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    out = {r["source"]: r for r in permutation_entropy(df).collect()}
    assert out["mono"]["n_patterns"] == 1 and out["mono"]["pe"] == 0.0
    assert out["wn"]["pe"] > 0.95 and out["wn"]["n_patterns"] == 6
    # ties: patterns of (1,1,2),(1,2,1),(2,1,1) under the stable rule
    res = _pe_np([float([1, 1, 2][i % 3]) for i in range(60)])
    assert out["tie"]["n_patterns"] == res[1]
    np.testing.assert_allclose(out["tie"]["pe"], res[2], rtol=1e-12)


def test_permutation_entropy_gap_voids_window(spark):
    from diive_spark.operators.spectral import permutation_entropy

    # null at pos 3 voids windows starting at 1,2,3
    vals = [1.0, 5.0, 2.0, None, 4.0, 3.0, 6.0]
    rows = [("a", "0", i, vals[i]) for i in range(7)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    r = permutation_entropy(df).collect()[0]
    exp = _pe_np(vals)
    # valid starts: 0 (1,5,2) and 4 (4,3,6) -> twin agrees
    assert exp[0] == 2
    assert r["n_windows"] == 2
    assert r["n_patterns"] == exp[1]
    np.testing.assert_allclose(r["pe"], exp[2], rtol=1e-12)


# --------------------------------------------------- spearman variant
def test_spearman_pairs_matches_scipy_free_twin(spark):
    """Rank-transform correlation == pandas' spearman when series
    share the full axis (no nulls), including ties."""
    from diive_spark.operators.spectral import top_correlated_pairs

    rng = np.random.RandomState(21)
    n = 120
    base = rng.randn(n)
    series_map = {
        "0": base,
        "1": np.exp(base * 2),            # monotone warp: rho == 1
        "2": -base + 0.01 * rng.randn(n), # near-perfect negative
        "3": np.round(rng.randn(n), 0),   # heavy ties
        "4": rng.randn(n),                # independent
    }
    rows = []
    for d, v in series_map.items():
        rows += [("s", d, i, float(v[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    got = top_correlated_pairs(
        df, top_k=10, min_overlap=30, method="spearman"
    ).toPandas()
    pdf = pd.DataFrame(series_map)
    exp = pdf.corr(method="spearman")
    for _, r in got.iterrows():
        np.testing.assert_allclose(
            r["r"], exp.loc[r["doc_a"], r["doc_b"]], atol=1e-12
        )
    # the monotone warp must rank at rho == 1 exactly
    top = got[got["rank"] == 1].iloc[0]
    assert {top["doc_a"], top["doc_b"]} == {"0", "1"}
    np.testing.assert_allclose(top["r"], 1.0)


def test_spearman_robust_where_pearson_is_not(spark):
    from diive_spark.operators.spectral import top_correlated_pairs

    rng = np.random.RandomState(8)
    n = 100
    a = rng.randn(n)
    b = a.copy()
    b[0] = 1000.0  # one gross outlier
    a2 = a.copy()
    a2[0] = -1000.0
    rows = [("s", "0", i, float(a2[i])) for i in range(n)]
    rows += [("s", "1", i, float(b[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    pe = top_correlated_pairs(df, method="pearson").collect()[0]["r"]
    sp = top_correlated_pairs(df, method="spearman").collect()[0]["r"]
    assert pe < 0.3      # the outlier pair destroys Pearson
    assert sp > 0.9      # ranks shrug it off
    with pytest.raises(ValueError):
        top_correlated_pairs(df, method="kendall")
