"""Analyses battery vs pandas/numpy oracles (reference semantics)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.functions.circular import circular_agg
from diive_spark.operators.analyses import (
    bucket_correlation,
    diel_cycle,
    histogram,
    peak_bins,
    percentile_ladder,
    rolling_variants,
    sstats,
)
from diive_spark.operators.corrections import decode_bitfield, setto_threshold

from .conftest import seeded_series


def test_sstats_matches_pandas(spark):
    pdf = seeded_series(n=400, gap_frac=0.1)
    got = sstats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    s = pdf["value"]
    assert got["nov"] == s.count()
    assert got["missing"] == s.isnull().sum()
    assert abs(got["mean"] - s.mean()) < 1e-9
    assert abs(got["sd"] - s.std()) < 1e-9            # ddof=1
    assert abs(got["var"] - s.var()) < 1e-9
    assert abs(got["median"] - s.quantile(0.5)) < 1e-9
    for q, col in [(0.01, "p01"), (0.05, "p05"), (0.25, "p25"),
                   (0.75, "p75"), (0.95, "p95"), (0.99, "p99")]:
        assert abs(got[col] - s.quantile(q)) < 1e-9, q


def test_percentile_ladder(spark):
    pdf = seeded_series(n=300, gap_frac=0.0)
    got = (
        percentile_ladder(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("percentile")
        .reset_index(drop=True)
    )
    assert len(got) == 101
    for i in (0, 13, 50, 77, 100):
        assert abs(got.loc[i, "value"] - pdf["value"].quantile(i / 100)) < 1e-9


def test_histogram_matches_numpy(spark):
    pdf = seeded_series(n=500, gap_frac=0.05)
    got = (
        histogram(spark.createDataFrame(pdf), n_bins=12)
        .toPandas()
        .sort_values("bin_idx")
    )
    counts, edges = np.histogram(pdf["value"].dropna(), bins=12)
    got_counts = np.zeros(12, dtype=int)
    got_counts[got["bin_idx"].astype(int)] = got["count"]
    np.testing.assert_array_equal(got_counts, counts)
    top = peak_bins(histogram(spark.createDataFrame(pdf), n_bins=12), k=5).toPandas()
    assert len(top) == 5
    assert set(top["count"]) <= set(counts)


def test_bucket_correlation_matches_pandas(spark):
    rng = np.random.default_rng(3)
    n = 600
    a = rng.normal(0, 1, n)
    b = 0.5 * a + rng.normal(0, 1, n)
    pdf = pd.DataFrame({"pos": np.arange(n), "a": a, "b": b})
    got = (
        bucket_correlation(spark.createDataFrame(pdf), "a", "b", bucket=100)
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        seg = pdf[(pdf["pos"] // 100) == row["bucket"]]
        assert abs(row["r"] - seg["a"].corr(seg["b"])) < 1e-9


def test_rolling_matches_pandas_min_periods(spark):
    pdf = seeded_series(n=200, gap_frac=0.15)
    win = 10
    got = (
        rolling_variants(spark.createDataFrame(pdf), win=win, aggs=("mean", "max"))
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    exp_mean = pdf["value"].rolling(win, min_periods=math.ceil(win / 2)).mean()
    exp_max = pdf["value"].rolling(win, min_periods=math.ceil(win / 2)).max()
    np.testing.assert_allclose(
        got[f"value_rollmean{win}"].values, exp_mean.values, atol=1e-9, equal_nan=True
    )
    np.testing.assert_allclose(
        got[f"value_rollmax{win}"].values, exp_max.values, atol=1e-9, equal_nan=True
    )


def test_diel_cycle_phase_count(spark):
    pdf = seeded_series(n=480, gap_frac=0.0)
    got = diel_cycle(spark.createDataFrame(pdf), period=48).toPandas()
    assert len(got) == 48
    assert (got["n"] == 10).all()


def test_circular_agg_kanda(spark):
    # angles clustered around 350/10 degrees: arithmetic mean is ~180 (wrong),
    # circular mean must be ~0/360
    angles = [350.0, 355.0, 5.0, 10.0]
    df = spark.createDataFrame([(a,) for a in angles], "wd double")
    got = df.agg(circular_agg("wd", "mean")).first()[0]
    ph = np.radians(np.array(angles))
    exp = np.degrees(np.arctan2(np.sin(ph).mean(), np.cos(ph).mean())) % 360
    assert abs(got - exp) < 1e-9


def test_setto_threshold_and_bitfield(spark):
    pdf = seeded_series(n=100, gap_frac=0.0)
    sdf = spark.createDataFrame(pdf)
    clamped = setto_threshold(sdf, threshold=55.0, mode="above", flag_col="flag_thr")
    row = clamped.agg(F.max("value").alias("m"),
                      F.sum(F.when(F.col("flag_thr") == 1, 1).otherwise(0)).alias("nf")).first()
    assert row["m"] <= 55.0
    assert row["nf"] == (pdf["value"] > 55.0).sum()

    bits = spark.createDataFrame([(0b1011010,)], "x int")
    out = decode_bitfield(bits, "x", 1, 4, gain=0.5).first()
    assert out["decoded"] == ((0b1011010 >> 1) & 0b111) * 0.5


def test_aggregated_as_hires_and_random_gaps(spark):
    from diive_spark.operators.resample import aggregated_as_hires, create_random_gaps

    pdf = seeded_series(n=200, gap_frac=0.0)
    out = (
        aggregated_as_hires(spark.createDataFrame(pdf), bucket=50, agg="mean")
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    for b in range(4):
        seg = pdf[(pdf["pos"] // 50) == b]["value"]
        np.testing.assert_allclose(
            out.loc[out["pos"] // 50 == b, "value_mean50"], seg.mean(), atol=1e-9
        )
    # offset variant shifts bucket boundaries
    off = aggregated_as_hires(spark.createDataFrame(pdf), bucket=50, agg="mean",
                              offset=7).toPandas()
    seg = pdf[(pdf["pos"] >= 7) & (pdf["pos"] < 57)]["value"]
    assert abs(off.loc[off["pos"] == 10, "value_mean50"].iloc[0] - seg.mean()) < 1e-9

    gapped = create_random_gaps(spark.createDataFrame(pdf), frac=0.3, seed=1)
    n_null = gapped.where(F.col("value").isNull()).count()
    assert 30 < n_null < 90


def test_neighbor_pool_and_heatmap(spark):
    from diive_spark.operators.analyses import heatmap_pivot, neighboring_partition_pool

    pdf = seeded_series(n=120, gap_frac=0.0)
    pdf["year"] = pdf["pos"] // 40  # 3 "years"
    pooled = neighboring_partition_pool(spark.createDataFrame(pdf), "year")
    counts = {r["pool"]: r["n"] for r in
              pooled.groupBy("pool").agg(F.count("*").alias("n")).collect()}
    assert counts[1] == 120  # center year pools all three
    assert counts[0] == 80 and counts[2] == 80

    pdf["phase"] = pdf["pos"] % 4
    hm = heatmap_pivot(spark.createDataFrame(pdf), "year", "phase", "value", "count")
    assert hm.count() == 3
    assert len(hm.columns) == 5  # year + 4 phase columns


def test_rolling_correlation_matches_pandas(spark):
    """rolling(30).corr() parity incl. null-pair exclusion and the
    min_periods gate."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import rolling_correlation

    rng = np.random.default_rng(3)
    n = 400
    pdf = pd.DataFrame({
        "source": "s", "doc_id": "d", "pos": range(n),
        "a": rng.normal(0, 1, n), "b": rng.normal(0, 1, n),
    })
    pdf.loc[rng.choice(n, 40, replace=False), "a"] = np.nan
    got = (
        rolling_correlation(
            spark.createDataFrame(pdf), "a", "b", window=30, min_periods=15
        )
        .orderBy("pos").toPandas()["roll_corr"]
    )
    # pandas pairwise: mask b where a is null so both series drop pairs
    mb = pdf["b"].where(pdf["a"].notna())
    exp = pdf["a"].rolling(30, min_periods=15).corr(mb)
    both = got.notna().to_numpy() & exp.notna().to_numpy()
    assert (got.notna().to_numpy() == exp.notna().to_numpy()).all()
    assert np.allclose(got[both], exp[both], atol=1e-9)


def test_timezone_and_axis_range_helpers(spark):
    """add_timezone (times.py:1045-1058) and build_axis_range
    (times.py:498-510) — the two §2.2 helpers previously untested."""
    import datetime as dt

    from diive_spark.operators.timegrid import add_timezone, build_axis_range

    df = spark.createDataFrame(
        [(dt.datetime(2024, 6, 1, 12, 0, 0),)], "ts timestamp"
    )
    # noon CET summer wall time == 10:00 UTC
    utc = add_timezone(df, "ts", tz="Europe/Zurich", out_col="ts_utc").first()
    assert utc["ts_utc"].hour == 10

    axis = build_axis_range(df, start=100, n=5, step=30)
    assert [r["pos"] for r in axis.collect()] == [100, 130, 160, 190, 220]


def test_counter_agg_heals_resets(spark):
    """counter_agg vs a pandas twin on a wrap-around counter: per-bin
    increment sums, reset counts, first/last; bins tile the series
    total exactly."""
    import numpy as np
    import pyspark.sql.functions as F

    from diive_spark.operators.analyses import counter_agg

    rng = np.random.default_rng(3)
    steps = rng.integers(0, 9, 3000)
    ctr = np.cumsum(steps) % 500                 # wraps ~ every 125 rows
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(3000), "ctr": ctr})
    out = (
        counter_agg(spark.createDataFrame(pdf), every=600,
                    value_col="ctr", key_cols=["source", "doc_id"])
        .orderBy("bin_start").toPandas()
    )
    p = pdf.copy()
    p["prev"] = p.ctr.shift()
    d = p.ctr - p.prev
    p["inc"] = np.where(p.prev.isna(), 0, np.where(d < 0, p.ctr, d))
    p["rst"] = ((~p.prev.isna()) & (d < 0)).astype(int)
    p["bin"] = (p.pos // 600) * 600
    exp = p.groupby("bin").agg(cd=("inc", "sum"), nr=("rst", "sum"),
                               first=("ctr", "first"), last=("ctr", "last"))
    assert (out.set_index("bin_start").counter_delta == exp.cd).all()
    assert (out.set_index("bin_start").n_resets == exp.nr).all()
    assert (out.set_index("bin_start")["first"] == exp["first"]).all()
    assert (out.set_index("bin_start")["last"] == exp["last"]).all()
    # bins tile the whole-series counter_agg exactly (same healing
    # convention: a reset credits the post-reset reading, so the
    # pre-wrap remainder is not invented — Timescale counter_agg
    # semantics)
    whole = counter_agg(spark.createDataFrame(pdf), every=10**9,
                        value_col="ctr",
                        key_cols=["source", "doc_id"]).toPandas()
    assert (out.counter_delta.sum() == whole.counter_delta.sum()
            == p.inc.sum())


def test_ltob_keeps_extremes(spark):
    """LTOB picks exactly one point per bucket, matches a pandas twin,
    and keeps a planted spike that a mean-rollup would smear."""
    import numpy as np
    import pyspark.sql.functions as F

    from diive_spark.operators.analyses import ltob_downsample

    rng = np.random.default_rng(5)
    n = 2000
    v = rng.normal(0, 0.1, n)
    v[rng.choice(n, 100, replace=False)] = np.nan
    v[776:779] = [0.0, 40.0, 0.0]                 # the spike (kept non-NaN)
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    df = spark.createDataFrame(pdf).withColumn(
        "value", F.nanvl(F.col("value"), F.lit(None))
    )
    out = ltob_downsample(df, every=100,
                          key_cols=["source", "doc_id"]).toPandas()
    assert out.groupby("bin_start").size().eq(1).all()
    assert (out.bin_start == 700).sum() == 1
    assert out.set_index("bin_start").loc[700, "pos"] == 777   # spike kept

    g = pdf.dropna(subset=["value"]).reset_index(drop=True)
    x = g.pos.to_numpy(dtype=float); y = g.value.to_numpy()
    xp, yp = np.roll(x, 1), np.roll(y, 1)
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    area = np.abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) / 2
    area[0] = area[-1] = -1.0
    t = pd.DataFrame({"b": (x // 100).astype(int) * 100,
                      "pos": g.pos, "area": area})
    pick = (t.sort_values(["b", "area", "pos"],
                          ascending=[True, False, True])
            .groupby("b").first()["pos"])
    assert (out.set_index("bin_start")["pos"].sort_index()
            == pick.sort_index()).all()


def test_time_weighted_avg_matches_pandas(spark):
    """locf + linear TWA on an irregular series vs a pandas trapezoid/
    step twin; bin integrals tile the whole-series integral; quantized
    mode within 1/scale per segment of the float path."""
    import numpy as np

    from diive_spark.operators.analyses import time_weighted_avg

    rng = np.random.default_rng(9)
    # irregular sampling: sorted unique positions
    pos = np.sort(rng.choice(20000, 900, replace=False))
    val = rng.normal(50, 10, 900)
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": pos, "value": val})
    df = spark.createDataFrame(pdf)

    for method in ("locf", "linear"):
        out = time_weighted_avg(df, every=5000, method=method,
                                key_cols=["source", "doc_id"]
                                ).orderBy("bin_start").toPandas()
        x = pos.astype(float)
        dt = np.diff(x)
        segv = val[:-1] if method == "locf" else (val[:-1] + val[1:]) / 2
        area = segv * dt
        b = (pos[:-1] // 5000) * 5000
        exp = pd.DataFrame({"b": b, "area": area, "dt": dt}).groupby("b").sum()
        got = out.set_index("bin_start")
        assert np.allclose(got.integral, exp.area)
        assert np.allclose(got.duration, exp.dt)
        assert np.allclose(got.twa, exp.area / exp.dt)
        # tiling: bin partials sum to the whole-series integral
        assert np.isclose(got.integral.sum(), area.sum())
        assert np.isclose(got.duration.sum(), x[-1] - x[0])

    q = time_weighted_avg(df, every=5000, method="linear",
                          quantized=1e6, key_cols=["source", "doc_id"]
                          ).orderBy("bin_start").toPandas()
    f = time_weighted_avg(df, every=5000, method="linear",
                          key_cols=["source", "doc_id"]
                          ).orderBy("bin_start").toPandas()
    n_seg = pd.Series((pos[:-1] // 5000) * 5000).value_counts()
    tol = (n_seg.sort_index() + 1) / 1e6
    assert (abs(q.integral.to_numpy() - f.integral.to_numpy())
            <= tol.to_numpy()).all()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        time_weighted_avg(df, every=5000, method="cubic")


def test_state_agg_durations_tile(spark):
    """state_agg vs a pandas twin: per-(bin, state) held durations,
    entries; durations across states+bins tile the series span."""
    import numpy as np

    from diive_spark.operators.analyses import state_agg

    rng = np.random.default_rng(12)
    pos = np.sort(rng.choice(8000, 500, replace=False))
    states = rng.choice(["a", "b", "c"], 500)
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": pos, "state": states})
    out = state_agg(spark.createDataFrame(pdf), every=2000,
                    key_cols=["source", "doc_id"]).toPandas()
    p = pdf.copy()
    p["dt"] = p.pos.shift(-1) - p.pos
    p["entered"] = (p.state != p.state.shift()).astype(int)
    p = p.dropna(subset=["dt"])
    p["bin"] = (p.pos // 2000) * 2000
    exp = (p.groupby(["bin", "state"])
           .agg(n=("dt", "size"), dur=("dt", "sum"), ent=("entered", "sum")))
    got = out.set_index(["bin_start", "state"]).sort_index()
    exp = exp.sort_index()
    assert len(got) == len(exp)
    assert (got.n_segments.to_numpy() == exp.n.to_numpy()).all()
    assert (got.duration.to_numpy() == exp.dur.to_numpy()).all()
    assert (got.n_enter.to_numpy() == exp.ent.to_numpy()).all()
    assert got.duration.sum() == pos[-1] - pos[0]        # tiling


def test_heartbeat_agg_uptime(spark):
    """heartbeat_agg vs a pandas twin: per-bin uptime is
    min(gap, alive_window) summed; uptime+downtime tile the span."""
    import numpy as np

    from diive_spark.operators.analyses import heartbeat_agg

    rng = np.random.default_rng(21)
    pos = np.sort(rng.choice(10000, 300, replace=False))
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": pos})
    out = heartbeat_agg(spark.createDataFrame(pdf), every=2500,
                        alive_window=40.0,
                        key_cols=["source", "doc_id"]).toPandas()
    dt = np.diff(pos).astype(float)
    up = np.minimum(dt, 40.0)
    b = (pos[:-1] // 2500) * 2500
    exp = pd.DataFrame({"b": b, "up": up, "down": dt - up,
                        "gap": (dt > 40.0).astype(int)}).groupby("b").sum()
    got = out.set_index("bin_start").sort_index()
    assert np.allclose(got.uptime, exp.up)
    assert np.allclose(got.downtime, exp.down)
    assert (got.n_gaps.to_numpy() == exp.gap.to_numpy()).all()
    assert np.isclose((got.uptime + got.downtime).sum(), pos[-1] - pos[0])
    assert ((got.live_frac > 0) & (got.live_frac <= 1)).all()


def test_bin_entropy_detects_degeneration(spark):
    """bin_entropy vs scipy-free numpy twin; a degenerate (looping)
    bin scores near-zero entropy and high top_share while a diverse
    bin scores high entropy."""
    import numpy as np

    from diive_spark.operators.analyses import bin_entropy

    rng = np.random.default_rng(17)
    diverse = rng.integers(0, 500, 1000)         # bin 0: healthy stream
    looping = np.tile([7, 7, 7, 9], 250)         # bin 1: degenerated
    pdf = pd.DataFrame({
        "source": "s", "doc_id": "d", "pos": np.arange(2000),
        "value": np.concatenate([diverse, looping]).astype(float),
    })
    out = (
        bin_entropy(spark.createDataFrame(pdf), every=1000,
                    key_cols=["source", "doc_id"])
        .orderBy("bin_start").toPandas()
    )

    def np_entropy(v):
        c = np.unique(v, return_counts=True)[1].astype(float)
        n = c.sum()
        return np.log(n) - (c * np.log(c)).sum() / n

    assert np.isclose(out.entropy[0], np_entropy(diverse))
    assert np.isclose(out.entropy[1], np_entropy(looping))
    assert out.entropy[0] > 5 * out.entropy[1]
    assert out.top_share[1] == 0.75
    assert out.n_distinct[1] == 2


def test_candle_agg_composes_losslessly(spark):
    """candle_agg vs a pandas OHLC twin; compose_candles(1m -> 1h)
    equals a direct 1h candle_agg bit-for-bit (picked readings, not
    sums — composition is exact)."""
    from diive_spark.operators.analyses import candle_agg, compose_candles

    rng = np.random.default_rng(11)
    n = 4000
    v = rng.normal(50, 10, n)
    v[rng.choice(n, 300, replace=False)] = np.nan
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    df = spark.createDataFrame(pdf).withColumn(
        "value", F.nanvl(F.col("value"), F.lit(None))
    )
    keys = ["source", "doc_id"]
    direct = (
        candle_agg(df, every=1200, key_cols=keys)
        .orderBy("bin_start").toPandas()
    )
    composed = (
        compose_candles(candle_agg(df, every=100, key_cols=keys),
                        every=1200, key_cols=keys)
        .orderBy("bin_start").toPandas()
    )
    pd.testing.assert_frame_equal(
        direct[sorted(direct.columns)].reset_index(drop=True),
        composed[sorted(composed.columns)].reset_index(drop=True),
    )
    p = pdf.dropna(subset=["value"]).copy()
    p["bin"] = (p.pos // 1200) * 1200
    g = p.sort_values("pos").groupby("bin")["value"]
    exp = g.agg(["first", "max", "min", "last", "count"])
    got = direct.set_index("bin_start")
    assert np.allclose(got["open"], exp["first"])
    assert np.allclose(got["high"], exp["max"])
    assert np.allclose(got["low"], exp["min"])
    assert np.allclose(got["close"], exp["last"])
    assert (got["n"] == exp["count"]).all()


def test_gauge_agg_deltas_tile(spark):
    """gauge_agg vs a pandas twin: signed per-bin deltas (lag crossing
    bin edges) tile the whole-series delta; idelta endpoints and rate
    match."""
    from diive_spark.operators.analyses import gauge_agg

    rng = np.random.default_rng(13)
    n = 3000
    g = np.cumsum(rng.integers(-5, 6, n))        # free-moving gauge
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "g": g})
    out = (
        gauge_agg(spark.createDataFrame(pdf), every=600, value_col="g",
                  key_cols=["source", "doc_id"])
        .orderBy("bin_start").toPandas().set_index("bin_start")
    )
    p = pdf.copy()
    p["inc"] = p.g.diff()
    p["bin"] = (p.pos // 600) * 600
    exp = p.groupby("bin").agg(
        delta=("inc", "sum"),
        ileft=("inc", lambda s: s.dropna().iloc[0] if s.notna().any()
               else np.nan),
        iright=("inc", lambda s: s.dropna().iloc[-1] if s.notna().any()
                else np.nan),
        first=("g", "first"), last=("g", "last"), n=("g", "count"),
    )
    assert np.allclose(out.delta, exp.delta)
    assert np.allclose(out.idelta_left, exp.ileft)
    assert np.allclose(out.idelta_right, exp.iright)
    assert (out["first"] == exp["first"]).all()
    assert (out["last"] == exp["last"]).all()
    # bins tile: sum of per-bin deltas == whole-series last - first
    assert out.delta.sum() == g[-1] - g[0]
    # rate = delta / axis span covered by the bin's increments
    spans = p.dropna(subset=["inc"]).groupby("bin").size() * 1.0
    assert np.allclose(out.rate.dropna(),
                       (exp.delta / spans).dropna())


def test_stats2d_partials_compose_exactly(spark):
    """stats2d_agg vs a numpy OLS twin per bin, and compose_stats2d
    (1m -> 1h partial sums) equals a direct 1h stats2d_agg bit-for-bit
    on integer-quantized values."""
    from diive_spark.operators.analyses import compose_stats2d, stats2d_agg

    rng = np.random.default_rng(43)
    n = 4000
    y = np.cumsum(rng.integers(-3, 5, n))        # trending integer series
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "y": y})
    keys = ["source", "doc_id"]
    df = spark.createDataFrame(pdf)
    direct = (
        stats2d_agg(df, every=1200, value_col="y", key_cols=keys)
        .orderBy("bin_start").toPandas()
    )
    composed = (
        compose_stats2d(
            stats2d_agg(df, every=100, value_col="y", key_cols=keys),
            every=1200, key_cols=keys)
        .orderBy("bin_start").toPandas()
    )
    pd.testing.assert_frame_equal(
        direct[sorted(direct.columns)].reset_index(drop=True),
        composed[sorted(composed.columns)].reset_index(drop=True),
    )
    # numpy OLS twin per bin
    p = pdf.copy()
    p["bin"] = (p.pos // 1200) * 1200
    for b, g in p.groupby("bin"):
        row = direct.set_index("bin_start").loc[b]
        sl, ic = np.polyfit(g.pos, g.y, 1)
        r = np.corrcoef(g.pos, g.y)[0, 1]
        assert np.isclose(row["slope"], sl, atol=1e-9)
        assert np.isclose(row["intercept"], ic, atol=1e-6)
        assert np.isclose(row["r2"], r * r, atol=1e-9)


def test_topk_agg_modal_tokens(spark):
    """topk_agg vs a pandas twin: per-bin modal values, deterministic
    ties, shares sum to the top-k mass."""
    from diive_spark.operators.analyses import topk_agg

    rng = np.random.default_rng(47)
    n = 2000
    v = rng.integers(0, 50, n).astype(float)
    v[1000:2000] = np.where(rng.random(1000) < 0.6, 7.0, v[1000:2000])
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    out = (
        topk_agg(spark.createDataFrame(pdf), every=1000, k=3,
                 key_cols=["source", "doc_id"])
        .orderBy("bin_start", "rank").toPandas()
    )
    p = pdf.copy()
    p["bin"] = (p.pos // 1000) * 1000
    for b, g in p.groupby("bin"):
        cnts = g.value.value_counts().sort_index()
        exp = cnts.sort_values(ascending=False, kind="stable").head(3)
        got = out[out.bin_start == b]
        assert list(got.cnt) == list(exp.values)
        assert list(got.value_k) == [int(x) for x in exp.index]
        assert np.allclose(got.share, exp.values / len(g))
    # the degenerate bin's modal token is the planted 7
    assert out[(out.bin_start == 1000) & (out["rank"] == 1)
               ].value_k.iloc[0] == 7


def test_arrival_stats_flags_cadence_drift(spark):
    """arrival_stats vs a pandas twin: a bin with a perfect grid shows
    jitter 0 / median 1; a bin with dropped readings shows elevated
    p95/max."""
    from diive_spark.operators.analyses import arrival_stats

    rng = np.random.default_rng(59)
    pos = np.arange(2000)
    keep = np.ones(2000, bool)
    drop = rng.choice(np.arange(1000, 2000), 300, replace=False)
    keep[drop] = False                       # second bin: holey cadence
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": pos[keep],
                        "value": rng.normal(0, 1, keep.sum())})
    out = (
        arrival_stats(spark.createDataFrame(pdf), every=1000,
                      key_cols=["source", "doc_id"])
        .orderBy("bin_start").toPandas().set_index("bin_start")
    )
    p = pdf.copy()
    p["dt"] = p.pos.diff()
    p = p.dropna(subset=["dt"])
    p["bin"] = (p.pos // 1000) * 1000
    exp = p.groupby("bin").dt.agg(["count", "median", "max"])
    exp["p95"] = p.groupby("bin").dt.quantile(0.95)
    exp["jitter"] = p.groupby("bin").dt.std(ddof=0)
    assert (out.n_dt == exp["count"]).all()
    assert np.allclose(out.dt_median, exp["median"])
    assert np.allclose(out.dt_p95, exp["p95"])
    assert (out.dt_max == exp["max"]).all()
    assert np.allclose(out.jitter, exp["jitter"])
    assert out.loc[0, "jitter"] == 0.0 and out.loc[0, "dt_median"] == 1.0
    assert out.loc[1000, "dt_p95"] > 1.0


def test_acf_agg_detects_looping(spark):
    """acf_agg vs a pandas twin: a bin looping with period == lag shows
    acf near 1 while a white-noise bin sits near 0."""
    from diive_spark.operators.analyses import acf_agg

    rng = np.random.default_rng(61)
    noise = rng.normal(0, 1, 1000)
    loop = np.tile([5.0, -1.0, 2.0, 0.5], 250) + rng.normal(0, 0.05, 1000)
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(2000),
                        "value": np.concatenate([noise, loop])})
    out = (
        acf_agg(spark.createDataFrame(pdf), every=1000, lag=4,
                key_cols=["source", "doc_id"])
        .orderBy("bin_start").toPandas().set_index("bin_start")
    )
    p = pdf.copy()
    p["prev"] = p.value.shift(4)
    p["bin"] = (p.pos // 1000) * 1000
    for b, g in p.groupby("bin"):
        gg = g.dropna(subset=["prev"])
        assert np.isclose(out.loc[b, "acf"],
                          np.corrcoef(gg.value, gg.prev)[0, 1], atol=1e-9)
        assert out.loc[b, "n_pairs"] == len(gg)
    assert out.loc[1000, "acf"] > 0.95       # looping bin
    assert abs(out.loc[0, "acf"]) < 0.2      # noise bin
    # zero-variance (fully degenerate) bin: NULL acf, no ANSI
    # DIVIDE_BY_ZERO crash (F.corr would abort the job here)
    const = pd.DataFrame({"source": "s", "doc_id": "c",
                          "pos": np.arange(100), "value": 7.0})
    out2 = acf_agg(spark.createDataFrame(const), every=100, lag=4,
                   key_cols=["source", "doc_id"]).toPandas()
    assert out2.acf.isna().all() and (out2.n_pairs > 0).all()


def test_lttb_matches_reference_implementation(spark):
    """lttb_downsample vs an independent pure-python LTTB (Steinarsson
    §4.2): exact selection parity, endpoints pinned, n_out points, and
    a planted spike survives."""
    from diive_spark.operators.analyses import lttb_downsample

    rng = np.random.default_rng(67)
    n, n_out = 3000, 40
    v = np.sin(np.arange(n) / 50.0) + rng.normal(0, 0.05, n)
    v[1777] = 8.0                                 # the spike
    pdf = pd.DataFrame({"source": "s", "doc_id": "d",
                        "pos": np.arange(n), "value": v})
    got = (
        lttb_downsample(spark.createDataFrame(pdf), n_out=n_out,
                        key_cols=["source", "doc_id"])
        .orderBy("pos").toPandas()
    )

    # independent reference: straightforward loop transliteration of
    # the published algorithm (no shared code with the operator)
    def ref_lttb(x, y, no):
        edges = np.linspace(1, len(x) - 1, no - 1).astype(int)
        sel = [0]
        for b in range(no - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo = edges[b + 1]
            nhi = len(x) if b == no - 3 else edges[b + 2]
            ax, ay = x[sel[-1]], y[sel[-1]]
            bx, by = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            best, best_a = lo, -1.0
            for i in range(lo, hi):
                a = abs((ax - bx) * (y[i] - ay) - (ax - x[i]) * (by - ay))
                if a > best_a:
                    best, best_a = i, a
            sel.append(best)
        sel.append(len(x) - 1)
        return sel

    exp = ref_lttb(np.arange(n, dtype=float), v, n_out)
    assert list(got.pos) == exp
    assert len(got) == n_out
    assert got.pos.iloc[0] == 0 and got.pos.iloc[-1] == n - 1
    assert 1777 in set(got.pos)                    # spike kept
    # short series pass through untouched
    tiny = pdf.head(10)
    out2 = lttb_downsample(spark.createDataFrame(tiny), n_out=40,
                           key_cols=["source", "doc_id"]).toPandas()
    assert len(out2) == 10


def test_cusum_changepoint_finds_planted_shift(spark):
    # step from level 10 to level 30 at pos 250 — CUSUM argmax must land
    # exactly on the last pre-shift point (the |S| peak of a clean step)
    rng = np.random.default_rng(11)
    v = np.concatenate([rng.normal(10, 0.5, 250), rng.normal(30, 0.5, 250)])
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(500), "value": v}
    )
    from diive_spark.operators.analyses import cusum_changepoint

    got = cusum_changepoint(
        spark.createDataFrame(pdf), quantized=1e6
    ).toPandas().iloc[0]
    # independent numpy twin with the same quantization
    vq = np.floor(v * 1e6).astype(np.int64)
    s = np.cumsum(vq).astype(np.float64) - (
        np.arange(1, 501) * (vq.sum() / 500.0)
    )
    t_np = int(np.abs(s).argmax())
    assert got["t_star"] == t_np == 249
    assert abs(got["mean_before"] - vq[:250].sum() / 250 / 1e6) < 1e-12
    assert abs(got["mean_after"] - vq[250:].sum() / 250 / 1e6) < 1e-12
    assert got["n"] == 500


def test_m4_downsample_matches_pandas(spark):
    pdf = seeded_series(n=700, gap_frac=0.15)
    from diive_spark.operators.analyses import m4_downsample

    got = (
        m4_downsample(spark.createDataFrame(pdf), every=100)
        .toPandas()
        .sort_values("bin_start")
        .reset_index(drop=True)
    )
    pts = pdf.dropna(subset=["value"]).copy()
    pts["bin_start"] = (pts["pos"] // 100) * 100
    for _, row in got.iterrows():
        g = pts[pts["bin_start"] == row["bin_start"]]
        assert row["n"] == len(g)
        assert row["t_first"] == g["pos"].min()
        assert row["v_first"] == g.loc[g["pos"].idxmin(), "value"]
        assert row["t_last"] == g["pos"].max()
        assert row["v_last"] == g.loc[g["pos"].idxmax(), "value"]
        assert row["v_min"] == g["value"].min()
        assert row["t_min"] == g.loc[g["value"].idxmin(), "pos"]
        assert row["v_max"] == g["value"].max()
        assert row["t_max"] == g.loc[g["value"].idxmax(), "pos"]


def test_m4_tie_breaks_smallest_pos(spark):
    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": [0, 1, 2, 3],
            "value": [5.0, 5.0, 1.0, 1.0],  # ties for both min and max
        }
    )
    from diive_spark.operators.analyses import m4_downsample

    got = m4_downsample(spark.createDataFrame(pdf), every=10).toPandas().iloc[0]
    assert got["t_max"] == 0 and got["t_min"] == 2


def test_savgol_reproduces_polynomial_and_derivative(spark):
    # SG with polyorder=2 is EXACT on any quadratic: smoothing returns
    # the signal, deriv=1 returns its derivative (public 1964 property)
    pos = np.arange(60)
    v = 0.3 * pos**2 - 4.0 * pos + 7.0
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.analyses import savgol_smooth

    sm = (
        savgol_smooth(spark.createDataFrame(pdf), window=7, polyorder=2)
        .toPandas()
        .sort_values("pos")
    )
    interior = sm["smoothed"].notna()
    assert interior.sum() == 60 - 6  # full-window rows only
    np.testing.assert_allclose(
        sm.loc[interior, "smoothed"], v[3:-3], rtol=0, atol=1e-8
    )
    d1 = (
        savgol_smooth(
            spark.createDataFrame(pdf), window=7, polyorder=2, deriv=1
        )
        .toPandas()
        .sort_values("pos")
    )
    np.testing.assert_allclose(
        d1.loc[d1["smoothed"].notna(), "smoothed"],
        (0.6 * pos - 4.0)[3:-3],
        rtol=0,
        atol=1e-8,
    )


def test_savgol_window_least_squares_twin(spark):
    # independent oracle: per window, np.polyfit the 7 points and
    # evaluate the fit at the center — must equal the convolution
    pdf = seeded_series(n=80, gap_frac=0.0, seed=23)
    from diive_spark.operators.analyses import savgol_smooth

    got = (
        savgol_smooth(spark.createDataFrame(pdf), window=7, polyorder=2)
        .toPandas()
        .sort_values("pos")
        .set_index("pos")["smoothed"]
    )
    v = pdf["value"].to_numpy()
    for t in range(3, 77):
        win = v[t - 3 : t + 4]
        coef = np.polyfit(np.arange(-3, 4), win, 2)
        assert abs(got.loc[t] - np.polyval(coef, 0.0)) < 1e-8


def test_savgol_nulls_propagate(spark):
    pdf = seeded_series(n=40, gap_frac=0.0, seed=5)
    pdf.loc[20, "value"] = np.nan
    from diive_spark.operators.analyses import savgol_smooth

    got = (
        savgol_smooth(spark.createDataFrame(pdf), window=7, polyorder=2)
        .toPandas()
        .set_index("pos")["smoothed"]
    )
    for t in range(40):
        touches_nan = abs(t - 20) <= 3
        edge = t < 3 or t > 36
        assert pd.isna(got.loc[t]) == (touches_nan or edge), t


def test_interpolated_twa_tiles_and_matches_numpy(spark):
    # sparse irregular series whose segments span multiple bins
    pos = np.array([0, 50, 220, 390, 800, 1150])
    val = np.array([10.0, 20.0, 5.0, 7.0, 30.0, 2.0])
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": val}
    )
    from diive_spark.operators.analyses import interpolated_tw_avg

    for method in ("locf", "linear"):
        got = (
            interpolated_tw_avg(
                spark.createDataFrame(pdf), every=100, method=method
            )
            .toPandas()
            .sort_values("bin_start")
        )
        # numpy twin: dense unit-step integration of the step/linear fn
        t = np.arange(0, 1150)
        if method == "locf":
            dense = val[np.searchsorted(pos, t, side="right") - 1]
        else:
            dense = np.interp(t, pos, val)
        for _, row in got.iterrows():
            b = int(row["bin_start"])
            seg = dense[b : min(b + 100, 1150)]
            # trapezoid vs unit steps: integrate exactly with interp
            if method == "locf":
                expected = seg.sum()
            else:
                lo, hi = b, min(b + 100, 1150)
                xs = np.arange(lo, hi + 1)
                ys = np.interp(xs, pos, val)
                expected = np.trapz(ys)
            assert abs(row["integral"] - expected) < 1e-6, (method, b)
        # coverage tiles the series span exactly
        assert got["covered"].sum() == 1150
        # interpolated-edge integrals sum to the plain TWA total
        from diive_spark.operators.analyses import time_weighted_avg

        plain = time_weighted_avg(
            spark.createDataFrame(pdf), every=100, method=method
        ).toPandas()
        assert abs(got["integral"].sum() - plain["integral"].sum()) < 1e-9


def test_freq_sketch_mg_guarantees(spark):
    # skewed alphabet: value 7 is hot, a long tail of others
    rng = np.random.default_rng(3)
    v = np.where(rng.random(600) < 0.4, 7, rng.integers(0, 40, 600))
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(600),
         "value": v.astype(float)}
    )
    from diive_spark.operators.analyses import compose_freq, freq_sketch

    sdf = spark.createDataFrame(pdf)
    t1 = freq_sketch(sdf, every=50, k=4)
    t2 = compose_freq(t1, every=300, k=4).toPandas()
    pts = pdf.copy()
    pts["pb"] = (pts["pos"] // 300) * 300
    for pb, g in pts.groupby("pb"):
        true_counts = g["value"].value_counts()
        rows = t2[t2["bin_start"] == pb]
        n, err = rows["n"].iloc[0], rows["err"].iloc[0]
        assert n == len(g)
        # containment: counter <= true <= counter + err for kept values,
        # and absent values have true count <= err
        kept = dict(zip(rows["value"], rows["counter"]))
        for val, true_c in true_counts.items():
            c = kept.get(val, 0)
            assert c <= true_c <= c + err, (pb, val)
        # paper bound: err <= (n - sum counters) / (k+1)
        assert err <= (n - rows["counter"].sum()) / 5
        # hot value 7 must be the top counter everywhere (its true
        # count dwarfs err at this skew)
        top = rows.sort_values(["counter", "value"],
                               ascending=[False, True]).iloc[0]
        assert top["value"] == 7


def test_freq_sketch_empty_prune_keeps_bin(spark):
    # 5 values with equal counts and k=4: every counter prunes to 0 —
    # the rank-1 row must survive so (n, err) flow into composition
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(10),
         "value": [0.0, 1.0, 2.0, 3.0, 4.0] * 2}
    )
    from diive_spark.operators.analyses import compose_freq, freq_sketch

    t1 = freq_sketch(spark.createDataFrame(pdf), every=100, k=4).toPandas()
    assert len(t1) == 1 and t1["counter"].iloc[0] == 0
    assert t1["n"].iloc[0] == 10 and t1["err"].iloc[0] == 2
    t2 = compose_freq(
        freq_sketch(spark.createDataFrame(pdf), every=100, k=4),
        every=1000, k=4,
    ).toPandas()
    assert t2["n"].iloc[0] == 10 and t2["err"].iloc[0] == 2


def test_holt_exact_on_linear_series(spark):
    # on exact linear data the recursion is a fixed point: level tracks
    # the signal, trend stays the true slope, every 1-step error is 0
    pos = np.arange(50)
    v = 3.0 + 2.5 * pos
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.analyses import holt_smooth

    got = holt_smooth(
        spark.createDataFrame(pdf), alpha=0.3, beta=0.1, horizon=4
    ).toPandas().iloc[0]
    assert abs(got["level"] - v[-1]) < 1e-9
    assert abs(got["trend"] - 2.5) < 1e-9
    assert abs(got["forecast"] - (v[-1] + 4 * 2.5)) < 1e-9
    assert got["rmse"] < 1e-9


def test_holt_matches_numpy_loop(spark):
    pdf = seeded_series(n=300, gap_frac=0.1, seed=9)
    from diive_spark.operators.analyses import holt_smooth

    got = holt_smooth(
        spark.createDataFrame(pdf), alpha=0.4, beta=0.2, horizon=2
    ).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    a, b = 0.4, 0.2
    l, t, sse = x[1], x[1] - x[0], 0.0
    for xi in x[2:]:
        f = l + t
        sse += (xi - f) ** 2
        nl = a * xi + (1 - a) * (l + t)
        t = b * (nl - l) + (1 - b) * t
        l = nl
    assert got["n"] == len(x)
    assert abs(got["level"] - l) < 1e-12
    assert abs(got["trend"] - t) < 1e-12
    assert abs(got["forecast"] - (l + 2 * t)) < 1e-12
    assert abs(got["rmse"] - math.sqrt(sse / (len(x) - 2))) < 1e-12


def test_holt_short_series_nulls(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0], "value": [5.0]}
    )
    from diive_spark.operators.analyses import holt_smooth

    got = holt_smooth(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert got["n"] == 1 and pd.isna(got["level"]) and pd.isna(got["rmse"])


def test_theil_sen_robust_to_spikes(spark):
    # clean line with 3 gross outliers in a 40-point bin: the median of
    # pairwise slopes must recover the true slope exactly-ish, where
    # least squares would be dragged far off
    pos = np.arange(40)
    v = 1.0 + 0.5 * pos
    v[[5, 17, 30]] += 500.0
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.analyses import theil_sen_bins

    got = theil_sen_bins(spark.createDataFrame(pdf), every=100).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n"] == 40 and row["n_pairs"] == 40 * 39 // 2
    assert abs(row["slope"] - 0.5) < 1e-9
    # numpy all-pairs twin
    xs, vs = pos.astype(float), v
    slopes = [
        (vs[j] - vs[i]) / (xs[j] - xs[i])
        for i in range(40)
        for j in range(i + 1, 40)
    ]
    assert abs(row["slope"] - np.median(slopes)) < 1e-12
    inter = np.median(vs - np.median(slopes) * xs)
    assert abs(row["intercept"] - inter) < 1e-12


def test_theil_sen_bins_split_and_min_points(spark):
    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": [0, 10, 120, 130, 140, 250],
            "value": [0.0, 20.0, 5.0, 6.0, 7.0, 9.0],
        }
    )
    from diive_spark.operators.analyses import theil_sen_bins

    got = (
        theil_sen_bins(spark.createDataFrame(pdf), every=100)
        .toPandas()
        .sort_values("bin_start")
        .reset_index(drop=True)
    )
    # bin 200 has a single point -> omitted
    assert list(got["bin_start"]) == [0, 100]
    assert got.loc[0, "slope"] == 2.0  # (20-0)/10
    assert got.loc[1, "slope"] == 0.1  # all pairwise slopes equal


def test_asap_picks_period_aligned_window(spark):
    # seasonal square-ish wave (period 24) + noise + 2 genuine spikes:
    # ASAP must (a) cut roughness vs raw, (b) not smooth the spikes
    # away (kurtosis preserved), (c) pick a window near the period
    rng = np.random.default_rng(17)
    pos = np.arange(720)
    season = np.where((pos % 24) < 12, 10.0, -10.0)
    v = season + rng.normal(0, 1.5, 720)
    # spike size matters: +80 keeps the period-24 SMA kurtosis above
    # raw (spikes survive dilution); much larger spikes inflate RAW
    # kurtosis so far that no window passes the gate and ASAP
    # correctly refuses to smooth (verified by magnitude scan)
    v[[200, 500]] += 80.0
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    from diive_spark.operators.analyses import asap_smooth

    got = asap_smooth(spark.createDataFrame(pdf)).toPandas()
    w = got["window"].iloc[0]
    assert (got["window"] == w).all()
    assert w >= 2
    sm = got.sort_values("pos")["smoothed"].to_numpy()
    assert np.diff(sm).std() < np.diff(v).std() * 0.8

    def kurt(x):
        d = x - x.mean()
        return (d**4).mean() / (d * d).mean() ** 2

    assert kurt(sm) >= kurt(v) - 1e-9
    # numpy twin replay of the search must agree on the window
    def sma(x, w_):
        c = np.cumsum(np.concatenate(([0.0], x)))
        return (c[w_:] - c[:-w_]) / w_

    max_w = 72
    d = v - v.mean()
    denom = (d * d).sum()
    acf = np.array([(d[k:] * d[:-k]).sum() / denom for k in range(1, 73)])
    cands = {
        k + 1
        for k in range(1, 71)
        if acf[k] > acf[k - 1] and acf[k] > acf[k + 1] and acf[k] > 0.2
    }
    ww = 2
    while ww <= max_w:
        cands.add(ww)
        ww = int(np.ceil(ww * 1.5))
    best_w, best_r = 1, np.diff(v).std()
    for cw in sorted(cands):
        if cw < 2 or cw > max_w:
            continue
        s_ = sma(v, cw)
        if kurt(s_) >= kurt(v) and np.diff(s_).std() < best_r:
            best_w, best_r = cw, np.diff(s_).std()
    assert w == best_w


def test_asap_short_series_passthrough(spark):
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0, 1, 2],
         "value": [1.0, 2.0, 3.0]}
    )
    from diive_spark.operators.analyses import asap_smooth

    got = asap_smooth(spark.createDataFrame(pdf)).toPandas()
    assert list(got.sort_values("pos")["smoothed"]) == [1.0, 2.0, 3.0]
    assert (got["window"] == 1).all()


def test_ddsketch_compose_exact_and_relative_error(spark):
    """DDSketch log-bin store: (a) composing 60-bins into 3600-bins is
    BIT-IDENTICAL to building directly at 3600 (exact mergeability);
    (b) every quantile estimate is within the (gamma-1)/(gamma+1)
    relative-error bound of the exact order statistic, across positive,
    negative and zero values (mirrored + zero stores)."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import (
        compose_ddsketch, ddsketch_agg, ddsketch_quantiles)

    rng = np.random.default_rng(7)
    n = 7200
    rows = []
    for src, doc in (("a", "d1"), ("a", "d2"), ("b", "d3")):
        v = rng.lognormal(mean=3.0, sigma=2.0, size=n)   # heavy tail
        neg = rng.random(n) < 0.3
        v = np.where(neg, -v, v)
        v[rng.random(n) < 0.02] = 0.0                     # zero store
        v[rng.random(n) < 0.05] = np.nan                  # gaps dropped
        for pos, val in enumerate(v):
            rows.append((src, doc, pos,
                         None if np.isnan(val) else float(val)))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    df = spark.createDataFrame(pdf).repartition(8)

    gamma = 1.02
    sk1m = ddsketch_agg(df, every=60, gamma=gamma)
    composed = compose_ddsketch(sk1m, every=3600)
    direct = ddsketch_agg(df, every=3600, gamma=gamma)
    key = ["source", "doc_id", "bin_start", "sign", "bucket"]
    a = composed.orderBy(*key).toPandas()
    b = direct.orderBy(*key).toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))

    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    est = ddsketch_quantiles(composed, qs, gamma=gamma).toPandas()
    bound = (gamma - 1.0) / (gamma + 1.0) + 1e-9
    pdf_ok = pdf.dropna(subset=["value"])
    checked = 0
    for (src, doc, bs), g in pdf_ok.assign(
        bin_start=(pdf_ok["pos"] // 3600) * 3600
    ).groupby(["source", "doc_id", "bin_start"]):
        xs = np.sort(g["value"].to_numpy())
        sub = est[(est.source == src) & (est.doc_id == doc)
                  & (est.bin_start == bs)]
        assert len(sub) == len(qs)
        for _, r in sub.iterrows():
            rank = max(1, math.ceil(r["q"] * len(xs)))
            exact = xs[rank - 1]
            assert int(r["n"]) == len(xs)
            if exact == 0.0:
                assert r["est"] == 0.0
            else:
                assert abs(r["est"] - exact) / abs(exact) <= bound, (
                    src, doc, bs, r["q"], r["est"], exact)
            checked += 1
    assert checked >= 6 * len(qs)


def test_ddsketch_collapse_bounds_state_and_keeps_guarantee(spark):
    """UddSketch uniform collapse: (a) ddsketch_collapse_level picks a
    level that actually caps every bin's bucket count; (b) the
    collapsed store is a valid DDSketch at gamma^(2^level) — quantile
    estimates stay within the widened relative-error bound; (c)
    collapse commutes with compose (merge-then-collapse ==
    collapse-then-merge, bit-identical)."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import (
        collapse_ddsketch, compose_ddsketch, ddsketch_agg,
        ddsketch_collapse_level, ddsketch_quantiles)

    rng = np.random.default_rng(11)
    n = 4000
    rows = []
    for src, doc in (("a", "d1"), ("b", "d2")):
        # 12 decades of dynamic range -> many log buckets per bin
        v = 10.0 ** rng.uniform(-6, 6, size=n)
        for pos, val in enumerate(v):
            rows.append((src, doc, pos, float(val)))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    df = spark.createDataFrame(pdf).repartition(8)

    gamma = 1.02
    sk = ddsketch_agg(df, every=2000, gamma=gamma)
    cap = 64
    lv = ddsketch_collapse_level(sk, max_buckets=cap)
    assert lv > 0  # 12 decades at gamma=1.02 is ~1,400 buckets
    small = collapse_ddsketch(sk, lv)
    worst = (
        small.groupBy("source", "doc_id", "bin_start")
        .count().agg({"count": "max"}).first()[0]
    )
    assert worst <= cap

    g2 = gamma ** (2 ** lv)
    bound = (g2 - 1.0) / (g2 + 1.0) + 1e-9
    qs = [0.01, 0.5, 0.99]
    est = ddsketch_quantiles(small, qs, gamma=g2).toPandas()
    for (src, doc, bs), g in pdf.assign(
        bin_start=(pdf["pos"] // 2000) * 2000
    ).groupby(["source", "doc_id", "bin_start"]):
        xs = np.sort(g["value"].to_numpy())
        sub = est[(est.source == src) & (est.doc_id == doc)
                  & (est.bin_start == bs)]
        for _, r in sub.iterrows():
            rank = max(1, math.ceil(r["q"] * len(xs)))
            exact = xs[rank - 1]
            assert abs(r["est"] - exact) / exact <= bound

    # collapse/compose commute exactly
    a = collapse_ddsketch(compose_ddsketch(sk, 4000), lv)
    b = compose_ddsketch(collapse_ddsketch(sk, lv), 4000)
    key = ["source", "doc_id", "bin_start", "sign", "bucket"]
    pd.testing.assert_frame_equal(
        a.orderBy(*key).toPandas().reset_index(drop=True),
        b.orderBy(*key).toPandas().reset_index(drop=True),
    )


def test_compose_counter_equals_direct(spark):
    """rollup(counter_agg) analog: composing 60-bins into 3600-bins is
    bit-identical to counter_agg built directly at 3600 — including
    around resets that land at child-bin and parent-bin boundaries."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import compose_counter, counter_agg

    rng = np.random.default_rng(3)
    rows = []
    for src, doc in (("a", "d1"), ("b", "d2")):
        c = 0.0
        for pos in range(7205):  # spans two 3600-bins + a stub
            c += float(rng.integers(0, 5))
            if rng.random() < 0.002 or pos in (3600, 3661, 7200):
                c = float(rng.integers(0, 3))  # reset (incl. boundaries)
            rows.append((src, doc, pos, c))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    df = spark.createDataFrame(pdf).repartition(8)

    child = counter_agg(df, every=60)
    got = compose_counter(child, every=3600)
    want = counter_agg(df, every=3600)
    cols = ["source", "doc_id", "bin_start", "bin_end", "bin_label",
            "n", "counter_delta", "n_resets", "first", "last"]
    key = ["source", "doc_id", "bin_start"]
    g = got.select(*cols).orderBy(*key).toPandas().reset_index(drop=True)
    w = want.select(*cols).orderBy(*key).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)
    assert (w["n_resets"].sum()) > 0


def test_compose_gauge_equals_direct(spark):
    """rollup(gauge_agg) analog: 60-bins composed into 3600-bins ==
    gauge_agg built directly at 3600, including the re-derived rate
    (exact via the stored dx span partial) and edge ideltas."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import compose_gauge, gauge_agg

    rng = np.random.default_rng(9)
    rows = []
    for src, doc in (("a", "d1"), ("b", "d2")):
        g = 50.0
        for pos in range(7205):
            g += float(rng.normal(0, 2))
            val = None if rng.random() < 0.05 else g  # gaps -> uneven dx
            rows.append((src, doc, pos, val))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    df = spark.createDataFrame(pdf).repartition(8)

    child = gauge_agg(df, every=60)
    got = compose_gauge(child, every=3600)
    want = gauge_agg(df, every=3600)
    cols = ["source", "doc_id", "bin_start", "bin_end", "bin_label",
            "n", "delta", "idelta_left", "idelta_right", "rate", "dx",
            "first", "last"]
    key = ["source", "doc_id", "bin_start"]
    g = got.select(*cols).orderBy(*key).toPandas().reset_index(drop=True)
    w = want.select(*cols).orderBy(*key).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, rtol=0, atol=1e-9)


def test_compose_state_and_heartbeat_equal_direct(spark):
    """rollup(state_agg) / rollup(heartbeat_agg) analogs: 60-bins
    composed into 3600-bins == the direct 3600 build (left-endpoint
    segments never split, so sums are exact)."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import (
        compose_heartbeat, compose_state, heartbeat_agg, state_agg)

    rng = np.random.default_rng(5)
    rows, hb = [], []
    for src, doc in (("a", "d1"), ("b", "d2")):
        pos = 0
        while pos < 7300:
            rows.append((src, doc, pos,
                         str(rng.choice(["ok", "warn", "down"]))))
            pos += int(rng.integers(1, 40))
        p = 0
        while p < 7300:
            hb.append((src, doc, p))
            p += int(rng.integers(1, 25))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "pos", "state"])
    ).repartition(8)
    hdf = spark.createDataFrame(
        pd.DataFrame(hb, columns=["source", "doc_id", "pos"])
    ).repartition(8)

    key = ["source", "doc_id", "bin_start"]
    g = (compose_state(state_agg(sdf, every=60), every=3600)
         .orderBy(*key, "state").toPandas().reset_index(drop=True))
    w = (state_agg(sdf, every=3600)
         .select(*g.columns).orderBy(*key, "state").toPandas()
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w, rtol=0, atol=1e-9)

    gh = (compose_heartbeat(heartbeat_agg(hdf, every=60, alive_window=10),
                            every=3600)
          .orderBy(*key).toPandas().reset_index(drop=True))
    wh = (heartbeat_agg(hdf, every=3600, alive_window=10)
          .select(*gh.columns).orderBy(*key).toPandas()
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(gh, wh, rtol=0, atol=1e-9)


def test_compose_twa_equals_direct(spark):
    """rollup(time_weight) analog: quantized twa 60-bins composed to
    3600 == direct 3600 build, bit-for-bit (integer partial sums)."""
    import numpy as np
    import pandas as pd

    from diive_spark.operators.analyses import compose_twa, time_weighted_avg

    rng = np.random.default_rng(13)
    rows = []
    for src, doc in (("a", "d1"), ("b", "d2")):
        pos = 0
        while pos < 7300:
            rows.append((src, doc, pos, float(rng.normal(10, 3))))
            pos += int(rng.integers(1, 50))
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "pos", "value"])
    df = spark.createDataFrame(pdf).repartition(8)

    for method in ("locf", "linear"):
        child = time_weighted_avg(df, every=60, method=method,
                                  quantized=1e6)
        got = compose_twa(child, every=3600)
        want = time_weighted_avg(df, every=3600, method=method,
                                 quantized=1e6)
        key = ["source", "doc_id", "bin_start"]
        g = got.orderBy(*key).toPandas().reset_index(drop=True)
        w = (want.select(*g.columns).orderBy(*key).toPandas()
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(g, w)


def test_sax_matches_numpy(spark):
    from diive_spark.operators.analyses import SAX_BREAKPOINTS, sax_symbolize

    pdf = seeded_series(n=257, gap_frac=0.15, seed=21)
    got = (
        sax_symbolize(spark.createDataFrame(pdf), segments=8, alphabet=4)
        .toPandas()
        .sort_values("seg")
        .reset_index(drop=True)
    )
    x = pdf["value"].dropna().to_numpy()
    n = len(x)
    z = (x - x.mean()) / x.std()  # numpy std is population (ddof=0)
    seg = (np.arange(n) * 8) // n
    bps = np.array(SAX_BREAKPOINTS[4])
    assert len(got) == 8
    for s in range(8):
        zi = z[seg == s]
        row = got.iloc[s]
        assert row["seg"] == s and row["n_pts"] == len(zi)
        assert abs(row["paa"] - zi.mean()) < 1e-9
        want_sym = int((zi.mean() > bps).sum())
        assert row["symbol"] == want_sym
        assert row["letter"] == chr(97 + want_sym)


def test_sax_flat_series_all_middle(spark):
    from diive_spark.operators.analyses import sax_symbolize

    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": np.arange(40),
            "value": 7.5,
        }
    )
    got = sax_symbolize(
        spark.createDataFrame(pdf), segments=4, alphabet=4
    ).toPandas()
    # zero variance -> z == 0 everywhere -> paa == 0 -> symbol 1 of 4
    # (one breakpoint crossed: paa > -0.674..., not > 0)
    assert len(got) == 4
    assert (got["paa"] == 0.0).all()
    assert (got["symbol"] == 1).all()
    assert (got["letter"] == "b").all()


def test_sax_short_series_and_validation(spark):
    import pytest as _pytest

    from diive_spark.operators.analyses import sax_symbolize

    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0, 1, 2], "value": [1.0, 2.0, 9.0]}
    )
    got = sax_symbolize(
        spark.createDataFrame(pdf), segments=8, alphabet=4
    ).toPandas()
    # fewer points than segments: only occupied segments emitted
    assert len(got) == 3
    assert got["n_pts"].sum() == 3
    with _pytest.raises(ValueError):
        sax_symbolize(spark.createDataFrame(pdf), alphabet=7)


def _cm_numpy_sketch(items, depth, width):
    from diive_spark.operators.analyses import CM_PRIME, CM_SEEDS

    cells = {}
    for v in items:
        for r in range(depth):
            a, b = CM_SEEDS[r]
            col = ((a * (int(v) % CM_PRIME) + b) % CM_PRIME) % width
            cells[(r, col)] = cells.get((r, col), 0) + 1
    return cells


def test_cm_sketch_matches_numpy_and_overestimates(spark):
    from diive_spark.operators.analyses import cm_estimate, cm_sketch_agg

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 40, size=500)
    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": np.arange(500),
            "value": vals.astype(float),
        }
    )
    sdf = spark.createDataFrame(pdf)
    depth, width = 4, 32  # narrow width to force collisions
    sk = cm_sketch_agg(sdf, every=1000, depth=depth, width=width)
    got_cells = {
        (r["row"], r["col"]): r["cnt"] for r in sk.collect()
    }
    assert got_cells == _cm_numpy_sketch(vals, depth, width)

    probes = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": "s",
                "doc_id": "d0",
                "bin_start": 0,
                "value": np.arange(45).astype(float),  # incl. absent 40..44
            }
        )
    )
    est = cm_estimate(
        sk, probes, depth=depth, width=width
    ).toPandas().set_index("value")["cm_est"]
    truth = pd.Series(vals).value_counts()
    # one-sided error: estimate never undershoots the true count
    for v in range(45):
        assert est[float(v)] >= int(truth.get(v, 0))
    # exact replication of the numpy min-over-rows estimate
    from diive_spark.operators.analyses import CM_PRIME, CM_SEEDS

    cells = _cm_numpy_sketch(vals, depth, width)
    for v in range(45):
        want = min(
            cells.get(
                (r, ((CM_SEEDS[r][0] * (v % CM_PRIME) + CM_SEEDS[r][1])
                     % CM_PRIME) % width),
                0,
            )
            for r in range(depth)
        )
        assert est[float(v)] == want


def test_cm_compose_equals_direct(spark):
    from diive_spark.operators.analyses import cm_sketch_agg, compose_cm

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "source": np.repeat(["a", "b"], 300),
            "doc_id": "d0",
            "pos": np.tile(np.arange(300), 2),
            "value": rng.integers(0, 25, size=600).astype(float),
        }
    )
    sdf = spark.createDataFrame(pdf)
    child = cm_sketch_agg(sdf, every=50, depth=3, width=16)
    composed = compose_cm(child, every=150)
    direct = cm_sketch_agg(sdf, every=150, depth=3, width=16)
    key = ["source", "doc_id", "bin_start", "row", "col"]
    c = composed.orderBy(*key).toPandas().reset_index(drop=True)
    d = direct.select(*c.columns).orderBy(*key).toPandas().reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(c, d)


def test_cm_validation_and_nulls(spark):
    import pytest as _pytest

    from diive_spark.operators.analyses import cm_sketch_agg

    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": [0, 1, 2],
            "value": [1.0, None, 3.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    sk = cm_sketch_agg(sdf, every=10, depth=2, width=8)
    # null dropped: total count per hash row == 2
    per_row = sk.groupBy("row").agg(F.sum("cnt").alias("n")).collect()
    assert {r["row"]: r["n"] for r in per_row} == {0: 2, 1: 2}
    with _pytest.raises(ValueError):
        cm_sketch_agg(sdf, every=10, depth=99)
    with _pytest.raises(ValueError):
        cm_sketch_agg(sdf, every=10, width=1)


def _hw_numpy(x, m, a, be, g, h):
    l = x[:m].mean()
    b = (x[m:2 * m].mean() - x[:m].mean()) / m
    s = list(x[:m] - l)
    sse = 0.0
    for t in range(m, len(x)):
        s_old = s[0]
        err = x[t] - (l + b + s_old)
        sse += err * err
        nl = a * (x[t] - s_old) + (1 - a) * (l + b)
        nb = be * (nl - l) + (1 - be) * b
        ns = g * (x[t] - nl) + (1 - g) * s_old
        l, b = nl, nb
        s = s[1:] + [ns]
    season_next = s[(h - 1) % m]
    return (
        l, b, season_next, l + h * b + season_next,
        math.sqrt(sse / (len(x) - m)),
    )


def test_holt_winters_matches_numpy_loop(spark):
    from diive_spark.operators.analyses import holt_winters_smooth

    pdf = seeded_series(n=300, gap_frac=0.1, seed=13)
    got = holt_winters_smooth(
        spark.createDataFrame(pdf), period=12, alpha=0.4, beta=0.15,
        gamma=0.2, horizon=5,
    ).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    l, b, sn, fc, rmse = _hw_numpy(x, 12, 0.4, 0.15, 0.2, 5)
    assert got["n"] == len(x)
    assert abs(got["level"] - l) < 1e-10
    assert abs(got["trend"] - b) < 1e-10
    assert abs(got["season_next"] - sn) < 1e-10
    assert abs(got["forecast"] - fc) < 1e-10
    assert abs(got["rmse"] - rmse) < 1e-10


def test_holt_winters_beats_holt_on_seasonal_signal(spark):
    from diive_spark.operators.analyses import holt_smooth, holt_winters_smooth

    m = 8
    pos = np.arange(160)
    season = np.array([5.0, 3.0, 0.0, -2.0, -5.0, -3.0, 0.0, 2.0])
    v = 10.0 + 0.05 * pos + season[pos % m]
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    sdf = spark.createDataFrame(pdf)
    hw = holt_winters_smooth(
        sdf, period=m, alpha=0.3, beta=0.05, gamma=0.2
    ).toPandas().iloc[0]
    ho = holt_smooth(sdf, alpha=0.3, beta=0.05).toPandas().iloc[0]
    # the seasonal model must explain the cycle the trend model can't
    assert hw["rmse"] < 0.35 * ho["rmse"]


def test_holt_winters_short_series_nulls_and_validation(spark):
    import pytest as _pytest

    from diive_spark.operators.analyses import holt_winters_smooth

    pdf = pd.DataFrame(
        {
            "source": "s",
            "doc_id": "d0",
            "pos": np.arange(15),
            "value": np.linspace(0, 5, 15),
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = holt_winters_smooth(sdf, period=8).toPandas().iloc[0]
    # n = 15 < 2*period = 16 -> all outputs null
    assert got["n"] == 15 and pd.isna(got["level"]) and pd.isna(got["rmse"])
    with _pytest.raises(ValueError):
        holt_winters_smooth(sdf, period=0)
    with _pytest.raises(ValueError):
        holt_winters_smooth(sdf, period=8, gamma=1.5)


def _mp_numpy_brute(x, m, excl):
    n_sub = len(x) - m + 1
    subs = [np.asarray(x[i:i + m], dtype=float) for i in range(n_sub)]
    zs = []
    for s in subs:
        sd = s.std()
        zs.append(np.zeros(m) if sd == 0 else (s - s.mean()) / sd)
    mp, nn = [], []
    for i in range(n_sub):
        best, bj = np.inf, -1
        for j in range(n_sub):
            if abs(i - j) < excl:
                continue
            d = float(np.sqrt(((zs[i] - zs[j]) ** 2).sum()))
            if d < best:
                best, bj = d, j
        mp.append(best)
        nn.append(bj)
    return np.array(mp), np.array(nn)


def test_matrix_profile_matches_brute_force(spark):
    from diive_spark.operators.analyses import matrix_profile

    pdf = seeded_series(n=120, gap_frac=0.1, seed=3)
    got = (
        matrix_profile(spark.createDataFrame(pdf), m=8)
        .toPandas()
        .sort_values("sub_ci")
        .reset_index(drop=True)
    )
    x = pdf["value"].dropna().to_numpy()
    mp, nn = _mp_numpy_brute(x, 8, 4)
    assert len(got) == len(mp)
    np.testing.assert_allclose(got["mp"].to_numpy(), mp, atol=1e-8)
    # nearest-neighbor indices agree wherever the min is unambiguous
    d = np.abs(got["mp"].to_numpy() - mp)
    assert (got["nn_ci"].to_numpy() == nn)[d < 1e-10].mean() > 0.95


def test_matrix_profile_finds_planted_discord(spark):
    from diive_spark.operators.analyses import matrix_profile_discord

    pos = np.arange(256)
    v = np.sin(2 * np.pi * pos / 16)  # pure repeating shape
    v[140:148] = [5.0, -5.0, 5.0, -5.0, 5.0, -5.0, 5.0, -5.0]  # discord
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": pos, "value": v}
    )
    got = matrix_profile_discord(
        spark.createDataFrame(pdf), m=8, top=1
    ).toPandas().iloc[0]
    # the top discord window must overlap the planted anomaly
    assert 133 <= got["sub_ci"] <= 147
    assert got["mp"] > 1.0


def test_matrix_profile_guards(spark):
    import pytest as _pytest

    from diive_spark.operators.analyses import matrix_profile

    flat = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(30),
         "value": 2.0}
    )
    got = matrix_profile(spark.createDataFrame(flat), m=8).toPandas()
    # all-flat series: every window is the zero z-vector -> mp == 0
    assert len(got) == 23 and (got["mp"] == 0.0).all()

    short = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0, 1, 2],
         "value": [1.0, 2.0, 3.0]}
    )
    assert matrix_profile(spark.createDataFrame(short), m=8).count() == 0
    with _pytest.raises(ValueError):
        matrix_profile(spark.createDataFrame(short), m=1)
    with _pytest.raises(Exception):  # executor ValueError surfaces wrapped
        matrix_profile(
            spark.createDataFrame(flat), m=8, max_points=10
        ).count()


def test_sax_motif_buckets_groups_shape_not_scale(spark):
    from diive_spark.operators.analyses import sax_motif_buckets

    pos = np.arange(64)
    base = np.sin(2 * np.pi * pos / 32)
    rows = []
    for did, v in [
        ("a", base),                 # shape A
        ("b", 3.0 * base + 10.0),    # shape A, scaled+shifted
        ("c", base[::-1].copy()),    # mirrored shape
    ]:
        rows.append(
            pd.DataFrame(
                {"source": "s", "doc_id": did, "pos": pos, "value": v}
            )
        )
    sdf = spark.createDataFrame(pd.concat(rows))
    got = sax_motif_buckets(
        sdf, segments=8, alphabet=4, min_series=2
    ).toPandas()
    # z-normalization makes SAX scale/offset-invariant: a and b share a
    # word; the mirrored series does not join their bucket
    assert len(got) == 1
    assert got.iloc[0]["n_series"] == 2
    assert list(got.iloc[0]["members"]) == ["s|a", "s|b"]


def _lb_numpy(x, h):
    x = np.asarray(x, dtype=float)
    n = len(x)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    q = 0.0
    for k in range(1, h + 1):
        num = ((x[k:] - mu) * (x[:-k] - mu)).sum()
        q += (num / den) ** 2 / (n - k)
    return n * (n + 2) * q


def test_ljung_box_matches_numpy(spark):
    from diive_spark.operators.analyses import CHI2_95, ljung_box

    pdf = seeded_series(n=250, gap_frac=0.1, seed=17)
    got = ljung_box(spark.createDataFrame(pdf), h=10).toPandas().iloc[0]
    x = pdf["value"].dropna().to_numpy()
    want = _lb_numpy(x, 10)
    assert got["n"] == len(x)
    assert abs(got["q_stat"] - want) < 1e-8
    assert got["chi2_crit_95"] == CHI2_95[10]
    assert bool(got["white_noise_ok"]) == (want <= CHI2_95[10])


def test_ljung_box_separates_noise_from_cycle(spark):
    from diive_spark.operators.analyses import ljung_box

    rng = np.random.default_rng(23)
    pos = np.arange(400)
    frames = []
    for did, v in [
        ("noise", rng.standard_normal(400)),
        ("cycle", np.sin(2 * np.pi * pos / 20) + 0.1
         * rng.standard_normal(400)),
    ]:
        frames.append(pd.DataFrame(
            {"source": "s", "doc_id": did, "pos": pos, "value": v}))
    got = ljung_box(
        spark.createDataFrame(pd.concat(frames)), h=10
    ).toPandas().set_index("doc_id")
    assert bool(got.loc["noise", "white_noise_ok"])
    assert not bool(got.loc["cycle", "white_noise_ok"])
    assert got.loc["cycle", "q_stat"] > 10 * got.loc["noise", "q_stat"]


def test_ljung_box_constant_and_short_series(spark):
    import pytest as _pytest

    from diive_spark.operators.analyses import ljung_box

    const = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": np.arange(50), "value": 4.0}
    )
    got = ljung_box(spark.createDataFrame(const), h=5).toPandas().iloc[0]
    assert pd.isna(got["q_stat"]) and pd.isna(got["white_noise_ok"])
    short = pd.DataFrame(
        {"source": "s", "doc_id": "d0", "pos": [0, 1], "value": [1.0, 2.0]}
    )
    assert ljung_box(spark.createDataFrame(short), h=5).count() == 0
    with _pytest.raises(ValueError):
        ljung_box(spark.createDataFrame(short), h=30)


# ---------------------------------------------------- binseg_changepoints
def _binseg_np(vals, q, min_seg):
    """Definitional depth-2 binary segmentation twin (quantized)."""
    import math

    vq = [math.floor(v * q) for v in vals]

    def best(seg):
        n = len(seg)
        tot = sum(seg)
        cum = 0
        cands = []
        for k in range(1, n + 1):
            cum += seg[k - 1]
            if min_seg <= k <= n - min_seg:
                s = cum - k * tot / n
                cands.append((abs(s), -k, k, cum))
        if not cands:
            return None
        a, nk, k, cum = max(cands)
        return dict(
            k=k, n=n, s_norm=a / q / n,
            mean_before=cum / k / q,
            mean_after=(tot - cum) / (n - k) / q,
        )

    out = {}
    root = best(vq)
    if root is None:
        return out
    out[(1, -1)] = root
    k = root["k"]
    left, right = best(vq[:k]), best(vq[k:])
    if left is not None:
        out[(2, 0)] = left
    if right is not None:
        out[(2, 1)] = right
    return out


def test_binseg_matches_twin_and_finds_planted_shifts(spark):
    import numpy as np

    from diive_spark.operators.analyses import binseg_changepoints

    rng = np.random.RandomState(17)
    # three-level step: 0 (x80), 5 (x60), 2 (x60)
    vals = np.concatenate([
        rng.randn(80) * 0.3,
        rng.randn(60) * 0.3 + 5.0,
        rng.randn(60) * 0.3 + 2.0,
    ])
    rows = [("s", "0", i, float(vals[i])) for i in range(len(vals))]
    # short series: no candidate splits -> no rows at all
    rows += [("s", "tiny", i, float(i)) for i in range(5)]
    df = spark.createDataFrame(
        rows, "source string, doc_id string, pos long, value double"
    )
    got = {
        (r["level"], r["seg"]): r
        for r in binseg_changepoints(
            df, quantized=1000.0, min_seg=10
        ).where("doc_id = '0'").collect()
    }
    exp = _binseg_np([float(v) for v in vals], 1000.0, 10)
    assert set(got) == set(exp) == {(1, -1), (2, 0), (2, 1)}
    for key in exp:
        g, e = got[key], exp[key]
        assert g["cp_pos"] is not None
        np.testing.assert_allclose(g["s_max_norm"], e["s_norm"], rtol=0)
        np.testing.assert_allclose(g["mean_before"], e["mean_before"], rtol=0)
        np.testing.assert_allclose(g["mean_after"], e["mean_after"], rtol=0)
    # level-1 split at the 80-boundary; level-2 right at the 140-boundary
    assert abs(got[(1, -1)]["cp_pos"] - 79) <= 2
    assert abs(got[(2, 1)]["cp_pos"] - 139) <= 2
    # the tiny series emitted nothing
    assert binseg_changepoints(df, min_seg=10).where(
        "doc_id = 'tiny'"
    ).count() == 0
    import pytest

    with pytest.raises(ValueError):
        binseg_changepoints(df, min_seg=1)
