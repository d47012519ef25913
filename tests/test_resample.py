"""bucket_rollup / compose_rollup vs a pure-pandas oracle implementing the
reference semantics (diive/core/times/resampling.py:13-132):
mincounts = int(maxcounts * perc), floor rule -> 1 if < 3, gate on value
count, label = bin END."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators.resample import bucket_rollup, compose_rollup

from .conftest import assert_frame_close, seeded_series


def pandas_rollup(pdf: pd.DataFrame, every: int, perc: float, floor_rule=True):
    """Independent oracle (reference semantics re-derived, not imported)."""
    out = []
    for (src, doc), g in pdf.groupby(["source", "doc_id"]):
        b = g["pos"] // every
        grid_counts = g.groupby(b).size()
        maxc = grid_counts.max()
        minc = int(maxc * perc)
        if floor_rule and minc < 3:
            minc = 1
        agg = g.groupby(b)["value"].agg(["count", "mean", "sum", "min", "max", "std"])
        agg = agg[agg["count"] >= minc]
        for bi, row in agg.iterrows():
            out.append(
                {
                    "source": src,
                    "doc_id": doc,
                    "bin_start": bi * every,
                    "n": row["count"],
                    "mean": row["mean"],
                    "sd": row["std"],
                    "min": row["min"],
                    "max": row["max"],
                }
            )
    return pd.DataFrame(out)


@pytest.mark.parametrize("every,perc", [(60, 0.9), (60, 0.25), (128, 0.5)])
def test_rollup_matches_pandas_oracle(spark, tiny_series, tiny_series_pd, every, perc):
    got = (
        bucket_rollup(tiny_series, every=every, mincounts_perc=perc)
        .select("source", "doc_id", "bin_start", "n", "mean", "sd", "min", "max")
        .toPandas()
    )
    exp = pandas_rollup(tiny_series_pd, every, perc)
    assert_frame_close(got, exp, ["source", "doc_id", "bin_start"], atol=1e-9, rtol=1e-9)


def test_label_conventions(spark, tiny_series):
    right = bucket_rollup(tiny_series, every=60, label="right").limit(1).first()
    assert right["bin_label"] == right["bin_end"]
    left = bucket_rollup(tiny_series, every=60, label="left").limit(1).first()
    assert left["bin_label"] == left["bin_start"]


def test_compose_equals_direct(spark, tiny_series):
    """1h-from-1m partial composition == direct 1h rollup from raw."""
    t1m = bucket_rollup(tiny_series, every=60, mincounts_perc=0.0, min_floor_rule=False)
    t1h_composed = (
        compose_rollup(t1m, every=3600, mincounts_perc=0.9)
        .select("source", "doc_id", "bin_start", "n", "mean", "sd", "min", "max")
        .toPandas()
    )
    t1h_direct = (
        bucket_rollup(tiny_series, every=3600, mincounts_perc=0.9)
        .select("source", "doc_id", "bin_start", "n", "mean", "sd", "min", "max")
        .toPandas()
    )
    assert_frame_close(
        t1h_composed, t1h_direct, ["source", "doc_id", "bin_start"], atol=1e-8, rtol=1e-8
    )


def test_mincount_gate_drops_sparse_bins(spark):
    pdf = seeded_series(n=200, gap_frac=0.0)
    pdf.loc[pdf["pos"] >= 150, "value"] = np.nan  # last bin of 60: only nulls
    sdf = spark.createDataFrame(pdf)
    got = bucket_rollup(sdf, every=60, mincounts_perc=0.9).toPandas()
    # bins: [0,60) full, [60,120) full, [120,180) has 30 values of 60 grid,
    # [180,200) partial grid (20 rows) → maxc=60, minc=54 → only 2 bins pass
    assert sorted(got["bin_start"]) == [0, 60]


def test_percentiles_match_pandas_interpolation(spark):
    pdf = seeded_series(n=360, gap_frac=0.05)
    sdf = spark.createDataFrame(pdf)
    got = (
        bucket_rollup(sdf, every=120, mincounts_perc=0.0, min_floor_rule=False,
                      percentiles=[0.25, 0.5, 0.95])
        .select("bin_start", "p25", "p50", "p95")
        .toPandas()
        .sort_values("bin_start")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        seg = pdf[(pdf["pos"] >= row["bin_start"]) & (pdf["pos"] < row["bin_start"] + 120)]
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.95, "p95")]:
            exp = seg["value"].quantile(q)  # pandas linear interpolation
            assert abs(row[col] - exp) < 1e-9, (q, row["bin_start"])


def test_calendar_rollup_conventions(spark):
    """Weekly bins anchor Monday + label period END; daily label LEFT
    (resample_df, frames.py:353-362)."""
    import pandas as pd
    from diive_spark.operators.resample import calendar_rollup

    # 2024-01-01 is a Monday
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=21, freq="1D").to_pydatetime(),
        "value": [float(i) for i in range(21)],
    })
    sdf = spark.createDataFrame(pdf)
    wk = calendar_rollup(sdf, "week").toPandas().sort_values("bin_start")
    assert len(wk) == 3
    assert all(wk["n"] == 7)
    # Monday-anchored start, label = next Monday (period end, RIGHT)
    assert wk.iloc[0]["bin_start"].strftime("%Y-%m-%d %a") == "2024-01-01 Mon"
    assert wk.iloc[0]["bin_label"].strftime("%Y-%m-%d") == "2024-01-08"
    assert abs(wk.iloc[0]["mean"] - 3.0) < 1e-9  # mean of 0..6

    day = calendar_rollup(sdf, "day").toPandas().sort_values("bin_start")
    assert (day["bin_label"] == day["bin_start"]).all()  # LEFT label


def test_timestamp_resample_parity_with_pandas(spark):
    """Full diive 30MIN-path parity on real timestamps: END-stamped
    30-min series -> convert to MIDDLE (resampling.py:68) -> 1h bins
    label RIGHT (:86-93) == pandas resample('1h', label='right') on the
    MIDDLE-stamped series, including the mincount gate."""
    from diive_spark.datagen import meteo_table
    from diive_spark.operators.timegrid import convert_stamp

    met = meteo_table(spark)  # MIDDLE-stamped 30-min July 2022
    import pyspark.sql.functions as F

    # derive an END-stamped epoch-seconds series (middle + 15 min)
    s = met.select(
        F.lit("meteo").alias("source"),
        F.lit("TA").alias("doc_id"),
        (F.unix_timestamp(F.col("TIMESTAMP_MIDDLE").cast("timestamp")) + 900)
        .alias("pos"),
        F.col("TA").alias("value"),
    )
    # END -> MIDDLE shift with freq=1800s, then 1h bins labelled right
    mid = convert_stamp(s, freq=1800, src="end", dst="middle")
    got = (
        bucket_rollup(mid, every=3600, mincounts_perc=0.9, label="right")
        .select("bin_label", "n", "mean")
        .toPandas()
        .sort_values("bin_label")
        .reset_index(drop=True)
    )

    # pandas oracle: the reference path
    pdf = met.toPandas().set_index("TIMESTAMP_MIDDLE").sort_index()
    r = pdf["TA"].resample("1h", label="right")  # closed='left' default
    counts, means = r.count(), r.mean()
    maxc = counts.max()
    minc = int(maxc * 0.9)
    minc = 1 if minc < 3 else minc
    keep = counts >= minc
    exp_labels = [int(ts.timestamp()) for ts in counts.index[keep]]
    assert list(got["bin_label"]) == exp_labels
    np.testing.assert_allclose(got["mean"].values, means[keep].values, atol=1e-9)
    np.testing.assert_array_equal(got["n"].values, counts[keep].values)


def test_hll_distinct_sketch_composes_upward(spark):
    """HLL distinct sketches: tier-1h unioned from tier-1m partials
    equals a direct raw->1h sketch EXACTLY (lossless merge), and tracks
    exact distinct counts within HLL error."""
    import pyspark.sql.functions as F

    from diive_spark.operators.resample import (
        bucket_rollup, compose_rollup, with_distinct_estimate,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type").alias("source"),
        F.col("event_id").cast("long").alias("pos"),
        "value", "user_id",
    )
    kw = dict(mincounts_perc=0.0, min_floor_rule=False, key_cols=["source"])
    t1m = bucket_rollup(ev, every=60, distinct_col="user_id", **kw)
    composed = with_distinct_estimate(
        compose_rollup(t1m, every=3600, mincounts_perc=0.0,
                       min_floor_rule=False, key_cols=["source"])
    ).select("source", "bin_start", "n_distinct")
    direct = with_distinct_estimate(
        bucket_rollup(ev, every=3600, distinct_col="user_id", **kw)
    ).select("source", "bin_start", F.col("n_distinct").alias("n_direct"))
    j = composed.join(direct, on=["source", "bin_start"]).toPandas()
    assert len(j) > 0
    assert (j["n_distinct"] == j["n_direct"]).all()      # lossless merge
    exact = (
        ev.groupBy("source", F.floor(F.col("pos") / 3600).alias("b"))
        .agg(F.countDistinct("user_id").alias("n_exact"))
        .toPandas()["n_exact"]
    )
    est = j.sort_values(["source", "bin_start"])["n_distinct"]
    rel = abs(est.to_numpy() - exact.sort_index().to_numpy()) / exact.to_numpy()
    assert rel.max() < 0.05                               # HLL lgK=12 bound


def test_approx_percentile_mode_bounded_error(spark):
    """percentile_accuracy switches to the sketch path; rank error is
    within 1/accuracy of the exact per-bin percentile."""
    import numpy as np
    import pyspark.sql.functions as F

    from diive_spark.operators.resample import bucket_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type").alias("source"),
        F.col("event_id").cast("long").alias("pos"),
        "value",
    )
    kw = dict(every=3600, mincounts_perc=0.0, min_floor_rule=False,
              key_cols=["source"], percentiles=[0.5, 0.95])
    approx = bucket_rollup(ev, percentile_accuracy=10000, **kw).select(
        "source", "bin_start", "p50", "p95"
    ).toPandas().set_index(["source", "bin_start"]).sort_index()
    # the sketch returns an actual element near the target RANK (exact
    # percentile interpolates between ranks, so compare in rank space):
    # empirical CDF at the approx value must sit within one element +
    # sketch slack of the target quantile
    raw = ev.toPandas()
    raw["b"] = raw["pos"] // 3600
    for (src, b), grp in raw.groupby(["source", "b"]):
        vals = np.sort(grp["value"].dropna().to_numpy())
        n = len(vals)
        for c, q in (("p50", 0.5), ("p95", 0.95)):
            a = approx.loc[(src, b * 3600), c]
            cdf = np.searchsorted(vals, a, side="right") / n
            assert q - 0.02 - 1 / n <= cdf <= q + 0.02 + 1 / n, (src, b, c)


def test_hist_sketch_composes_losslessly(spark):
    """Fixed-bin histogram sketches: tier-1h composed element-wise from
    tier-1m count arrays equals a direct raw->1h histogram BIT-FOR-BIT
    (integer sums), and percentile estimates off the composed tier are
    within one bin width of the exact percentile."""
    import pyspark.sql.functions as F

    from diive_spark.operators.resample import (
        bucket_rollup, compose_rollup, hist_percentile_estimate,
    )

    pdf = seeded_series(n=4000, seed=11)
    df = spark.createDataFrame(pdf).withColumn(
        "value", F.nanvl(F.col("value"), F.lit(None))
    )
    bounds, bins = (0.0, 110.0), 55
    kw = dict(mincounts_perc=0.0, min_floor_rule=False,
              key_cols=["source"], hist_bounds=bounds, hist_bins=bins)
    t1m = bucket_rollup(df, every=50, **kw)
    composed = compose_rollup(t1m, every=1000, mincounts_perc=0.0,
                              min_floor_rule=False, key_cols=["source"],
                              hist_bins=bins)
    direct = bucket_rollup(df, every=1000, **kw)
    a = {r["bin_start"]: list(r["hist"])
         for r in composed.select("bin_start", "hist").collect()}
    b = {r["bin_start"]: list(r["hist"])
         for r in direct.select("bin_start", "hist").collect()}
    assert a == b and len(a) == 4                         # lossless

    est = hist_percentile_estimate(composed, [0.25, 0.5, 0.9],
                                   bounds, bins).toPandas()
    g = pdf.dropna(subset=["value"]).copy()
    g["bin"] = (g.pos // 1000) * 1000
    width = (bounds[1] - bounds[0]) / bins
    import math
    for q, col in [(0.25, "p25_est"), (0.5, "p50_est"), (0.9, "p90_est")]:
        # provable bound is vs the rank-ceil(q*n) order statistic
        exact = g.groupby("bin")["value"].apply(
            lambda v, q=q: sorted(v)[math.ceil(q * len(v)) - 1]
        )
        got = est.set_index("bin_start")[col].sort_index()
        assert (abs(got.to_numpy() - exact.sort_index().to_numpy())
                <= width + 1e-9).all()

    # composing a hist-bearing tier without hist_bins is an error, not
    # a silent sketch drop
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hist_bins"):
        compose_rollup(t1m, every=1000, mincounts_perc=0.0,
                       min_floor_rule=False, key_cols=["source"])


def test_ohlc_partials_compose_exactly(spark):
    """bucket_rollup(ohlc=True): open/close + anchors composed 1m -> 1h
    equal a direct raw -> 1h rollup bit-for-bit (picked readings fold
    exactly), and gaps (null values) never claim open/close."""
    import pyspark.sql.functions as F

    from diive_spark.operators.resample import bucket_rollup, compose_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("event_type").alias("source"),
        F.col("event_id").cast("long").alias("pos"),
        F.when(F.col("value") < 5.0, F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("value"),
    )
    kw = dict(mincounts_perc=0.0, min_floor_rule=False, key_cols=["source"])
    cols = ["source", "bin_start", "open", "close", "open_pos", "close_pos"]
    composed = (
        compose_rollup(bucket_rollup(ev, every=60, ohlc=True, **kw),
                       every=3600, mincounts_perc=0.0,
                       min_floor_rule=False, key_cols=["source"])
        .select(*cols).toPandas()
        .sort_values(["source", "bin_start"]).reset_index(drop=True)
    )
    direct = (
        bucket_rollup(ev, every=3600, ohlc=True, **kw)
        .select(*cols).toPandas()
        .sort_values(["source", "bin_start"]).reset_index(drop=True)
    )
    assert len(composed) > 0
    pd.testing.assert_frame_equal(composed, direct)
    # pandas twin: open/close are the first/last NON-NULL readings
    p = ev.toPandas().dropna(subset=["value"])
    p["b"] = (p.pos // 3600) * 3600
    exp = (
        p.sort_values("pos").groupby(["source", "b"])["value"]
        .agg(["first", "last"]).reset_index()
    )
    m = direct.merge(exp, left_on=["source", "bin_start"],
                     right_on=["source", "b"])
    assert len(m) == len(direct)
    assert (m["open"] == m["first"]).all()
    assert (m["close"] == m["last"]).all()


def test_tokens_array_rollup_matches_explode_pipeline(spark):
    """The explode-free tier-1m ingest (z-gate + partials computed
    row-locally on the token array) agrees with the explode pipeline
    (series_view-style zscore_flag_tokens -> bucket_rollup) on every
    partial, and its plan needs ZERO exchanges."""
    import numpy as np
    import pyspark.sql.functions as F

    from diive_spark.datagen import NA_SENTINEL, tokens_table
    from diive_spark.operators.outliers import zscore_flag_tokens
    from diive_spark.operators.resample import (
        bucket_rollup,
        tokens_array_rollup,
    )

    toks = tokens_table(spark, n_docs=150, seed=9).localCheckpoint()
    flagged = zscore_flag_tokens(toks, thres=4.0, na_sentinel=NA_SENTINEL)
    clean = flagged.withColumn(
        "v", F.when(F.col("flag_zscore") == 2, None)
        .otherwise(F.col("value"))
    )
    a = (
        bucket_rollup(clean, every=60, value_col="v",
                      mincounts_perc=0.0, min_floor_rule=False)
        .orderBy("source", "doc_id", "bin_start").toPandas()
    )
    arr = tokens_array_rollup(toks, every=60, thres=4.0,
                              na_sentinel=NA_SENTINEL)
    b = arr.orderBy("source", "doc_id", "bin_start").toPandas()
    assert len(a) == len(b) > 0
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    for c in cols:
        if c in ("source", "doc_id"):
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
        else:
            assert np.allclose(
                a[c].astype(float), b[c].astype(float),
                atol=1e-9, equal_nan=True,
            ), c
    # the 1m tier is produced without a single shuffle
    plan = arr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "SinglePartition" not in plan


def test_tokens_array_rollup_kernel_parity(spark):
    """The Arrow/numpy ingest kernel reproduces the JVM array-expression
    path: n/n_grid/min/max and null positions EXACT, sums to 1e-9
    (float reordering), on a corpus with sentinels, a z-gate, empty
    docs and a partial trailing chunk."""
    import numpy as np
    import pandas as pd

    from diive_spark.conventions import NA_SENTINEL
    from diive_spark.operators.resample import (
        tokens_array_rollup, tokens_array_rollup_kernel)

    rng = np.random.default_rng(17)
    rows = []
    for i in range(60):
        n = int(rng.integers(0, 400))  # includes empty docs
        toks = rng.integers(0, 50000, size=n)
        toks[rng.random(n) < 0.05] = NA_SENTINEL
        if n > 10:
            toks[5] = 3_000_000  # z-gate victim
        rows.append((f"s{i % 3}", f"d{i:03d}", [int(x) for x in toks], n))
    rows.append(("s0", "dnull", None, 0))  # null array: no chunks, no crash
    pdf = pd.DataFrame(rows, columns=["source", "doc_id", "tokens", "n_tok"])
    df = spark.createDataFrame(pdf).repartition(8)

    kw = dict(every=60, thres=4.0, na_sentinel=NA_SENTINEL)
    key = ["source", "doc_id", "bin_start"]
    a = (tokens_array_rollup(df, **kw)
         .orderBy(*key).toPandas().reset_index(drop=True))
    b = (tokens_array_rollup_kernel(df, **kw)
         .select(*a.columns).orderBy(*key).toPandas()
         .reset_index(drop=True))
    assert len(a) == len(b) and len(a) > 0
    for c in ("source", "doc_id", "bin_start", "bin_end", "bin_label",
              "n", "n_grid"):
        assert (a[c] == b[c]).all(), c
    for c in ("sum", "sumsq", "min", "max", "mean", "sd"):
        na, nb = a[c].isna(), b[c].isna()
        assert (na == nb).all(), f"{c} null positions"
        d = (a[c] - b[c]).abs().max()
        assert d < 1e-6, (c, d)
