"""Analysis operators: stats battery, percentile ladders, histograms,
binned aggregations, correlations, rolling/lagged feature synthesis.

Reference semantics (diive):
- sstats battery: diive/core/dfun/stats.py:70-103 — n, missing, mean,
  sample SD/VAR (pandas ddof=1), sd/mean, sum, median, min, max,
  P01/05/25/75/95/99 with pandas linear interpolation == Spark exact
  ``percentile``.
- percentiles 0..100: diive/pkgs/analyses/quantiles.py:8-31.
- Histogram: diive/pkgs/analyses/histogram.py:14-122 (np.histogram
  convention: n equal bins over [min, max], last bin right-closed);
  peakbins = top-5 bins by count (:79-86).
- daily_correlation: diive/pkgs/analyses/correlation.py:8-55 — Pearson r
  per calendar bucket.
- FindOptimumRange: diive/pkgs/analyses/optimumrange.py:20-160 —
  quantile-bin x, median y per bin, rolling mean over bins, arg-extreme.
- SortingBinsMethod: diive/pkgs/analyses/decoupling.py:27-101 — decile
  var1, nested decile var2, mean var3 per (bin, subbin).
- QuantileXYAggZ: diive/pkgs/analyses/quantilexyaggz.py:8-162 — quantile
  classes on x and y, z aggregate per class pair, min-count filter.
- rolling/lagged variants: diive/core/dfun/frames.py:728-747 (rolling,
  min_periods=ceil(N/2)), :760-850 (lag range features).
- diel cycle: diive/pkgs/flux/co2_penalty.py:386-393 — group by
  time-of-day; on the position axis: ``pos % period``.
- DOY cumulatives: diive/core/times/times.py:1108-1138 — per-partition
  running sum + cross-partition mean/SD envelope.
"""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS

PCT_BATTERY = [0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99]


def sstats(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-series stats battery (stats.py:70-103) in one aggregate pass."""
    v = F.col(value_col)
    pcts = F.percentile(v, F.array(*[F.lit(p) for p in PCT_BATTERY]))
    out = df.groupBy(*key_cols).agg(
        F.min(axis_col).alias("startpos"),
        F.max(axis_col).alias("endpos"),
        (F.max(axis_col) - F.min(axis_col)).alias("period"),
        F.count(v).alias("nov"),
        F.count(F.when(v.isNull(), 1)).alias("missing"),
        (F.count(F.when(v.isNull(), 1)) * 100.0 / F.count(F.lit(1))).alias("missing_perc"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("sd"),
        F.var_samp(v).alias("var"),
        (F.stddev_samp(v) / F.avg(v)).alias("sd_over_mean"),
        F.sum(v).alias("sum"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        pcts.alias("_p"),
    )
    names = ["p01", "p05", "p25", "median", "p75", "p95", "p99"]
    for i, name in enumerate(names):
        out = out.withColumn(name, F.col("_p")[i])
    return out.drop("_p")


def percentile_ladder(
    df: DataFrame, value_col: str = "value", key_cols: Sequence[str] = ()
) -> DataFrame:
    """Value at every integer percentile 0..100 (quantiles.py:8-31),
    exploded to (percentile, value) rows."""
    v = F.col(value_col)
    qs = [i / 100.0 for i in range(101)]
    agg = df.groupBy(*key_cols).agg(
        F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias("_p")
    )
    return agg.select(
        *key_cols, F.posexplode("_p").alias("percentile", "value")
    )


def histogram(
    df: DataFrame,
    n_bins: int = 10,
    value_col: str = "value",
    key_cols: Sequence[str] = (),
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """np.histogram-convention fixed-range histogram (histogram.py:14-122):
    n equal bins over [lo, hi] (default data min/max per group), values on
    a bin edge fall in the right bin except the max which joins the last
    bin.  Returns (key..., bin_idx, bin_lo, bin_hi, count)."""
    keys = list(key_cols)
    v = F.col(value_col)
    if lo is None or hi is None:
        # default range = data min/max: one partial-combined aggregate
        # joined back (never a whole-input single-partition window)
        bounds = (
            df.groupBy(*keys) if keys else df.groupBy()
        ).agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
        if keys:
            # let AQE choose broadcast vs shuffle by key cardinality
            df = df.join(bounds, on=keys, how="inner")
        else:
            df = df.crossJoin(F.broadcast(bounds))
    else:
        df = df.withColumn("_lo", F.lit(float(lo))).withColumn("_hi", F.lit(float(hi)))
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    raw_idx = F.floor((v - F.col("_lo")) / width)
    idx = F.least(raw_idx, F.lit(n_bins - 1))  # max value joins last bin
    return (
        df.where(v.isNotNull() & (v >= F.col("_lo")) & (v <= F.col("_hi")))
        .groupBy(*keys, idx.alias("bin_idx"), "_lo", "_hi")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("bin_lo", F.col("_lo") + F.col("bin_idx") * (F.col("_hi") - F.col("_lo")) / n_bins)
        .withColumn("bin_hi", F.col("_lo") + (F.col("bin_idx") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins)
        .drop("_lo", "_hi")
    )


def histogram_unique(
    df: DataFrame,
    value_col: str = "value",
    key_cols: Sequence[str] = (),
    trim_first: int = 0,
    trim_last: int = 0,
) -> DataFrame:
    """Unique-value histogram with optional first/last-bin trimming
    (Histogram method='uniquevalues' + ignore-edge options,
    histogram.py:55-77): one bin per distinct value."""
    keys = list(key_cols)
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(*keys, v.alias("bin_value"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if trim_first or trim_last:
        wk = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
        counts = (
            counts.withColumn("_rk", F.row_number().over(wk.orderBy("bin_value")))
            .withColumn("_n", F.count(F.lit(1)).over(wk))
            .where(
                (F.col("_rk") > trim_first) & (F.col("_rk") <= F.col("_n") - trim_last)
            )
            .drop("_rk", "_n")
        )
    return counts


def peak_bins(hist_df: DataFrame, k: int = 5, key_cols: Sequence[str] = ()) -> DataFrame:
    """Top-k histogram bins by count (histogram.py:79-86), deterministic
    tie-break on bin_idx."""
    keys = list(key_cols)
    if keys:
        w = Window.partitionBy(*keys).orderBy(F.col("count").desc(), F.col("bin_idx"))
        return hist_df.withColumn("_rk", F.row_number().over(w)).where(
            F.col("_rk") <= k
        ).drop("_rk")
    return hist_df.orderBy(F.col("count").desc(), F.col("bin_idx")).limit(k)


def bucket_correlation(
    df: DataFrame,
    a_col: str,
    b_col: str,
    bucket: int,
    axis_col: str = "pos",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Pearson r of two columns per axis bucket (daily_correlation,
    correlation.py:8-55: per-calendar-day corr ≙ per-bucket corr)."""
    b = F.floor(F.col(axis_col) / bucket).alias("bucket")
    return df.groupBy(*key_cols, b).agg(
        F.corr(a_col, b_col).alias("r"),
        F.count(F.when(F.col(a_col).isNotNull() & F.col(b_col).isNotNull(), 1)).alias("n"),
    )


def diel_cycle(
    df: DataFrame,
    period: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Group by position-within-cycle (time-of-day analog,
    co2_penalty.py:386-393): mean/sd/count per phase."""
    phase = F.pmod(F.col(axis_col), F.lit(period)).alias("phase")
    v = F.col(value_col)
    return df.groupBy(*key_cols, phase).agg(
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("sd"),
        F.count(v).alias("n"),
    )


def quantile_bins(
    df: DataFrame,
    col: str,
    n: int,
    out_col: str,
    key_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n)`` quantile classes over non-null values (pandas qcut
    analog used throughout diive's binned analyses), WITHOUT a
    single-partition global sort.

    Bit-identical to SQL ``ntile(n) OVER (ORDER BY col, tiebreaks)``:
    a two-pass distributed rank.  Pass 1 computes ~``num_partitions``
    approximate value cutpoints driver-side (``approxQuantile``, one
    cheap scan) and folds them into a literal CASE chain, so every row
    maps to a range bucket as a pure function of its value — stable
    across plan branches, AQE re-optimization, and retries (a physical
    ``spark_partition_id`` is NOT stable across subtree re-evaluations,
    which silently corrupts offsets).  Pass 2 ranks locally per bucket,
    reconstructs global row numbers from the tiny per-bucket count
    table (offset + total via one broadcast self-join — no
    SinglePartition window over the input anywhere in the plan) and
    applies the closed-form ntile bucket rule.  Cutpoint accuracy only
    affects load balance, never the result.  Degenerate case: a
    near-constant column collapses to few buckets (as any total sort
    of equal values must).

    Pass ``tiebreak_cols`` (a unique key) to make bin assignment of
    tied values deterministic across engines/partitionings."""
    keys = list(key_cols)
    order_cols = [col] + list(tiebreak_cols)
    d = df.where(F.col(col).isNotNull())
    sess = d.sparkSession
    nparts = int(
        num_partitions or sess.conf.get("spark.sql.shuffle.partitions", "32")
    )
    probs = [i / nparts for i in range(1, nparts)]
    cuts = sorted(set(d.stat.approxQuantile(col, probs, 1.0 / (4 * nparts)))) if probs else []
    bucket = F.lit(len(cuts))
    for i in range(len(cuts) - 1, -1, -1):
        bucket = F.when(F.col(col) <= F.lit(cuts[i]), F.lit(i)).otherwise(bucket)
    d = d.withColumn("_pid", bucket)
    d = d.repartition(nparts, "_pid", *keys)
    wl = Window.partitionBy("_pid", *keys).orderBy(*[F.col(c) for c in order_cols])
    d = d.withColumn("_lrn", F.row_number().over(wl))

    counts = d.groupBy("_pid", *keys).agg(F.count(F.lit(1)).alias("_c"))
    other = counts.select(
        F.col("_pid").alias("_pid2"),
        *[F.col(k).alias(f"_k2_{k}") for k in keys],
        F.col("_c").alias("_c2"),
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"_k2_{k}") == F.col(k))
    offs = (
        counts.join(F.broadcast(other), on=cond, how="inner")
        .groupBy("_pid", *keys)
        .agg(
            F.sum(F.when(F.col("_pid2") < F.col("_pid"), F.col("_c2")).otherwise(F.lit(0))).alias("_off"),
            F.sum("_c2").alias("_N"),
        )
    )
    d = d.join(F.broadcast(offs), on=["_pid"] + keys, how="inner")
    # SQL ntile: first (N mod n) buckets hold ceil(N/n) rows, rest floor.
    # `div` = exact long integer division (double `/` misrounds at 1e12).
    d = (
        d.withColumn("_rn", (F.col("_off") + F.col("_lrn")).cast("long"))
        .withColumn("_q", F.expr(f"_N div {int(n)}"))
        .withColumn("_r", F.col("_N") % int(n))
    )
    bucket = F.when(
        F.col("_rn") <= (F.col("_q") + 1) * F.col("_r"),
        F.expr("(_rn - 1) div (_q + 1)") + 1,
    ).otherwise(
        F.col("_r")
        + F.expr("(_rn - 1 - _r * (_q + 1)) div greatest(_q, 1L)")
        + 1
    )
    return d.withColumn(out_col, bucket.cast("int")).drop(
        "_pid", "_lrn", "_off", "_N", "_rn", "_q", "_r"
    )


def sorting_bins(
    df: DataFrame,
    var1: str,
    var2: str,
    var3: str,
    n_bins: int = 10,
    key_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Decoupling / SortingBinsMethod (decoupling.py:27-101): decile-bin
    var1; within each bin, decile-bin var2; mean of var3 per (bin, subbin)."""
    keys = list(key_cols)
    b1 = quantile_bins(
        df.where(F.col(var2).isNotNull() & F.col(var3).isNotNull()),
        var1, n_bins, "bin1", keys, tiebreak_cols,
    )
    b2 = quantile_bins(b1, var2, n_bins, "bin2", keys + ["bin1"], tiebreak_cols)
    return b2.groupBy(*keys, "bin1", "bin2").agg(
        F.avg(var3).alias(f"{var3}_mean"),
        F.count(var3).alias("n"),
    )


def quantile_xy_agg_z(
    df: DataFrame,
    x: str,
    y: str,
    z: str,
    n_x: int = 10,
    n_y: int = 10,
    agg: str = "mean",
    min_n: int = 1,
    key_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """QuantileXYAggZ (quantilexyaggz.py:8-162): independent quantile
    classes on x and y, z-aggregate per class pair, min-count filter."""
    keys = list(key_cols)
    good = df.where(
        F.col(x).isNotNull() & F.col(y).isNotNull() & F.col(z).isNotNull()
    )
    bx = quantile_bins(good, x, n_x, "xbin", keys, tiebreak_cols)
    bxy = quantile_bins(bx, y, n_y, "ybin", keys, tiebreak_cols)
    zc = F.col(z)
    aggfn = {
        "mean": F.avg(zc), "median": F.median(zc), "sum": F.sum(zc),
        "min": F.min(zc), "max": F.max(zc), "count": F.count(zc),
    }[agg]
    return (
        bxy.groupBy(*keys, "xbin", "ybin")
        .agg(aggfn.alias(f"{z}_{agg}"), F.count(zc).alias("n"))
        .where(F.col("n") >= min_n)
    )


def find_optimum_range(
    df: DataFrame,
    x: str,
    y: str,
    n_bins: int = 20,
    rolling_win: int | None = None,
    maximize: bool = True,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """FindOptimumRange (optimumrange.py:20-160): quantile-bin x, median
    of y per bin, centered rolling mean over the (small) bin table, pick
    the extreme bin.  Returns one row: optimum bin + x-range."""
    binned = quantile_bins(
        df.where(F.col(y).isNotNull()), x, n_bins, "xbin",
        tiebreak_cols=tiebreak_cols,
    )
    per_bin = binned.groupBy("xbin").agg(
        F.median(y).alias("y_med"),
        F.min(x).alias("x_lo"),
        F.max(x).alias("x_hi"),
        F.count(y).alias("n"),
    )
    win = rolling_win or max(3, int(n_bins * 0.1) | 1)
    wr = Window.orderBy("xbin").rowsBetween(-(win // 2), win // 2)
    smoothed = per_bin.withColumn("y_smooth", F.avg("y_med").over(wr))
    order = F.col("y_smooth").desc() if maximize else F.col("y_smooth").asc()
    wrank = Window.orderBy(order, F.col("xbin"))
    return (
        smoothed.withColumn("_rk", F.row_number().over(wrank))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def rolling_variants(
    df: DataFrame,
    win: int,
    aggs: Sequence[str] = ("mean",),
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Trailing rolling aggregates over N records with
    min_periods = ceil(N/2) (frames.py:728-747)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col).rowsBetween(-(win - 1), 0)
    v = F.col(value_col)
    min_periods = math.ceil(win / 2)
    cnt = F.count(v).over(w)
    fns = {"mean": F.avg, "max": F.max, "min": F.min, "sum": F.sum,
           "sd": F.stddev_samp}
    out = df
    for a in aggs:
        expr = fns[a](v).over(w)
        out = out.withColumn(
            f"{value_col}_roll{a}{win}",
            F.when(cnt >= min_periods, expr),
        )
    return out


def lagged_variants(
    df: DataFrame,
    lags: Sequence[int],
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Shifted feature copies for each lag in *lags* (frames.py:760-850);
    positive lag = value from k records earlier."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    out = df
    for k in lags:
        col = F.lag(value_col, k).over(w) if k >= 0 else F.lead(value_col, -k).over(w)
        out = out.withColumn(f"{value_col}_lag{k}", col)
    return out


def cumulative_per_partition(
    df: DataFrame,
    partition_col: str,
    value_col: str = "value",
    axis_col: str = "pos",
) -> DataFrame:
    """Running sum per partition (DOY cumulatives analog,
    times.py:1108-1138): cumsum over the ordered axis within each
    partition, plus the cross-partition mean±SD envelope per axis point."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(axis_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn("cumsum", F.sum(value_col).over(w))
    env = Window.partitionBy(axis_col)
    m, s = F.col("cum_mean"), F.col("cum_sd")
    return (
        out.withColumn("cum_mean", F.avg("cumsum").over(env))
        .withColumn("cum_sd", F.stddev_samp("cumsum").over(env))
        # envelope bands (times.py:1131-1138: MEAN±SD, MEAN±1.96·SD)
        .withColumn("cum_mean_plus_sd", m + s)
        .withColumn("cum_mean_minus_sd", m - s)
        .withColumn("cum_mean_plus_1_96sd", m + 1.96 * s)
        .withColumn("cum_mean_minus_1_96sd", m - 1.96 * s)
    )


def neighboring_partition_pool(
    df: DataFrame, partition_col: str, radius: int = 1
) -> DataFrame:
    """Pool each (integer) partition with its ±radius neighbors
    (neighboring_years, diive/core/times/neighbors.py:6-46): each row is
    replicated into the pools it belongs to, ``pool`` = center value."""
    p = F.col(partition_col)
    # explode can't nest inside an expression — shift inside the array
    pools = F.array(*[p + o for o in range(-radius, radius + 1)])
    return df.withColumn("pool", F.explode(pools))


def heatmap_pivot(
    df: DataFrame,
    row_col: str,
    col_col: str,
    value_col: str = "value",
    agg: str = "mean",
) -> DataFrame:
    """(row x col) matrix of value aggregates (heatmap data,
    diive/core/plotting/heatmap_datetime.py:150-185 minus the plot)."""
    fns = {"mean": F.avg(value_col), "sum": F.sum(value_col),
           "count": F.count(value_col)}
    return df.groupBy(row_col).pivot(col_col).agg(fns[agg])


def add_record_number(
    df: DataFrame, axis_col: str = "pos", key_cols: Sequence[str] = KEY_COLS
) -> DataFrame:
    """1..N record counter per series (frames.py:750-757)."""
    w = Window.partitionBy(*key_cols).orderBy(axis_col)
    return df.withColumn("record_number", F.row_number().over(w))


def rolling_correlation(
    df: DataFrame,
    a_col: str,
    b_col: str,
    window: int,
    min_periods: int | None = None,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str = "roll_corr",
) -> DataFrame:
    """Rolling Pearson correlation of two columns over the trailing
    ``window`` rows per key (the windowed analog of daily_correlation /
    bucket_correlation).  Spark has no corr-over-window, so the five
    component sums (n, sum a, sum b, sum ab, sum a2, sum b2) run in
    ONE window pass and the closed form assembles r — identical math
    to pandas ``rolling(...).corr()``.  Pairs with any null are
    excluded from every component (pandas pairwise semantics)."""
    min_periods = min_periods or max(2, window // 2)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(axis_col)
        .rowsBetween(-(window - 1), 0)
    )
    a, b = F.col(a_col), F.col(b_col)
    both = a.isNotNull() & b.isNotNull()
    av = F.when(both, a)
    bv = F.when(both, b)
    n = F.count(av).over(w)
    sa = F.sum(av).over(w)
    sb = F.sum(bv).over(w)
    sab = F.sum(av * bv).over(w)
    saa = F.sum(av * av).over(w)
    sbb = F.sum(bv * bv).over(w)
    cov = sab - sa * sb / n
    var_a = saa - sa * sa / n
    var_b = sbb - sb * sb / n
    r = F.when(
        (n >= min_periods) & (var_a > 0) & (var_b > 0),
        cov / F.sqrt(var_a * var_b),
    )
    return df.withColumn(out_col, r)


def counter_agg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Reset-aware monotonic-counter aggregate per ``every``-sized bin
    (the TimescaleDB ``counter_agg``/``rollup`` analog — public
    semantics; no reference-repo counterpart, diive has no counters).

    A counter is a non-decreasing gauge that occasionally RESETS to ~0
    (process restart, 32-bit wrap).  Per series (``key_cols``) ordered
    by ``axis_col``:

    - ``delta = value - lag(value)``; a negative delta is a reset, and
      the increment credited is ``value`` itself (counter restarted
      from 0 and counted up to ``value``);
    - per bin: ``counter_delta`` = sum of adjusted increments (the
      true amount counted in the bin, resets healed), ``n_resets``,
      ``first``/``last`` raw readings, ``n`` points.

    The increment at a bin's first point uses the PREVIOUS bin's last
    reading (lag crosses bin edges) — counting is attributed to the
    bin where the later reading lands, so bins tile the series total
    exactly.  One per-series window pass + one bin groupBy (single
    shuffle each); no Python.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    v = F.col(value_col)
    prev = F.lag(v).over(w)
    delta = v - prev
    adj = F.when(prev.isNull(), F.lit(0.0)).otherwise(
        F.when(delta < 0, v).otherwise(delta)
    )
    reset = F.when(prev.isNotNull() & (delta < 0), 1).otherwise(0)
    from .resample import with_bin

    stepped = df.withColumn("_inc", adj).withColumn("_reset", reset)
    binned = with_bin(stepped, axis_col, every)
    ax = F.col(axis_col)
    return binned.groupBy(*keys, "bin_start", "bin_end", "bin_label").agg(
        F.count(v).alias("n"),
        F.sum("_inc").alias("counter_delta"),
        F.sum("_reset").alias("n_resets"),
        # anchor ordering masked to REAL readings: a null reading on
        # the bin edge must not become first/last (min_by would return
        # the null itself), since compose_counter's cross-tier
        # min_by(first, first_pos) needs non-null anchors to fold
        F.min_by(v, F.when(v.isNotNull(), ax)).alias("first"),
        F.max_by(v, F.when(v.isNotNull(), ax)).alias("last"),
    )


def ltob_downsample(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Largest-Triangle-One-Bucket downsampling (Steinarsson 2013,
    §4.1 — the bucket-independent sibling of LTTB; public algorithm,
    no reference-repo counterpart): per ``every``-sized bucket keep
    the ONE point forming the largest triangle with its immediate
    neighbors, preserving visual extremes that mean/min/max rollups
    smear.

    Unlike LTTB (whose choice depends on the previously selected
    point, an inherently sequential chain), LTOB ranks each point by
    the triangle area over its ±1 neighbors — two per-series window
    passes (lag/lead, then a per-bucket argmax), fully parallel and
    SQL-expressible, hence oracle-checkable.  Series endpoints (no
    neighbor) rank last but are still kept when alone in a bucket.
    Ties break on the earlier point.  Nulls are dropped first (a gap
    contributes no triangle).
    """
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    x, y = F.col(axis_col).cast("double"), F.col(value_col)
    xp, yp = F.lag(x).over(w), F.lag(y).over(w)
    xn, yn = F.lead(x).over(w), F.lead(y).over(w)
    area = F.abs((xp - xn) * (y - yp) - (xp - x) * (yn - yp)) / 2.0
    from .resample import with_bin

    scored = with_bin(pts.withColumn("_area", area), axis_col, every)
    wb = Window.partitionBy(*keys, "bin_start").orderBy(
        F.col("_area").desc_nulls_last(), F.col(axis_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wb))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_area")
    )


def time_weighted_avg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    method: str = "locf",
    quantized: float | None = None,
) -> DataFrame:
    """Time-weighted average per ``every``-sized bin for IRREGULARLY
    sampled series (the TimescaleDB ``time_weight``/``average`` analog —
    public semantics; diive's resamplers assume a regular grid and
    weight every reading equally, which biases bins toward bursts).

    Each reading is weighted by how long it was "in effect":

    - ``method='locf'``: a reading holds until the next one (step
      function) — weight = time to next reading;
    - ``method='linear'``: trapezoidal — each segment between
      consecutive readings contributes ``(v_i + v_{i+1})/2 * dt``.

    Segments are attributed to the bin of their LEFT endpoint and
    clipped at nothing (segment-granular, like counter_agg's
    convention: bins tile the series exactly — the per-bin sums add up
    to the whole-series integral).  The last reading of a series has
    no following segment and contributes no weight.  Null readings are
    dropped first (a gap ends a segment).  One per-series window pass
    + one bin groupBy; no Python.

    Output per (key..., bin): ``twa`` (integral / duration), ``n``
    readings starting a segment in the bin, ``integral`` and
    ``duration`` partials — which COMPOSE upward losslessly (sum),
    so tier N+1's time-weighted average needs no raw re-scan.

    ``quantized`` (e.g. ``1e6``): per-segment area/duration are
    floored to that scale and summed as INTEGERS — the result is then
    bit-deterministic across partitionings and retries (identical
    tier rebuilds; float sums are order-dependent at the last ulp),
    at a quantization cost of < 1/scale per segment.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method}")
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    x = F.col(axis_col).cast("double")
    v = F.col(value_col)
    dt = F.lead(x).over(w) - x
    seg_v = v if method == "locf" else (v + F.lead(v).over(w)) / 2.0
    seg = pts.withColumn("_dt", dt).withColumn(
        "_area", seg_v * F.col("_dt")
    ).where(F.col("_dt").isNotNull())
    from .resample import with_bin

    binned = with_bin(seg, axis_col, every)
    if quantized is not None:
        s = F.lit(float(quantized))
        area = F.sum(F.floor(F.col("_area") * s).cast("long")) / s
        dur = F.sum(F.floor(F.col("_dt") * s).cast("long")) / s
    else:
        area = F.sum("_area")
        dur = F.sum("_dt")
    return (
        binned.groupBy(*keys, "bin_start", "bin_end", "bin_label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            area.alias("integral"),
            dur.alias("duration"),
        )
        .withColumn("twa", F.col("integral") / F.col("duration"))
    )


def state_agg(
    df: DataFrame,
    every: int,
    state_col: str = "state",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Time-in-state per ``every``-sized bin (the TimescaleDB
    ``state_agg``/``duration_in`` analog — public semantics): a state
    reading holds (locf) until the next reading; per (key..., bin,
    state) emit total held ``duration``, ``n_segments`` starting in
    the bin, and ``n_enter`` transitions INTO the state.

    Same segment convention as :func:`time_weighted_avg` /
    :func:`counter_agg`: a segment belongs to the bin of its left
    endpoint, so per-bin durations tile the series span exactly and
    the partials compose upward (sum) with no raw re-scan.  The last
    reading holds nothing (no following segment).  Null states are
    dropped first.  One window pass + one groupBy; no Python.
    """
    keys = list(key_cols)
    pts = df.where(F.col(state_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    x = F.col(axis_col).cast("double")
    dt = F.lead(x).over(w) - x
    prev_state = F.lag(F.col(state_col)).over(w)
    entered = F.when(
        prev_state.isNull() | (prev_state != F.col(state_col)), 1
    ).otherwise(0)
    seg = (
        pts.withColumn("_dt", dt)
        .withColumn("_enter", entered)
        .where(F.col("_dt").isNotNull())
    )
    from .resample import with_bin

    binned = with_bin(seg, axis_col, every)
    return binned.groupBy(
        *keys, "bin_start", "bin_end", "bin_label", state_col
    ).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("_dt").alias("duration"),
        F.sum("_enter").alias("n_enter"),
    )


def heartbeat_agg(
    df: DataFrame,
    every: int,
    alive_window: float,
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Uptime per ``every``-sized bin from heartbeat events (the
    TimescaleDB ``heartbeat_agg`` analog — public semantics): each
    heartbeat proves liveness for ``alive_window`` axis units, so a
    segment between consecutive heartbeats contributes
    ``min(gap, alive_window)`` covered time and the remainder is
    downtime.

    Same left-endpoint segment convention as the other continuous
    aggregates here (:func:`time_weighted_avg`, :func:`state_agg`):
    per-bin ``uptime``/``downtime`` partials tile the series span
    exactly and compose upward by summing.  The final heartbeat's
    trailing ``alive_window`` is NOT credited (no following segment
    bounds it) — callers wanting it can append a sentinel event.
    Output per (key..., bin): ``n_beats`` (segments starting in the
    bin), ``uptime``, ``downtime``, ``n_gaps`` (segments with dead
    time), ``live_frac``.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    x = F.col(axis_col).cast("double")
    dt = F.lead(x).over(w) - x
    seg = df.withColumn("_dt", dt).where(F.col("_dt").isNotNull())
    up = F.least(F.col("_dt"), F.lit(float(alive_window)))
    from .resample import with_bin

    binned = with_bin(seg, axis_col, every)
    return (
        binned.groupBy(*keys, "bin_start", "bin_end", "bin_label")
        .agg(
            F.count(F.lit(1)).alias("n_beats"),
            F.sum(up).alias("uptime"),
            F.sum(F.col("_dt") - up).alias("downtime"),
            F.sum(
                F.when(F.col("_dt") > alive_window, 1).otherwise(0)
            ).alias("n_gaps"),
        )
        .withColumn(
            "live_frac",
            F.col("uptime") / (F.col("uptime") + F.col("downtime")),
        )
    )


def bin_entropy(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Shannon entropy of the value distribution per ``every``-sized
    bin — for token streams this is the standard degeneration /
    repetition-collapse signal (entropy drops when a model or source
    starts looping; public metric, no reference-repo counterpart:
    diive's stats battery has no distributional health measure).

    Per (key..., bin): ``n`` values, ``n_distinct``, ``entropy``
    (nats, ``ln n - Σ c·ln c / n``), ``top_share`` (modal value's
    frequency share — the quick degeneration tell).

    Two partial-aggregated groupBys — (key, bin, value) counts, then
    (key, bin) — both JVM-side; the alphabet never leaves the
    executors.  Nulls are excluded.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(*keys, *_bin_cols(df, axis_col, every), v.alias("_val"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    c = F.col("_c").cast("double")
    return counts.groupBy(*keys, "bin_start", "bin_end", "bin_label").agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        (
            F.log(F.sum("_c").cast("double"))
            - F.sum(c * F.log(c)) / F.sum("_c").cast("double")
        ).alias("entropy"),
        (F.max("_c").cast("double") / F.sum("_c").cast("double")).alias(
            "top_share"
        ),
    )


def candle_agg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """OHLC candlestick aggregate per ``every``-sized bin (the
    TimescaleDB ``candlestick_agg`` analog — public semantics; no
    reference-repo counterpart: diive's resamplers keep min/max but
    lose which reading came first/last in the bin).

    Per (key..., bin): ``open``/``close`` (value at the earliest /
    latest ``axis_col`` in the bin), ``high``/``low``, ``n`` readings,
    ``volume`` (sum), plus ``open_pos``/``close_pos`` anchors.  Nulls
    are dropped first.  One partial-aggregated groupBy (``min_by`` /
    ``max_by`` carry the anchor through map-side combine) — single
    shuffle, no window, no Python.

    The output is a COMPOSABLE partial: ``compose_candles`` builds
    tier N+1 candles from tier N candles alone (open = open of the
    earliest sub-candle, close = close of the latest, high/low/n/
    volume fold), so coarser tiers never re-scan raw readings.
    """
    from .resample import ohlc_partial_aggs

    keys = list(key_cols)
    v = F.col(value_col)
    ax = F.col(axis_col)
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, *_bin_cols(df, axis_col, every))
        .agg(
            F.count(v).alias("n"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.sum(v).alias("volume"),
            *ohlc_partial_aggs(v, ax),
        )
    )


def compose_candles(
    candles: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Tier N+1 candles from tier N candles only — no raw re-scan.

    open/close follow the earliest/latest sub-candle's anchors (exact:
    the raw arg-min/arg-max reading lives in exactly one sub-candle);
    high/low/n/volume fold associatively.  ``every`` is in raw-axis
    units and must be a multiple of the input tier's bin width.
    """
    from .resample import ohlc_compose_aggs

    keys = list(key_cols)
    b = F.floor(F.col("bin_start") / F.lit(every))
    start = (b * every).cast("long")
    return candles.groupBy(
        *keys,
        start.alias("bin_start"),
        (start + every).cast("long").alias("bin_end"),
        (start + every).cast("long").alias("bin_label"),
    ).agg(
        F.sum("n").alias("n"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("volume").alias("volume"),
        *ohlc_compose_aggs(),
    )


def gauge_agg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Gauge (free-moving metric) aggregate per ``every``-sized bin —
    the TimescaleDB ``gauge_agg`` analog, counter_agg's sibling for
    values that legitimately go DOWN (temperature, queue depth, memory
    in use): no reset healing, deltas are signed.

    Per (key..., bin): ``delta`` = last − first reading *crossing bin
    edges* (the increment at a bin's first point uses the previous
    bin's last reading, so per-bin deltas tile the series total
    exactly, matching counter_agg's convention), ``idelta_left`` /
    ``idelta_right`` = the first / last single-step increment landing
    in the bin, ``rate`` = delta / axis span covered by the bin's
    increments, ``first``/``last`` raw readings, ``n`` points.  Nulls
    are dropped first.  One per-series window pass + one bin groupBy.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    ax = F.col(axis_col)
    pts = df.where(v.isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    prev_v = F.lag(v).over(w)
    prev_x = F.lag(ax).over(w)
    stepped = pts.withColumn(
        "_inc", v - prev_v
    ).withColumn("_dx", (ax - prev_x).cast("double"))
    # ordering masked to non-null increments: min_by/max_by skip rows
    # whose ordering is null, so the series-first point (no previous
    # reading, hence no increment) never claims idelta_left
    inc_ax = F.when(F.col("_inc").isNotNull(), ax)
    return stepped.groupBy(*keys, *_bin_cols(stepped, axis_col, every)).agg(
        F.count(v).alias("n"),
        F.sum("_inc").alias("delta"),
        F.min_by(F.col("_inc"), inc_ax).alias("idelta_left"),
        F.max_by(F.col("_inc"), inc_ax).alias("idelta_right"),
        (F.sum("_inc") / F.sum("_dx")).alias("rate"),
        # axis span covered by the bin's increments — the partial that
        # makes rate compose exactly (compose_gauge: sum(delta)/sum(dx))
        F.sum(F.when(F.col("_inc").isNotNull(), F.col("_dx"))).alias("dx"),
        F.min_by(v, ax).alias("first"),
        F.max_by(v, ax).alias("last"),
    )


def _bin_cols(df: DataFrame, axis_col: str, every: int):
    """bin_start/end/label expressions (groupBy-able without a
    withColumn round trip)."""
    b = F.floor(F.col(axis_col) / F.lit(every))
    start = (b * every).cast("long")
    return [
        start.alias("bin_start"),
        (start + every).cast("long").alias("bin_end"),
        (start + every).cast("long").alias("bin_label"),
    ]


def stats2d_agg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-bin bivariate stats partials + OLS trend (the TimescaleDB
    ``stats_agg`` 2D analog — public semantics; extends the
    reference's whole-series regression, core/dfun/regression.py:6-57,
    to a per-bin composable form).

    Per (key..., bin) over non-null readings of ``(x=axis, y=value)``:
    the six raw partials ``n, sx, sy, sxy, sxx, syy`` plus derived
    ``slope``/``intercept``/``r2`` (closed form; NULL where the bin is
    degenerate: fewer than 2 points or zero x/y variance for r2).

    The partials are PURE SUMS, so they compose upward losslessly —
    ``compose_stats2d`` re-derives tier N+1's trend from tier N
    partials with no raw re-scan (integer axis + integer-quantized
    values make the composition bit-exact; with double values it is
    exact up to float summation order).  One partial-aggregated
    groupBy, single shuffle, no window.
    """
    keys = list(key_cols)
    y = F.col(value_col)
    x = F.col(axis_col)  # rows are pre-filtered to non-null y below
    aggs = [
        F.count(y).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    ]
    part = (
        df.where(y.isNotNull())
        .groupBy(*keys, *_bin_cols(df, axis_col, every))
        .agg(*aggs)
    )
    return _stats2d_derive(part)


def compose_stats2d(
    part: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Tier N+1 bivariate stats from tier N partials only — the six
    sums fold associatively; slope/intercept/r2 re-derive from the
    composed sums, identical to a direct rollup of the raw readings."""
    keys = list(key_cols)
    b = F.floor(F.col("bin_start") / F.lit(every))
    start = (b * every).cast("long")
    agg = part.groupBy(
        *keys,
        start.alias("bin_start"),
        (start + every).cast("long").alias("bin_end"),
        (start + every).cast("long").alias("bin_label"),
    ).agg(*[F.sum(c).alias(c) for c in ("n", "sx", "sy", "sxy", "sxx",
                                        "syy")])
    return _stats2d_derive(agg)


def _stats2d_derive(part: DataFrame) -> DataFrame:
    """slope/intercept/r2 from (n, sx, sy, sxy, sxx, syy) partials —
    the single closed form shared by direct and composed tiers."""
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy          # n^2 * covariance
    varx_n = n * sxx - sx * sx         # n^2 * variance(x)
    vary_n = n * syy - sy * sy
    slope = F.when((F.col("n") >= 2) & (varx_n > 0), cov_n / varx_n)
    intercept = F.when(slope.isNotNull(), (sy - slope * sx) / n)
    r2 = F.when(
        slope.isNotNull() & (vary_n > 0),
        (cov_n * cov_n) / (varx_n * vary_n),
    )
    return (
        part.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .withColumn("r2", r2)
    )


def topk_agg(
    df: DataFrame,
    every: int,
    k: int = 3,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Top-k most frequent values per ``every``-sized bin (the modal
    tokens of the stream — pairs with :func:`bin_entropy`: entropy says
    HOW degenerate a bin is, topk_agg says WHAT it is degenerating
    into).

    Exact: one (key, bin, value) count groupBy (map-side combined; the
    alphabet never leaves the executors) + a per-(key, bin) window over
    the already-tiny count table.  Ties break on the smaller value.
    Returns one row per (key..., bin, rank<=k): ``value, cnt, share``.
    At corpus scale the count table is bounded by the per-bin alphabet,
    not the reading count, so the window input stays small; for
    unbounded alphabets cap with a Misra-Gries pre-filter upstream.
    Nulls are excluded.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(*keys, *_bin_cols(df, axis_col, every), v.alias("value_k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*keys, "bin_start").orderBy(
        F.col("cnt").desc(), F.col("value_k").asc()
    )
    tot = Window.partitionBy(*keys, "bin_start")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "share", F.col("cnt").cast("double") / F.sum("cnt").over(tot)
        )
        .where(F.col("rank") <= k)
    )


def arrival_stats(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-bin sampling-health stats from inter-arrival deltas — the
    per-bin companion of :func:`timegrid.detect_freq` (which votes one
    frequency per series; this surfaces WHERE the cadence drifts or
    stutters).

    ``dt`` = axis gap from the previous non-null reading (crossing bin
    edges, counter_agg's convention).  Per (key..., bin): ``n_dt``,
    ``dt_median`` / ``dt_p95`` (exact percentiles), ``dt_max`` and
    ``jitter`` (population sd of dt — 0 on a perfect grid).  One
    window pass + one groupBy.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    dt = (F.col(axis_col) - F.lag(axis_col).over(w)).cast("double")
    stepped = pts.withColumn("_dt", dt).where(F.col("_dt").isNotNull())
    d = F.col("_dt")
    return stepped.groupBy(*keys, *_bin_cols(stepped, axis_col, every)).agg(
        F.count(d).alias("n_dt"),
        F.percentile(d, F.lit(0.5)).alias("dt_median"),
        F.percentile(d, F.lit(0.95)).alias("dt_p95"),
        F.max(d).alias("dt_max"),
        F.stddev_pop(d).alias("jitter"),
    )


def acf_agg(
    df: DataFrame,
    every: int,
    lag: int = 1,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-bin lag-``lag`` autocorrelation of the value stream — the
    periodicity tell that completes the degeneration battery
    (:func:`bin_entropy` = how compressed, :func:`topk_agg` = into
    what, acf = is it LOOPING): a token stream stuck in an n-cycle
    shows acf(lag=n) near 1.

    Pairs each reading with the reading ``lag`` rows earlier in the
    same series (window lag over non-null readings), attributes the
    pair to the LATER reading's bin, and computes the per-bin sample
    Pearson correlation (Spark ``corr``; pairs with any null are
    excluded — pandas pairwise semantics).  One window pass + one
    groupBy.
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    stepped = pts.withColumn("_prev", F.lag(v, lag).over(w))
    # corr assembled from guarded component sums, NOT F.corr: under ANSI
    # mode (the session default) F.corr throws DIVIDE_BY_ZERO on a
    # zero-variance bin — exactly the constant-token degenerate stream
    # this operator hunts (same trap rolling_correlation and
    # fits.py:261-267 avoid); the guard yields NULL there, matching
    # DuckDB's corr
    a = F.when(F.col("_prev").isNotNull(), v)
    b = F.when(v.isNotNull(), F.col("_prev"))
    agg = stepped.groupBy(*keys, *_bin_cols(stepped, axis_col, every)).agg(
        F.count(a).alias("n_pairs"),
        F.sum(a).alias("_sa"), F.sum(b).alias("_sb"),
        F.sum(a * b).alias("_sab"),
        F.sum(a * a).alias("_saa"), F.sum(b * b).alias("_sbb"),
    )
    n = F.col("n_pairs").cast("double")
    sa, sb = F.col("_sa"), F.col("_sb")
    cov_n = n * F.col("_sab") - sa * sb
    vara_n = n * F.col("_saa") - sa * sa
    varb_n = n * F.col("_sbb") - sb * sb
    acf = F.when(
        (F.col("n_pairs") >= 2) & (vara_n > 0) & (varb_n > 0),
        cov_n / F.sqrt(vara_n * varb_n),
    )
    return agg.withColumn("acf", acf).drop(
        "_sa", "_sb", "_sab", "_saa", "_sbb"
    )


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013
    §4.2 — THE canonical visual downsampler): reduce each series to
    ``n_out`` points, always keeping the endpoints; per interior
    bucket keep the point forming the largest triangle with the
    PREVIOUSLY SELECTED point and the NEXT bucket's average.

    The previous-selection dependency makes LTTB inherently sequential
    along a series, so unlike :func:`ltob_downsample` (the parallel,
    oracle-checkable sibling — prefer it when buckets are independent)
    this runs as a numpy kernel per series via ``applyInPandas``:
    series are independent, so the job still parallelizes across the
    (source, doc_id) keys — the standard Spark shape for per-series
    sequential algorithms (same contract as the LOF kernel,
    lof.py:37).  Requires one series to fit a worker's memory: a doc's
    token stream is bounded by n_tok, which holds by construction for
    the tokens payload.  Null values are dropped first.
    """
    if n_out < 2:
        raise ValueError(f"n_out must be >= 2, got {n_out}")
    keys = list(key_cols)
    import numpy as np
    import pandas as pd

    out_schema = df.select(*keys, axis_col, value_col).schema

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[value_col]).sort_values(axis_col)
        n = len(pdf)
        if n <= n_out:
            return pdf[[*keys, axis_col, value_col]]
        x = pdf[axis_col].to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        # bucket edges over the interior points (endpoints pinned)
        edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        sel = [0]
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = edges[b + 1], (n if b == n_out - 3 else edges[b + 2])
            ax_, ay_ = x[sel[-1]], y[sel[-1]]        # previous selected
            bx, by = x[nlo:nhi].mean(), y[nlo:nhi].mean()  # next bucket avg
            area = np.abs(
                (ax_ - bx) * (y[lo:hi] - ay_) - (ax_ - x[lo:hi]) * (by - ay_)
            )
            sel.append(lo + int(area.argmax()))
        sel.append(n - 1)
        return pdf.iloc[sel][[*keys, axis_col, value_col]]

    return (
        df.select(*keys, axis_col, value_col)
        .groupBy(*keys)
        .applyInPandas(_kernel, schema=out_schema)
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    quantized: float | None = None,
) -> DataFrame:
    """Single changepoint estimate per series via the classic CUSUM
    argmax (Page 1954 / Pettitt-style location estimate — public
    semantics; diive has no changepoint operator, the closest analog is
    its stepwise screening which flags points, not level shifts).

    Per series (``key_cols``), over the non-null readings ordered by
    ``axis_col``: ``S_t = sum_{i<=t}(x_i - xbar)``; the changepoint
    estimate is ``t* = argmax_t |S_t|`` (tie -> smallest t), the split
    that maximizes the evidence of a mean shift.  Emits the pre/post
    means and the normalized statistic ``s_max / n`` alongside.

    ``quantized=q`` accumulates ``floor(x*q)`` as exact longs so every
    cumulative sum — and therefore the argmax — is bit-deterministic
    across partition counts and engines (driver-oracle safe); without
    it double summation order can flip ties at round-6 boundaries.

    One window pass (single sort per series) + one groupBy; no Python.
    At 100 TB the window partitions by series key — the same shuffle
    the tier rollups already use; state per row is O(1).
    """
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    if quantized:
        q = float(quantized)
        vq = F.floor(v * F.lit(q)).cast("long")
    else:
        q = 1.0
        vq = v
    wfull = Window.partitionBy(*keys)
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(axis_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy(*keys).orderBy(axis_col)
    enriched = (
        pts.withColumn("_vq", vq)
        .withColumn("_n", F.count("_vq").over(wfull))
        .withColumn("_tot", F.sum("_vq").over(wfull))
        .withColumn("_k", F.row_number().over(wrn))
        .withColumn("_cum", F.sum("_vq").over(wcum))
        .withColumn(
            "_s",
            F.col("_cum").cast("double")
            - F.col("_k") * F.col("_tot").cast("double") / F.col("_n"),
        )
    )
    # argmax |S_t|, tie -> smallest axis position
    pick = F.struct(
        F.abs(F.col("_s")).alias("a"), (-F.col("_k")).alias("nk")
    )
    payload = F.struct(
        F.col(axis_col).cast("long").alias("t_star"),
        F.col("_k").alias("k"),
        F.col("_cum").alias("cum"),
        F.abs(F.col("_s")).alias("s_abs"),
    )
    out = enriched.groupBy(*keys).agg(
        F.max("_n").alias("n"),
        F.max("_tot").alias("_tot"),
        F.max_by(payload, pick).alias("_p"),
    )
    k = F.col("_p.k").cast("double")
    n = F.col("n").cast("double")
    cum = F.col("_p.cum").cast("double")
    tot = F.col("_tot").cast("double")
    return out.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("_p.t_star").alias("t_star"),
        (F.col("_p.s_abs") / F.lit(q) / n).alias("s_max_norm"),
        (cum / k / F.lit(q)).alias("mean_before"),
        F.when(
            F.col("_p.k") < F.col("n"), (tot - cum) / (n - k) / F.lit(q)
        ).alias("mean_after"),
    )


def m4_downsample(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """M4 width-bounded downsampling (Jugel et al., VLDB 2014 — public
    semantics): per ``every``-sized bin keep the first, last, min and
    max readings — the exact set that makes a line plot at that
    resolution pixel-identical to the full series.  The per-bin
    companion of :func:`lttb_downsample`/``ltob``: M4 is a pure
    groupBy aggregate (composable, shuffle = one bin agg, no Python),
    LTTB is sequential per series.

    Emits ONE row per (key..., bin) with the four (t, v) pairs —
    deterministic tie-breaks: min/max value ties resolve to the
    SMALLEST position; first/last use the position order itself.
    """
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    x = F.col(axis_col).cast("long")
    v = F.col(value_col).cast("double")
    b = (F.floor(x / F.lit(int(every))) * int(every)).cast("long")
    return (
        pts.select(*keys, b.alias("bin_start"), x.alias("_x"), v.alias("_v"))
        .groupBy(*keys, "bin_start")
        .agg(
            F.count("_v").cast("long").alias("n"),
            F.min("_x").alias("t_first"),
            F.min_by("_v", "_x").alias("v_first"),
            F.max("_x").alias("t_last"),
            F.max_by("_v", "_x").alias("v_last"),
            F.min("_v").alias("v_min"),
            F.min_by("_x", F.struct(F.col("_v"), F.col("_x"))).alias("t_min"),
            F.max("_v").alias("v_max"),
            F.min_by("_x", F.struct(-F.col("_v"), F.col("_x"))).alias("t_max"),
        )
    )


def savgol_coeffs(window: int, polyorder: int, deriv: int = 0) -> list[float]:
    """Savitzky-Golay convolution coefficients (Savitzky & Golay 1964,
    public closed form): least-squares fit of a degree-``polyorder``
    polynomial over ``window`` points, evaluated (or differentiated
    ``deriv`` times) at the center.  Pure numpy pinv of the Vandermonde
    system — deterministic, computed once on the driver.
    """
    import numpy as np

    if window % 2 != 1 or window < 3:
        raise ValueError("window must be odd >= 3")
    if polyorder >= window:
        raise ValueError("polyorder must be < window")
    h = window // 2
    offsets = np.arange(-h, h + 1, dtype=np.float64)
    a = np.vander(offsets, polyorder + 1, increasing=True)
    c = np.linalg.pinv(a)[deriv] * math.factorial(deriv)
    return [float(x) for x in c]


def savgol_smooth(
    df: DataFrame,
    window: int = 7,
    polyorder: int = 2,
    deriv: int = 0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    out_col: str = "smoothed",
) -> DataFrame:
    """Savitzky-Golay smoothing / smoothed derivative per series: the
    windowed convolution with :func:`savgol_coeffs` (public 1964
    semantics; diive smooths with rolling means —
    core/dfun/frames.py:728-747 — SG preserves peak shape and gives
    noise-robust derivatives at the same cost).

    Emitted only where the FULL window is present (edges and any
    window touching a null reading yield null — nulls propagate
    through the fixed-order sum naturally).  The sum is written as a
    fixed left-to-right chain of lag/lead terms, so the double
    arithmetic is order-stable across engines and partitionings
    (driver-oracle safe).  One window pass per series, O(window) state
    per row, no Python at execution time.
    """
    keys = list(key_cols)
    coeffs = savgol_coeffs(window, polyorder, deriv)
    h = window // 2
    w = Window.partitionBy(*keys).orderBy(axis_col)
    v = F.col(value_col).cast("double")
    expr = None
    for j, c in enumerate(coeffs):
        off = j - h
        if off < 0:
            term = F.lag(v, -off).over(w)
        elif off > 0:
            term = F.lead(v, off).over(w)
        else:
            term = v
        piece = F.lit(c) * term
        expr = piece if expr is None else expr + piece
    return df.withColumn(out_col, expr)


def interpolated_tw_avg(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    method: str = "locf",
    quantized: float | None = None,
) -> DataFrame:
    """Time-weighted average per ``every``-sized bin with INTERPOLATED
    bin edges (the TimescaleDB ``interpolated_average`` analog — public
    semantics): unlike :func:`time_weighted_avg`, which attributes each
    inter-reading segment wholly to the bin of its left endpoint, here
    every segment is SPLIT across the bins it spans — the value in
    effect at a bin boundary carries over from the previous reading
    even when that reading lives in an earlier bin.  Sparse series
    therefore get credit in every bin they cover, and per-bin integrals
    tile the series span exactly under both conventions.

    - ``method='locf'``: the left reading holds across the whole
      segment; a bin's share is ``v_i * overlap``.
    - ``method='linear'``: the segment interpolates ``v_i -> v_{i+1}``;
      a bin's share is the trapezoid over the clipped sub-segment.

    ``axis_col`` must be integral (sequence positions / epoch seconds);
    bin membership is computed in exact integer arithmetic.  The bins a
    segment covers are exactly the output rows it produces, so the
    explode is bounded by the result size (never an amplification
    beyond the materialized grid).  ``quantized=q`` sums
    ``floor(share*q)`` as exact longs for bit-deterministic results
    across engines/partitionings.

    Output per (key..., bin_start): ``n`` sub-segments, ``integral``,
    ``covered`` duration, ``itwa`` = integral/covered, and ``fb_avg`` =
    integral/every (the full-bin-width mean TimescaleDB reports).
    One window pass + explode + one groupBy; no Python.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method}")
    keys = list(key_cols)
    e = int(every)
    pts = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy("_x")
    x = F.col(axis_col).cast("long")
    v = F.col(value_col).cast("double")
    seg = (
        pts.select(*keys, x.alias("_x"), v.alias("_v"))
        .withColumn("_x2", F.lead("_x").over(w))
        .withColumn("_v2", F.lead("_v").over(w))
        .where(F.col("_x2").isNotNull())
    )
    b_lo = F.floor(F.col("_x") / e).cast("long")
    b_hi = F.floor((F.col("_x2") - 1) / e).cast("long")
    covered = seg.select(
        *keys, "_x", "_v", "_x2", "_v2",
        F.explode(F.sequence(b_lo, b_hi)).alias("_b"),
    )
    a = F.greatest(F.col("_x"), F.col("_b") * e)
    bnd = F.least(F.col("_x2"), (F.col("_b") + 1) * e)
    dtc = (bnd - a).cast("double")
    if method == "locf":
        share = F.col("_v") * dtc
    else:
        dt = (F.col("_x2") - F.col("_x")).cast("double")
        slope = (F.col("_v2") - F.col("_v")) / dt
        va = F.col("_v") + slope * (a - F.col("_x")).cast("double")
        vb = F.col("_v") + slope * (bnd - F.col("_x")).cast("double")
        share = (va + vb) / 2.0 * dtc
    if quantized:
        q = float(quantized)
        share_acc = F.floor(share * F.lit(q)).cast("long")
        dt_acc = (bnd - a).cast("long")
        descale = lambda c: c.cast("double") / F.lit(q)  # noqa: E731
        dt_descale = lambda c: c.cast("double")  # noqa: E731
    else:
        share_acc, dt_acc = share, dtc
        descale = dt_descale = lambda c: c  # noqa: E731
    agg = (
        covered.select(
            *keys,
            (F.col("_b") * e).alias("bin_start"),
            share_acc.alias("_sh"),
            dt_acc.alias("_dt"),
        )
        .groupBy(*keys, "bin_start")
        .agg(
            F.count("_sh").cast("long").alias("n"),
            F.sum("_sh").alias("_integral"),
            F.sum("_dt").alias("_covered"),
        )
    )
    integral = descale(F.col("_integral"))
    cov = dt_descale(F.col("_covered"))
    return agg.select(
        *keys, "bin_start", "n",
        integral.alias("integral"),
        cov.alias("covered"),
        (integral / cov).alias("itwa"),
        (integral / F.lit(float(e))).alias("fb_avg"),
    )


def freq_sketch(
    df: DataFrame,
    every: int,
    k: int = 5,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Mergeable Misra-Gries top-k frequency sketch per ``every``-sized
    bin (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
    "Mergeable Summaries" — the TimescaleDB ``freq_agg`` analog; diive
    has no frequency operator, its histogram is value-range based).

    Tier-1 construction from EXACT per-bin counts (the groupBy is
    map-side combined and bounded by the per-bin alphabet, so raw
    readings never shuffle): rank values by (count desc, value asc),
    let ``c* = count of the (k+1)-th value`` (0 if fewer), keep the
    top k with ``counter = count - c*`` (drop zeros), ``err = c*``.

    Guarantee carried at EVERY tier: for any value ``v``,
    ``counter(v) <= true_count(v) <= counter(v) + err`` (absent values
    have counter 0), and ``err <= (n - sum(counters)) / (k+1)``.
    :func:`compose_freq` merges child sketches into parent bins
    without rescanning raw data and preserves both bounds.

    All quantities are integers with pinned tie-breaks, so the sketch
    is bit-deterministic across engines and partitionings (a DuckDB
    twin can replay it — a full-value oracle, not just invariants).

    Returns LONG form: one row per kept counter —
    (key..., bin_start, n, err, value, counter).  The rank-1 row is
    kept even when its counter prunes to 0 (all top k+1 counts equal),
    so every non-empty bin keeps its (n, err) through composition.
    """
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    b = (F.floor(F.col(axis_col).cast("long") / int(every)) * int(every)).cast(
        "long"
    )
    cnt = (
        pts.select(*keys, b.alias("bin_start"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "bin_start", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    wbin = Window.partitionBy(*keys, "bin_start")
    wrank = wbin.orderBy(F.desc("_c"), F.asc("_v"))
    ranked = (
        cnt.withColumn("_rk", F.row_number().over(wrank))
        .withColumn("_n", F.sum("_c").over(wbin))
        .withColumn(
            "_cstar",
            F.max(F.when(F.col("_rk") == k + 1, F.col("_c"))).over(wbin),
        )
    )
    cstar = F.coalesce(F.col("_cstar"), F.lit(0))
    return (
        ranked.where(
            (F.col("_rk") <= k)
            & ((F.col("_c") - cstar > 0) | (F.col("_rk") == 1))
        )
        .select(
            *keys,
            "bin_start",
            F.col("_n").cast("long").alias("n"),
            cstar.cast("long").alias("err"),
            F.col("_v").alias("value"),
            (F.col("_c") - cstar).cast("long").alias("counter"),
        )
    )


def compose_freq(
    sketch: DataFrame,
    every: int,
    k: int = 5,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`freq_sketch` bins into ``every``-sized parent
    bins WITHOUT rescanning raw data (Agarwal et al. 2012 MG merge):
    sum counters pointwise, sum child error bounds, then prune back to
    k by subtracting the (k+1)-th largest merged counter ``c*`` and
    adding it to the error.  Both sketch guarantees are preserved
    (containment, and err <= (n - sum counters)/(k+1) — each of the
    top k+1 merged counters gives up exactly c*, so the slack grows by
    at least (k+1)c* while err grows by c*).

    Same long form in and out, so tiers chain raw -> t1 -> t2 -> ...
    with one tiny shuffle per level (rows are bounded by k per child
    bin, never by readings).
    """
    keys = list(key_cols)
    pb, _ = _parent_bin(every)
    child = sketch.withColumn("_pb", pb)
    # one (n, err) row per child bin, then totals per parent bin
    per_child = (
        child.groupBy(*keys, "_pb", "bin_start")
        .agg(F.max("n").alias("_n"), F.max("err").alias("_e"))
        .groupBy(*keys, "_pb")
        .agg(F.sum("_n").cast("long").alias("n"),
             F.sum("_e").cast("long").alias("E"))
    )
    merged = (
        child.groupBy(*keys, "_pb", "value")
        .agg(F.sum("counter").alias("_c"))
    )
    wbin = Window.partitionBy(*keys, "_pb")
    wrank = wbin.orderBy(F.desc("_c"), F.asc("value"))
    ranked = merged.withColumn("_rk", F.row_number().over(wrank)).withColumn(
        "_cstar", F.max(F.when(F.col("_rk") == k + 1, F.col("_c"))).over(wbin)
    )
    cstar = F.coalesce(F.col("_cstar"), F.lit(0))
    kept = ranked.where(
        (F.col("_rk") <= k) & ((F.col("_c") - cstar > 0) | (F.col("_rk") == 1))
    ).select(
        *keys,
        F.col("_pb"),
        "value",
        (F.col("_c") - cstar).cast("long").alias("counter"),
        cstar.cast("long").alias("_cs"),
    )
    return kept.join(per_child, [*keys, "_pb"]).select(
        *keys,
        F.col("_pb").alias("bin_start"),
        "n",
        (F.col("E") + F.col("_cs")).cast("long").alias("err"),
        "value",
        "counter",
    )


def holt_smooth(
    df: DataFrame,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 1,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Holt double-exponential (linear-trend) smoothing per series
    (Holt 1957 / Hyndman & Athanasopoulos FPP §7.2 — public method;
    diive has no forecaster, its trend tooling is fit-based).

    State ``(level, trend)`` with the standard explicit init
    ``l_2 = x_2, b_2 = x_2 - x_1`` and for t >= 3::

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    The one-step-ahead squared errors accumulate alongside, so the fit
    quality (RMSE) comes out of the same pass.  Computed as an EXACT
    left fold with a struct accumulator over the per-series value
    array (``aggregate`` over an ``array_sort``-ordered collect; same
    fold on a SQL engine via ``list_reduce`` over a ``list_prepend``
    seeded struct list), so results are bit-deterministic across
    engines and partitionings — oracle-checkable.

    One groupBy shuffle; per-series state is the value array (bounded
    by series length — token streams are n_tok-capped; for unbounded
    series use an applyInPandas kernel, the ewma_chart precedent).
    Emits per series: ``n, level, trend, forecast`` (= level +
    horizon*trend) and ``rmse`` over the n-2 one-step forecasts
    (null when n < 3; all outputs null when n < 2).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    keys = list(key_cols)
    a, be = float(alpha), float(beta)
    pts = df.where(F.col(value_col).isNotNull())
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(axis_col).cast("long").alias("p"),
                F.col(value_col).cast("double").alias("x"),
            )
        )
    )
    g = pts.groupBy(*keys).agg(arr.alias("_arr"))
    vals = F.transform(F.col("_arr"), lambda s: s["x"])
    g = g.withColumn("_v", vals).withColumn("_n", F.size("_v")).drop("_arr")
    x1 = F.element_at(F.col("_v"), 1)
    x2 = F.element_at(F.col("_v"), 2)
    init = F.struct(
        x2.alias("l"), (x2 - x1).alias("b"), F.lit(0.0).alias("sse")
    )
    rest = F.expr("slice(_v, 3, greatest(size(_v) - 2, 0))")

    def step(acc, x):
        new_l = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        new_b = F.lit(be) * (new_l - acc["l"]) + F.lit(1.0 - be) * acc["b"]
        err = x - (acc["l"] + acc["b"])
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            (acc["sse"] + err * err).alias("sse"),
        )

    state = F.aggregate(rest, init, step)
    n = F.col("_n")
    out = g.withColumn("_st", F.when(n >= 2, state))
    lvl = F.col("_st")["l"]
    trd = F.col("_st")["b"]
    return out.select(
        *keys,
        n.cast("long").alias("n"),
        lvl.alias("level"),
        trd.alias("trend"),
        (lvl + F.lit(float(horizon)) * trd).alias("forecast"),
        F.when(
            n >= 3, F.sqrt(F.col("_st")["sse"] / (n - 2).cast("double"))
        ).alias("rmse"),
    )


def theil_sen_bins(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Theil-Sen robust trend per ``every``-sized bin (Theil 1950 /
    Sen 1968 — public estimator; diive fits trends by least squares,
    e.g. pkgs/fits — the median-of-pairwise-slopes estimator tolerates
    up to ~29% outliers and needs no residual screening).

    Per (key..., bin): ``slope`` = exact median of the (n choose 2)
    pairwise slopes ``(v_j - v_i) / (x_j - x_i)`` and ``intercept`` =
    exact median of ``v_i - slope * x_i`` (second pass with the bin's
    slope joined back).  Bins with < 2 readings are omitted.

    The pair join is an equi-join on (key, bin) — within-bin pairs
    only, O(m²) per bin where m is bounded by ``every`` (never by the
    table), so partitions stay balanced at any scale; the classic
    global-regression alternative would put the whole series in one
    task.  Exact ``percentile(0.5)`` (sorted interpolation) matches
    SQL engines' ``quantile_cont`` bit-for-bit on identical doubles.
    """
    keys = list(key_cols)
    e = int(every)
    pts = df.where(F.col(value_col).isNotNull()).select(
        *keys,
        (F.floor(F.col(axis_col).cast("long") / e) * e)
        .cast("long")
        .alias("bin_start"),
        F.col(axis_col).cast("long").alias("_x"),
        F.col(value_col).cast("double").alias("_v"),
    )
    a = pts.alias("a")
    b = pts.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys] + [
        F.col("a.bin_start") == F.col("b.bin_start"),
        F.col("a._x") < F.col("b._x"),
    ]
    pairs = a.join(b, on).select(
        *[F.col(f"a.{k}").alias(k) for k in keys],
        F.col("a.bin_start").alias("bin_start"),
        (
            (F.col("b._v") - F.col("a._v"))
            / (F.col("b._x") - F.col("a._x")).cast("double")
        ).alias("_slope"),
    )
    slopes = pairs.groupBy(*keys, "bin_start").agg(
        F.count("_slope").cast("long").alias("n_pairs"),
        F.percentile("_slope", F.lit(0.5)).alias("slope"),
    )
    joined = pts.join(slopes, [*keys, "bin_start"])
    return joined.groupBy(*keys, "bin_start").agg(
        F.count("_v").cast("long").alias("n"),
        F.max("n_pairs").alias("n_pairs"),
        F.max("slope").alias("slope"),
        F.percentile(
            F.col("_v") - F.col("slope") * F.col("_x").cast("double"),
            F.lit(0.5),
        ).alias("intercept"),
    )


def asap_smooth(
    df: DataFrame,
    max_window_frac: float = 0.1,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """ASAP automatic smoothing (Rong & Bailis, VLDB 2017 — public
    algorithm): pick the moving-average window that MINIMIZES
    roughness (std of the smoothed series' first differences) subject
    to PRESERVING kurtosis (smoothed kurtosis >= raw kurtosis, so real
    spikes survive while noise is ironed out).  Candidate windows come
    from autocorrelation peaks (periodicity-aligned windows smooth
    best), plus a small geometric grid as fallback — a faithful
    simplification of the paper's search (no incremental-update
    pruning; candidate count is tiny so the exhaustive scan is cheap).

    Sequential per series (window choice depends on the whole series),
    so it runs as a numpy kernel via ``applyInPandas`` — parallel
    ACROSS series, the LTTB/LOF contract: one series per worker,
    bounded by n_tok for token streams.  Emits the smoothed points
    (trailing window-mean at each position >= window-1) plus the
    chosen ``window`` per row; nulls are dropped first.
    """
    keys = list(key_cols)
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            T.StructField("pos", T.LongType()),
            T.StructField("smoothed", T.DoubleType()),
            T.StructField("window", T.IntegerType()),
        ]
    )

    frac = float(max_window_frac)

    def _kurt(x: np.ndarray) -> float:
        m = x.mean()
        d = x - m
        v = (d * d).mean()
        if v <= 0:
            return 0.0
        return float((d**4).mean() / (v * v))

    def _roughness(x: np.ndarray) -> float:
        return float(np.diff(x).std()) if x.size > 1 else 0.0

    def _sma(x: np.ndarray, w: int) -> np.ndarray:
        c = np.cumsum(np.concatenate(([0.0], x)))
        return (c[w:] - c[:-w]) / w

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.dropna(subset=[value_col]).sort_values(axis_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        pos = pdf[axis_col].to_numpy(dtype=np.int64)
        n = x.size
        key_vals = {k: pdf[k].iloc[0] for k in keys} if n else {}
        max_w = max(int(n * frac), 2)
        if n < 4 or max_w < 2:
            return pd.DataFrame(
                {**key_vals, "pos": pos, "smoothed": x,
                 "window": np.ones(n, dtype=np.int32)}
            ) if n else pd.DataFrame(
                columns=[*keys, "pos", "smoothed", "window"]
            )
        # ACF peaks up to max_w lags
        d = x - x.mean()
        denom = float((d * d).sum())
        cands = set()
        if denom > 0:
            acf = np.array(
                [(d[k:] * d[:-k]).sum() / denom
                 for k in range(1, max_w + 1)]
            )
            for k in range(1, len(acf) - 1):
                if acf[k] > acf[k - 1] and acf[k] > acf[k + 1] and acf[k] > 0.2:
                    cands.add(k + 1)  # lag k -> window k+1
        w = 2
        while w <= max_w:  # geometric fallback grid
            cands.add(w)
            w = int(math.ceil(w * 1.5))
        kurt0 = _kurt(x)
        best_w, best_r = 1, _roughness(x)
        for w in sorted(cands):
            if w < 2 or w > max_w:
                continue
            sm = _sma(x, w)
            if _kurt(sm) >= kurt0 and _roughness(sm) < best_r:
                best_w, best_r = w, _roughness(sm)
        if best_w == 1:
            sm, p = x, pos
        else:
            sm, p = _sma(x, best_w), pos[best_w - 1:]
        return pd.DataFrame(
            {**key_vals, "pos": p, "smoothed": sm,
             "window": np.full(p.size, best_w, dtype=np.int32)}
        )

    return (
        df.select(*keys, axis_col, value_col)
        .groupBy(*keys)
        .applyInPandas(_kernel, schema=out_schema)
    )


def ddsketch_bucket_cols(v, gamma: float):
    """The DDSketch (sign, bucket) store expressions for a value column
    — the single shared implementation behind the batch
    (:func:`ddsketch_agg`) and streaming (``stream_ddsketch_partials``)
    faces, so the bucket formula cannot drift between them."""
    sign = (
        F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    ).cast("int")
    bucket = F.when(v == 0, F.lit(0)).otherwise(
        F.ceil(F.log(F.abs(v)) / math.log(float(gamma)))
    ).cast("int")
    return sign, bucket


def ddsketch_agg(
    df: DataFrame,
    every: int,
    gamma: float = 1.02,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Relative-error quantile sketch per ``every``-sized bin — the
    DDSketch log-binned store (Masson, Rim & Lee, VLDB 2019), the
    heavy-tail complement to the fixed-width histogram sketch
    (``bucket_rollup(hist_*)`` guarantees ABSOLUTE error = one bin
    width; this guarantees RELATIVE error <= (gamma-1)/(gamma+1) at
    every quantile, independent of the value range).

    Store = exact counts over logarithmic value buckets
    ``bucket = ceil(ln|v| / ln gamma)`` with a mirrored negative store
    and a zero store (``sign`` in {-1, 0, 1}), i.e. the full-fidelity
    variant: no bucket collapsing, so composition is EXACT, not just
    guarantee-preserving.  Long form out: one row per
    (key..., bin_start, sign, bucket) with its count — the same
    tier-table shape as :func:`freq_sketch`, mergeable by plain
    ``groupBy().sum()`` (:func:`compose_ddsketch`), so tiers chain
    raw -> 1m -> 1h -> 1d with one tiny shuffle per level and zero
    raw re-scans above tier 1.

    100 TB shape: the tier-1 groupBy is map-side combined and bounded
    per bin by the distinct-bucket count (<= ~1,160 buckets span
    1e-5..1e5 at gamma=1.02), so raw readings never shuffle; parent
    tiers shuffle only (key, bin, sign, bucket, cnt) rows.  Nulls are
    dropped (gap convention — their count lives in the rollup's n).
    """
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    b = (F.floor(F.col(axis_col).cast("long") / int(every)) * int(every)).cast(
        "long"
    )
    sign, bucket = ddsketch_bucket_cols(v, gamma)
    return (
        pts.select(
            *keys,
            b.alias("bin_start"),
            sign.alias("sign"),
            bucket.alias("bucket"),
        )
        .groupBy(*keys, "bin_start", "sign", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def compose_ddsketch(
    sketch: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`ddsketch_agg` bins into ``every``-sized parent
    bins WITHOUT rescanning raw data.  Log buckets are value-determined
    (independent of binning), so the merge is a plain count sum and the
    composed sketch is BIT-IDENTICAL to one built directly at the
    parent resolution — exact composition, same long form in and out."""
    keys = list(key_cols)
    pb, _ = _parent_bin(every)
    return (
        sketch.withColumn("bin_start", pb)
        .groupBy(*keys, "bin_start", "sign", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def ddsketch_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    gamma: float = 1.02,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Quantile estimates from a :func:`ddsketch_agg` store: per
    (key..., bin_start) and each q in *qs*, the estimate for the exact
    order statistic ``x_(ceil(q*n))`` (``x_(1)`` at q=0).

    Buckets sort in true value order via (sign, sign*bucket); the
    estimate for a non-zero bucket is the bucket's log-midpoint
    ``sign * 2*gamma^bucket / (gamma+1)``, which carries the DDSketch
    guarantee ``|est - x| / |x| <= (gamma-1)/(gamma+1)`` for every
    point x the bucket holds; the zero store estimates 0 exactly.
    One ordered window per (key, bin) over bucket rows (never
    readings) — O(buckets) state, no SinglePartition."""
    keys = list(key_cols)
    wbin = Window.partitionBy(*keys, "bin_start")
    word = wbin.orderBy(F.asc("sign"), F.asc(F.col("sign") * F.col("bucket")))
    g = float(gamma)
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * F.lit(2.0)
        * F.pow(F.lit(g), F.col("bucket"))
        / F.lit(g + 1.0)
    )
    cum = (
        sketch.withColumn("_cum", F.sum("cnt").over(
            word.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("_n", F.sum("cnt").over(wbin))
        .withColumn("_est", est)
    )
    picks = []
    for q in qs:
        qq = float(q)
        rank = F.greatest(
            F.lit(1), F.ceil(F.lit(qq) * F.col("_n")).cast("long")
        )
        hit = cum.where(
            (F.col("_cum") >= rank) & (F.col("_cum") - F.col("cnt") < rank)
        )
        picks.append(
            hit.select(
                *keys,
                "bin_start",
                F.lit(qq).alias("q"),
                F.col("_n").cast("long").alias("n"),
                F.col("_est").alias("est"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def collapse_ddsketch(
    sketch: DataFrame,
    level: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Bound a :func:`ddsketch_agg` store's per-bin state by collapsing
    bucket pairs *level* times (UDDSketch uniform collapse — Epicoco,
    Melle, Pulimeno & Aloisio 2020): bucket ``b -> ceil(b / 2^level)``,
    which squares gamma per step, so the collapsed store is a valid
    DDSketch at ``gamma' = gamma^(2^level)`` with the matching
    relative-error bound ``(gamma'-1)/(gamma'+1)`` — degraded but still
    GUARANTEED, never silently wrong.  Iterated pair-collapse equals
    the one-shot ceiling (integer ceil composes), so collapsing is
    associative with :func:`compose_ddsketch`: collapse-then-merge ==
    merge-then-collapse, and stores collapsed to the same level merge
    exactly.  Query the result with
    ``ddsketch_quantiles(..., gamma=gamma**(2**level))``.

    100 TB shape: a pure column expression + the same count-sum groupBy
    as compose — no kernel, no extra shuffle beyond the re-group; use
    :func:`ddsketch_collapse_level` to pick the smallest level that
    caps every bin's bucket count."""
    if level <= 0:
        return sketch
    keys = list(key_cols)
    step = 2 ** int(level)
    nb = F.when(F.col("sign") == 0, F.lit(0)).otherwise(
        F.ceil(F.col("bucket") / F.lit(step))
    ).cast("int")
    return (
        sketch.withColumn("bucket", nb)
        .groupBy(*keys, "bin_start", "sign", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def ddsketch_collapse_level(
    sketch: DataFrame,
    max_buckets: int,
    key_cols: Sequence[str] = KEY_COLS,
    max_level: int = 32,
) -> int:
    """Smallest collapse level at which EVERY (key..., bin_start) group
    of *sketch* holds at most *max_buckets* rows.  A single global
    level (rather than per-group levels) keeps all stores at one gamma,
    so cross-bin and cross-tier merges stay exact.

    One aggregation pass over the (tiny) bucket table: per group,
    collect the distinct (sign, bucket) set ONCE (bounded by the
    per-bin bucket count), then evaluate every candidate level as a
    JVM array expression over that set — no Expand, no per-level
    re-aggregation; an O(levels * buckets) control read returning
    ``max_level + 1`` numbers, never touching raw readings."""
    keys = list(key_cols)
    per_group = sketch.groupBy(*keys, "bin_start").agg(
        F.collect_set(F.struct("sign", "bucket")).alias("_bs")
    )
    def _collapser(step):
        # single-arg lambda on purpose: a 2-arg lambda would make
        # F.transform pass the array INDEX as the second argument
        return lambda s: F.struct(
            s["sign"].alias("sign"),
            F.when(s["sign"] == 0, F.lit(0).cast("long")).otherwise(
                F.ceil(s["bucket"] / F.lit(step))
            ).alias("bucket"),
        )

    projs = []
    for lv in range(max_level + 1):
        collapsed = F.transform("_bs", _collapser(2 ** lv))
        projs.append(F.size(F.array_distinct(collapsed)).alias(f"l{lv}"))
    worst = per_group.select(*projs).agg(
        *[F.max(f"l{lv}").alias(f"l{lv}") for lv in range(max_level + 1)]
    ).first()
    for lv in range(max_level + 1):
        # max over an EMPTY sketch is null -> any level satisfies the cap
        if worst[f"l{lv}"] is None or worst[f"l{lv}"] <= max_buckets:
            return lv
    # collapsing never merges across the sign/zero stores, so a cap
    # below the per-bin store count is unsatisfiable — fail loudly
    # rather than return a level that silently violates the contract
    raise ValueError(
        f"no collapse level <= {max_level} caps every bin at "
        f"{max_buckets} buckets (worst bin still has "
        f"{worst[f'l{max_level}']}; the sign/zero stores never merge, "
        f"so max_buckets must be >= the per-bin store count)")


def _parent_bin(every: int):
    """Shared re-binning expressions for the compose_* rollups: the
    parent bin_start expression and the (bin_start, bin_end, bin_label)
    output columns — one definition so every composer keeps the same
    bin conventions."""
    e = int(every)
    pb = (F.floor(F.col("bin_start") / e) * e).cast("long")
    out = [
        F.col("_pb").alias("bin_start"),
        (F.col("_pb") + e).cast("long").alias("bin_end"),
        (F.col("_pb") + e).cast("long").alias("bin_label"),
    ]
    return pb, out


def compose_counter(
    agg: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`counter_agg` bins into ``every``-sized parent
    bins WITHOUT rescanning raw readings (the TimescaleDB
    ``rollup(counter_agg)`` analog) — EXACT, because counter_agg
    attributes every increment to the bin holding the LATER reading:
    re-binning readings into coarser bins never moves an increment
    across a parent boundary, so parent ``counter_delta`` / ``n`` /
    ``n_resets`` are plain sums and ``first``/``last`` come from the
    earliest/latest child bin.  Same schema in and out, so counter
    tiers chain raw -> 1m -> 1h -> 1d like the stats/sketch tiers."""
    keys = list(key_cols)
    pb, pcols = _parent_bin(every)
    bs = F.col("bin_start")
    return (
        agg.withColumn("_pb", pb)
        .groupBy(*keys, "_pb")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("counter_delta").alias("counter_delta"),
            F.sum("n_resets").cast("long").alias("n_resets"),
            # a child bin whose readings were ALL null carries null
            # anchors (n=0); mask its ordering so the parent's first/
            # last is the earliest/latest REAL reading, matching a
            # direct coarse build on the same nulls
            F.min_by("first", F.when(F.col("first").isNotNull(), bs))
            .alias("first"),
            F.max_by("last", F.when(F.col("last").isNotNull(), bs))
            .alias("last"),
        )
        .select(
            *keys,
            *pcols,
            "n", "counter_delta", "n_resets", "first", "last",
        )
    )


def compose_gauge(
    agg: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`gauge_agg` bins into ``every``-sized parent
    bins WITHOUT rescanning raw readings (the TimescaleDB
    ``rollup(gauge_agg)`` analog) — EXACT for the same reason
    :func:`compose_counter` is (increments attribute to the later
    reading's bin): ``n``/``delta``/``dx`` are plain sums, ``rate`` is
    re-derived as sum(delta)/sum(dx), ``idelta_left``/``idelta_right``
    come from the earliest/latest child holding an increment, and
    ``first``/``last`` from the earliest/latest child.  Same schema in
    and out."""
    keys = list(key_cols)
    pb, pcols = _parent_bin(every)
    bs = F.col("bin_start")
    has_inc = F.when(F.col("idelta_left").isNotNull(), bs)
    return (
        agg.withColumn("_pb", pb)
        .groupBy(*keys, "_pb")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("delta").alias("delta"),
            F.min_by(F.col("idelta_left"), has_inc).alias("idelta_left"),
            F.max_by(F.col("idelta_right"), has_inc).alias("idelta_right"),
            (F.sum("delta") / F.sum("dx")).alias("rate"),
            F.sum("dx").alias("dx"),
            F.min_by("first", bs).alias("first"),
            F.max_by("last", bs).alias("last"),
        )
        .select(
            *keys,
            *pcols,
            "n", "delta", "idelta_left", "idelta_right", "rate", "dx",
            "first", "last",
        )
    )


def compose_state(
    agg: DataFrame,
    every: int,
    state_col: str = "state",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`state_agg` bins into ``every``-sized parent
    bins (TimescaleDB ``rollup(state_agg)`` analog) — EXACT plain
    sums: segments belong wholly to their left endpoint's bin, so
    re-binning never splits or moves one.  Same schema in and out."""
    keys = list(key_cols)
    pb, pcols = _parent_bin(every)
    return (
        agg.withColumn("_pb", pb)
        .groupBy(*keys, "_pb", state_col)
        .agg(
            F.sum("n_segments").cast("long").alias("n_segments"),
            F.sum("duration").alias("duration"),
            F.sum("n_enter").cast("long").alias("n_enter"),
        )
        .select(
            *keys,
            *pcols,
            state_col, "n_segments", "duration", "n_enter",
        )
    )


def compose_heartbeat(
    agg: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`heartbeat_agg` bins into ``every``-sized
    parent bins (TimescaleDB ``rollup(heartbeat_agg)`` analog) — EXACT
    plain sums under the left-endpoint segment convention; ``live_frac``
    re-derives from the summed partials.  Same schema in and out."""
    keys = list(key_cols)
    pb, pcols = _parent_bin(every)
    return (
        agg.withColumn("_pb", pb)
        .groupBy(*keys, "_pb")
        .agg(
            F.sum("n_beats").cast("long").alias("n_beats"),
            F.sum("uptime").alias("uptime"),
            F.sum("downtime").alias("downtime"),
            F.sum("n_gaps").cast("long").alias("n_gaps"),
        )
        .select(
            *keys,
            *pcols,
            "n_beats", "uptime", "downtime", "n_gaps",
            (F.col("uptime") / (F.col("uptime") + F.col("downtime"))
             ).alias("live_frac"),
        )
    )


def compose_twa(
    agg: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`time_weighted_avg` bins into ``every``-sized
    parent bins (TimescaleDB ``rollup(time_weight)`` analog) — EXACT:
    ``integral``/``duration`` partials sum under the left-endpoint
    segment convention and ``twa`` re-derives.  Same schema in and
    out.  (Use ``quantized`` at build time if bit-identity across
    partitionings matters — float partial sums are order-dependent at
    the last ulp.)"""
    keys = list(key_cols)
    pb, pcols = _parent_bin(every)
    return (
        agg.withColumn("_pb", pb)
        .groupBy(*keys, "_pb")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("integral").alias("integral"),
            F.sum("duration").alias("duration"),
        )
        .select(
            *keys,
            *pcols,
            "n", "integral", "duration",
            (F.col("integral") / F.col("duration")).alias("twa"),
        )
    )


# --- SAX symbolization (round-5 continuation) -------------------------

# N(0,1) quantile breakpoints to double precision (the published SAX
# lookup table, Lin/Keogh/Lonardi/Chiu DMKD 2003 §3.2, extended to
# full binary64 — both engines consume these identical literals, so
# symbol assignment is deterministic across Spark and the SQL twin).
SAX_BREAKPOINTS = {
    2: [0.0],
    3: [-0.43072729929545744, 0.43072729929545744],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997,
        0.2533471031357997, 0.8416212335729142],
    6: [-0.9674215661017014, -0.43072729929545744, 0.0,
        0.43072729929545744, 0.9674215661017014],
    8: [-1.1503493803760079, -0.6744897501960817,
        -0.31863936396437514, 0.0, 0.31863936396437514,
        0.6744897501960817, 1.1503493803760079],
}


def sax_symbolize(
    df: DataFrame,
    segments: int = 8,
    alphabet: int = 4,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """SAX symbolic aggregate approximation per series (Lin, Keogh,
    Lonardi & Chiu, DMKD 2003 — public method; diive has no symbolic
    index, its pattern tooling is histogram/peak-bin based,
    diive/pkgs/analyses/histogram.py:14-122 is the closest analog).

    Pipeline per series: drop nulls -> compact index ``ci`` ->
    z-normalize against the per-series population mean/SD -> PAA with
    ``segments`` equal slices (``seg = floor(ci * segments / n)``, the
    standard variable-length extension) -> map each segment mean to a
    symbol by counting crossed N(0,1) breakpoints.

    Zero-variance series z-normalize to all-zeros (the SAX convention:
    a flat series is all-middle-symbol), guarded identically in the
    SQL twin.  Shapes for 10^12 series: one window pass for the
    compact index, one groupBy for the per-series moments joined back
    broadcast-free (series keys are the shuffle key throughout — the
    same single-exchange layout as the rollup family), one groupBy for
    the PAA means.  All JVM expressions; no UDF.

    Emits (key..., seg, n_pts, paa, symbol, letter) — ``symbol`` in
    ``[0, alphabet)``, ``letter`` = 'a' + symbol.
    """
    if segments < 1:
        raise ValueError(f"segments must be >= 1, got {segments}")
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be one of {sorted(SAX_BREAKPOINTS)}, "
            f"got {alphabet}"
        )
    keys = list(key_cols)
    bps = SAX_BREAKPOINTS[alphabet]
    pts = df.where(F.col(value_col).isNotNull())
    wseq = Window.partitionBy(*keys).orderBy(axis_col)
    pts = pts.withColumn("_ci", F.row_number().over(wseq) - 1)
    stats = pts.groupBy(*keys).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sd"),
        F.count(F.lit(1)).alias("_n"),
    )
    z = F.when(
        (F.col("_sd").isNull()) | (F.col("_sd") == 0.0), F.lit(0.0)
    ).otherwise((F.col(value_col) - F.col("_mu")) / F.col("_sd"))
    seg = F.floor(
        F.col("_ci") * F.lit(int(segments)) / F.col("_n")
    ).cast("long")
    paa = (
        pts.join(stats, keys)
        .select(*keys, seg.alias("seg"), z.alias("_z"))
        .groupBy(*keys, "seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            F.avg("_z").alias("paa"),
        )
    )
    sym = F.lit(0)
    for bp in bps:
        sym = sym + F.when(F.col("paa") > F.lit(float(bp)), 1).otherwise(0)
    out = paa.withColumn("symbol", sym.cast("int"))
    letter = F.char(F.col("symbol") + F.lit(97))
    return out.withColumn("letter", letter)


# --- Count-Min sketch (round-5 continuation) ---------------------------

# Fixed pairwise-independent hash family over the Mersenne prime
# 2^31-1 (Cormode & Muthukrishnan, J.Alg 2005 §3: h_r(x) =
# ((a_r*x + b_r) mod p) mod width).  Seeds are deterministic literals
# so sketches built anywhere — any engine, any partitioning, any
# round — merge and probe consistently; the SQL twin replays the
# identical integer arithmetic.
CM_PRIME = (1 << 31) - 1
CM_SEEDS = (
    (1_000_003, 12_345),
    (999_983, 54_321),
    (424_243, 777),
    (104_729, 98_765),
    (15_485_863, 31_337),
    (32_452_843, 271_828),
)


def _cm_col(iv, row, width: int):
    """Bucket column for item ``iv`` (long, any sign) under hash row
    ``row`` — both engines use value mod p first so the a*x product
    stays below 2^62 (no overflow in 64-bit integers)."""
    a = F.element_at(
        F.array(*[F.lit(s[0]) for s in CM_SEEDS]), row + 1
    ).cast("long")
    b = F.element_at(
        F.array(*[F.lit(s[1]) for s in CM_SEEDS]), row + 1
    ).cast("long")
    return F.pmod(
        F.pmod(a * F.pmod(iv, F.lit(CM_PRIME)) + b, F.lit(CM_PRIME)),
        F.lit(int(width)),
    ).cast("int")


def cm_sketch_agg(
    df: DataFrame,
    every: int,
    depth: int = 4,
    width: int = 128,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Count-Min frequency sketch per ``every``-sized bin (Cormode &
    Muthukrishnan 2005) — the point-query complement to the Misra-Gries
    top-k store (:func:`topk_agg` answers "which items are heavy";
    this answers "how often did item x occur" for ANY x, with
    one-sided error: estimate >= truth always, overshoot <= e/width *
    N with probability 1 - exp(-depth)).

    Store = exact counts over (row, col) hash cells, long form: one
    row per (key..., bin_start, row, col) with its count — the same
    tier-table shape as :func:`ddsketch_agg`, mergeable by plain
    ``groupBy().sum()`` (:func:`compose_cm`), so composition is EXACT
    (counters are additive) and tiers chain raw -> 1m -> 1h -> 1d
    without re-scanning raw data.

    100 TB shape: the tier-1 groupBy is map-side combined and bounded
    per bin by ``min(distinct_items, depth*width)`` cells, so raw
    readings never shuffle; parent tiers shuffle only cell rows.
    Values are truncated to integer identity via ``cast(long)``
    (callers bucket/floor continuous values first); nulls drop.
    """
    if not 1 <= depth <= len(CM_SEEDS):
        raise ValueError(f"depth must be in [1, {len(CM_SEEDS)}], got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    b = (F.floor(F.col(axis_col).cast("long") / int(every)) * int(every)).cast(
        "long"
    )
    iv = F.col(value_col).cast("long")
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)]))
    return (
        pts.select(*keys, b.alias("bin_start"), iv.alias("_iv"))
        .withColumn("row", rows)
        .select(
            *keys,
            "bin_start",
            F.col("row").cast("int").alias("row"),
            _cm_col(F.col("_iv"), F.col("row"), width).alias("col"),
        )
        .groupBy(*keys, "bin_start", "row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def compose_cm(
    sketch: DataFrame,
    every: int,
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Merge child :func:`cm_sketch_agg` bins into ``every``-sized
    parent bins WITHOUT rescanning raw data.  Hash cells are
    value-determined, so the merge is a plain count sum and the
    composed sketch is BIT-IDENTICAL to one built directly at the
    parent resolution."""
    keys = list(key_cols)
    pb, _ = _parent_bin(every)
    return (
        sketch.withColumn("bin_start", pb)
        .groupBy(*keys, "bin_start", "row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 128,
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cm_sketch_agg` store:
    for each probe row (key..., bin_start, value) return it with
    ``cm_est`` = min over hash rows of the matching cell count
    (absent cell = 0 — the item never hashed there).

    The probe fans out to ``depth`` narrow (key, bin, row, col) lookup
    rows and equi-joins the sketch — at scale this is a hash join on
    the same layout the sketch is stored in (never a scan of raw
    readings)."""
    keys = list(key_cols)
    others = [
        c for c in probes.columns
        if c not in set(keys) | {"bin_start", value_col}
    ]
    iv = F.col(value_col).cast("long")
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)]))
    fan = (
        probes.withColumn("row", rows)
        .withColumn("row", F.col("row").cast("int"))
        .withColumn("col", _cm_col(iv, F.col("row"), width))
    )
    hit = fan.join(
        sketch.withColumnRenamed("cnt", "_cell"),
        keys + ["bin_start", "row", "col"],
        "left",
    ).withColumn("_cell", F.coalesce(F.col("_cell"), F.lit(0)))
    return hit.groupBy(*keys, "bin_start", value_col, *others).agg(
        F.min("_cell").cast("long").alias("cm_est")
    )


def holt_winters_smooth(
    df: DataFrame,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.1,
    horizon: int = 1,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Holt-Winters additive triple-exponential smoothing per series
    (Winters 1960 / Hyndman & Athanasopoulos FPP §7.3 — public method;
    the seasonal extension of :func:`holt_smooth`, and the forecasting
    complement of diive's fit-based cycle tooling).

    Classical simple initialization over the first two seasons
    (NIST/SEMATECH e-Handbook §6.4.3.5)::

        l_m = mean(x_1..x_m)
        b_m = (mean(x_{m+1}..x_{2m}) - mean(x_1..x_m)) / m
        s_i = x_i - l_m                      (i = 1..m)

    and for t = m+1..n, with ``s_old`` the season of t-m::

        l_t = alpha*(x_t - s_old) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(x_t - l_t) + (1-gamma)*s_old

    Computed as an EXACT left fold with a struct accumulator carrying
    the rolling m-element seasonal array (``aggregate`` over an
    ``array_sort``-ordered collect; the init means fold sequentially
    too), so results are bit-deterministic across engines and
    partitionings — the DuckDB twin replays the identical fold with a
    recursive CTE carrying a LIST column.  One groupBy shuffle;
    per-series state bounded by series length (token streams are
    n_tok-capped; unbounded series take the applyInPandas route, the
    ewma_chart precedent).

    Emits per series: ``n, level, trend, season_next`` (the seasonal
    the h-step forecast consumes), ``forecast`` (= level + h*trend +
    season_next) and ``rmse`` over the n-m one-step-ahead errors; all
    outputs null when n < 2*period (the init needs two full seasons).
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not 0.0 <= beta <= 1.0:
        raise ValueError(f"beta must be in [0, 1], got {beta}")
    if not 0.0 <= gamma <= 1.0:
        raise ValueError(f"gamma must be in [0, 1], got {gamma}")
    keys = list(key_cols)
    m = int(period)
    a, be, g = float(alpha), float(beta), float(gamma)
    h = int(horizon)
    pts = df.where(F.col(value_col).isNotNull())
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(axis_col).cast("long").alias("p"),
                F.col(value_col).cast("double").alias("x"),
            )
        )
    )
    gdf = pts.groupBy(*keys).agg(arr.alias("_arr"))
    gdf = (
        gdf.withColumn("_v", F.transform(F.col("_arr"), lambda s: s["x"]))
        .withColumn("_n", F.size("_v"))
        .drop("_arr")
    )
    # sequential left-fold means (bit-identical to the SQL twin's
    # list_reduce — never list_sum, whose summation order is free)
    fold_sum = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x
    )
    s1 = F.slice(F.col("_v"), 1, m)
    s2 = F.slice(F.col("_v"), m + 1, m)
    l1 = fold_sum(s1) / F.lit(float(m))
    b1 = (fold_sum(s2) / F.lit(float(m)) - l1) / F.lit(float(m))
    s_init = F.transform(s1, lambda x: x - l1)
    init = F.struct(
        l1.alias("l"),
        b1.alias("b"),
        F.lit(0.0).alias("sse"),
        s_init.alias("s"),
    )
    rest = F.expr(f"slice(_v, {m + 1}, greatest(size(_v) - {m}, 0))")

    def step(acc, x):
        s_old = F.element_at(acc["s"], 1)
        new_l = F.lit(a) * (x - s_old) + F.lit(1.0 - a) * (
            acc["l"] + acc["b"]
        )
        new_b = F.lit(be) * (new_l - acc["l"]) + F.lit(1.0 - be) * acc["b"]
        err = x - (acc["l"] + acc["b"] + s_old)
        new_s = F.lit(g) * (x - new_l) + F.lit(1.0 - g) * s_old
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            (acc["sse"] + err * err).alias("sse"),
            F.concat(
                F.slice(acc["s"], 2, m - 1), F.array(new_s)
            ).alias("s"),
        )

    state = F.aggregate(rest, init, step)
    n = F.col("_n")
    out = gdf.withColumn("_st", F.when(n >= 2 * m, state))
    lvl, trd = F.col("_st")["l"], F.col("_st")["b"]
    season_next = F.element_at(F.col("_st")["s"], ((h - 1) % m) + 1)
    return out.select(
        *keys,
        n.cast("long").alias("n"),
        lvl.alias("level"),
        trd.alias("trend"),
        season_next.alias("season_next"),
        (lvl + F.lit(float(h)) * trd + season_next).alias("forecast"),
        F.sqrt(F.col("_st")["sse"] / (n - m).cast("double")).alias("rmse"),
    )


def matrix_profile(
    df: DataFrame,
    m: int = 8,
    exclusion: int | None = None,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    max_points: int = 8192,
) -> DataFrame:
    """Self-join matrix profile per series (Yeh et al., ICDM 2016 —
    public algorithm; diive's anomaly tooling is z-score/Hampel based,
    this adds shape-based discord/motif discovery).

    For every length-``m`` subsequence: the z-normalized Euclidean
    distance to its nearest non-trivial neighbor in the SAME series
    (``|i - j| >= exclusion``, default ``max(1, m // 2)`` — the
    standard trivial-match zone).  Low profile = motif (repeated
    shape), high profile = discord (anomalous shape).

    Distances use the correlation identity
    ``d(i,j) = sqrt(max(2m(1 - (dot - m*mu_i*mu_j)/(m*sd_i*sd_j)), 0))``
    with population window moments; a zero-variance window is the
    all-zeros z-vector (d = 0 vs another flat window, sqrt(m)
    otherwise) — guarded identically in the SQL twin.

    The profile is inherently O(n^2) per series (one BLAS matmul in
    the numpy kernel), so the kernel REFUSES series longer than
    ``max_points`` rather than silently choking an executor — at
    10^12-series scale the parallelism is ACROSS series (the LTTB /
    LOF / ASAP contract: one bounded series per worker); window or
    downsample longer series first (``m4_downsample``/``bucket_rollup``)
    — that is the published scale recipe (the MP literature's own
    anytime/segmented variants stream exactly such chunks.)

    Emits one row per subsequence: (key..., sub_ci, sub_pos, nn_ci,
    mp) — ``sub_ci`` the compact (null-free) window-start index,
    ``sub_pos`` its original axis position, ``nn_ci`` the nearest
    neighbor's compact index (ties -> smallest), ``mp`` the distance.
    Series with no admissible (i, j) pair emit nothing.
    """
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    excl = max(1, m // 2) if exclusion is None else int(exclusion)
    if excl < 1:
        raise ValueError(f"exclusion must be >= 1, got {exclusion}")
    keys = list(key_cols)
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [df.schema[k] for k in keys]
        + [
            T.StructField("sub_ci", T.LongType()),
            T.StructField("sub_pos", T.LongType()),
            T.StructField("nn_ci", T.LongType()),
            T.StructField("mp", T.DoubleType()),
        ]
    )
    mm, cap = int(m), int(max_points)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf.dropna(subset=[value_col]).sort_values(axis_col)
        x = sub[value_col].to_numpy(dtype=np.float64)
        pos = sub[axis_col].to_numpy()
        n = len(x)
        if n > cap:
            raise ValueError(
                f"matrix_profile: series has {n} points > max_points="
                f"{cap}; window or downsample first (O(n^2) kernel)"
            )
        n_sub = n - mm + 1
        if n_sub < excl + 1:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        w = np.lib.stride_tricks.sliding_window_view(x, mm)
        mu = w.mean(axis=1)
        sd = w.std(axis=1)  # population
        dot = w @ w.T
        denom = mm * np.outer(sd, sd)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (dot - mm * np.outer(mu, mu)) / denom
        d = np.sqrt(np.maximum(2.0 * mm * (1.0 - corr), 0.0))
        zi = sd == 0.0
        if zi.any():
            both = np.logical_and.outer(zi, zi)
            one = np.logical_xor.outer(zi, zi)
            d[both] = 0.0
            d[one] = math.sqrt(mm)
        idx = np.arange(n_sub)
        d[np.abs(idx[:, None] - idx[None, :]) < excl] = np.inf
        nn = d.argmin(axis=1)
        mp = d[idx, nn]
        out = pd.DataFrame(
            {
                "sub_ci": idx.astype("int64"),
                "sub_pos": pos[:n_sub].astype("int64"),
                "nn_ci": nn.astype("int64"),
                "mp": mp,
            }
        )
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[f.name for f in out_schema]]

    return df.groupBy(*keys).applyInPandas(_kernel, schema=out_schema)


def matrix_profile_discord(
    df: DataFrame,
    m: int = 8,
    top: int = 1,
    exclusion: int | None = None,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    max_points: int = 8192,
) -> DataFrame:
    """Top-``top`` discords per series: the subsequences whose matrix
    profile is LARGEST (farthest from any other shape in the series) —
    the MP-native anomaly report.  Deterministic tie-break: higher mp
    first, then smaller sub_ci."""
    prof = matrix_profile(
        df, m=m, exclusion=exclusion, value_col=value_col,
        axis_col=axis_col, key_cols=key_cols, max_points=max_points,
    )
    keys = list(key_cols)
    wd = Window.partitionBy(*keys).orderBy(F.desc("mp"), F.asc("sub_ci"))
    return (
        prof.withColumn("rk", F.row_number().over(wd))
        .where(F.col("rk") <= int(top))
        .select(*keys, "rk", "sub_ci", "sub_pos", "nn_ci", "mp")
    )


def sax_motif_buckets(
    df: DataFrame,
    segments: int = 8,
    alphabet: int = 4,
    min_series: int = 2,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Cross-series motif discovery by SAX-word bucketing (the indexing
    use Lin et al. DMKD 2003 §5 designed SAX for): symbolize every
    series (:func:`sax_symbolize`), concatenate its segment letters
    into one word, and group series by word — series sharing a word
    have the same coarse shape.

    This is the SCALE path for "which of my 10^12 series look alike":
    :func:`matrix_profile` is exact but O(n^2) WITHIN a series and
    pairwise ACROSS them; SAX bucketing replaces the cross-series
    all-pairs with one equi-shuffle on a ``segments``-letter word
    (the MinHash-LSH band-bucket pattern applied to shapes).  Candidate
    buckets can then be verified exactly with z-normalized distance —
    only within buckets, never all-pairs.

    Emits one row per word with >= ``min_series`` members:
    (word, n_series, members) — members an array of
    'key0|key1'-joined series ids, sorted for determinism.
    """
    keys = list(key_cols)
    sym = sax_symbolize(
        df, segments=segments, alphabet=alphabet,
        value_col=value_col, axis_col=axis_col, key_cols=keys,
    )
    word = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("seg"), F.col("letter")))
            ),
            lambda s: s["letter"],
        ),
        "",
    )
    series_words = sym.groupBy(*keys).agg(word.alias("word"))
    sid = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    return (
        series_words.select(sid.alias("_sid"), "word")
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_series"),
            F.array_sort(F.collect_list("_sid")).alias("members"),
        )
        .where(F.col("n_series") >= int(min_series))
    )


# chi-square 95th-percentile critical values, dof 1..24 (the public
# table, e.g. NIST/SEMATECH e-Handbook §1.3.6.7.4) — both engines
# consume the same literal, so the white-noise verdict is deterministic
CHI2_95 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070, 6: 12.592,
    7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307, 11: 19.675,
    12: 21.026, 13: 22.362, 14: 23.685, 15: 24.996, 16: 26.296,
    17: 27.587, 18: 28.869, 19: 30.144, 20: 31.410, 21: 32.671,
    22: 33.924, 23: 35.172, 24: 36.415,
}


def ljung_box(
    df: DataFrame,
    h: int = 10,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Ljung-Box portmanteau white-noise test per series (Ljung & Box,
    Biometrika 1978 — public method; the residual-diagnostics
    complement of :func:`holt_smooth`/:func:`holt_winters_smooth`,
    whose RMSE says how big the one-step errors are while Q says
    whether structure is LEFT in them)::

        rho_k = sum_{t>k} (x_t - xbar)(x_{t-k} - xbar) / sum (x_t - xbar)^2
        Q     = n (n+2) sum_{k=1..h} rho_k^2 / (n - k)

    computed over the null-compacted sequence (LB assumes regular
    spacing; gaps are closed the way the ACF battery does).  Under the
    white-noise null Q ~ chi2(h); ``white_noise_ok`` compares Q to the
    published 95% critical value (:data:`CHI2_95`).

    One window pass materializes all ``h`` lags at once, one groupBy
    folds the numerators — per-series state is 2h+2 running sums, no
    collected arrays, so series length is unbounded (unlike the
    fold-based smoothers).  Constant series (zero denominator) emit
    null Q and null verdict.  Requires ``1 <= h <= 24`` (the table)
    and emits nothing for series with n <= h.
    """
    if not 1 <= h <= 24:
        raise ValueError(f"h must be in [1, 24], got {h}")
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    lagged = pts.select(
        *keys,
        v.cast("double").alias("_x"),
        *[F.lag(v.cast("double"), k).over(w).alias(f"_l{k}")
          for k in range(1, h + 1)],
    )
    stats = lagged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("_x").alias("_mu"),
    )
    j = lagged.join(stats, keys)
    dev = F.col("_x") - F.col("_mu")
    num_aggs = [
        F.sum(
            F.when(
                F.col(f"_l{k}").isNotNull(),
                dev * (F.col(f"_l{k}") - F.col("_mu")),
            )
        ).alias(f"_num{k}")
        for k in range(1, h + 1)
    ]
    agg = j.groupBy(*keys, "n").agg(
        F.sum(dev * dev).alias("_den"), *num_aggs
    )
    n = F.col("n").cast("double")
    qsum = None
    for k in range(1, h + 1):
        rho = F.col(f"_num{k}") / F.col("_den")
        term = rho * rho / (n - F.lit(float(k)))
        qsum = term if qsum is None else qsum + term
    q = F.when(F.col("_den") > 0, n * (n + F.lit(2.0)) * qsum)
    crit = float(CHI2_95[h])
    return (
        agg.where(F.col("n") > h)
        .select(
            *keys,
            "n",
            q.alias("q_stat"),
            F.lit(h).cast("int").alias("h"),
            F.lit(crit).alias("chi2_crit_95"),
            F.when(q.isNotNull(), q <= F.lit(crit))
            .alias("white_noise_ok"),
        )
    )


def binseg_changepoints(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    quantized: float | None = 1000.0,
    min_seg: int = 10,
) -> DataFrame:
    """Binary-segmentation MULTI-changepoint estimation (Scott &
    Knott 1974; the standard recursive extension of the single CUSUM
    split in :func:`cusum_changepoint`): find the level-1 split at the
    CUSUM argmax over the whole series, then re-run the same argmax
    INSIDE each half (its own mean), emitting up to three changepoints
    per series.  Depth is fixed at 2 — each level is one window pass +
    one aggregate, so the plan is static and the shuffles are the
    same series-key exchanges the tier rollups use; a deeper
    recursion would multiply passes, and past depth 2 the honest tool
    is PELT on collected segments.

    ``quantized`` (default 1e3) accumulates ``floor(x*q)`` as exact
    longs — every cumulative sum and therefore every argmax decision
    is bit-deterministic across partition counts and engines (the
    cusum_changepoint discipline).  Level-2 splits are emitted only
    for halves with at least ``2*min_seg`` readings, and a split must
    leave ``min_seg`` on each side.

    Emits one row per changepoint: ``level`` (1|2), ``seg`` (-1 for
    the root, else 0/1 = left/right half), ``cp_pos`` (axis value of
    the last point of the left part), ``n_seg``, ``s_max_norm``
    (|S| / q / n_seg), ``mean_before`` / ``mean_after`` (segment-side
    means, de-quantized).
    """
    if min_seg < 2:
        raise ValueError(f"min_seg must be >= 2, got {min_seg}")
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("double")
    if quantized:
        q = float(quantized)
        vq = F.floor(v * F.lit(q)).cast("long")
    else:
        q = 1.0
        vq = v

    def level_pass(src, part_cols, level, seg_expr):
        wfull = Window.partitionBy(*part_cols)
        wrn = Window.partitionBy(*part_cols).orderBy(axis_col)
        wcum = wrn.rowsBetween(Window.unboundedPreceding, 0)
        e = (
            src.withColumn("_n", F.count("_vq").over(wfull))
            .withColumn("_tot", F.sum("_vq").over(wfull))
            .withColumn("_k", F.row_number().over(wrn))
            .withColumn("_cum", F.sum("_vq").over(wcum))
            .withColumn(
                "_s",
                F.col("_cum").cast("double")
                - F.col("_k") * F.col("_tot").cast("double") / F.col("_n"),
            )
        )
        # candidate splits leave min_seg readings each side
        cand = e.where(
            (F.col("_k") >= min_seg) & (F.col("_k") <= F.col("_n") - min_seg)
        )
        pick = F.struct(
            F.abs(F.col("_s")).alias("a"), (-F.col("_k")).alias("nk")
        )
        payload = F.struct(
            F.col(axis_col).cast("long").alias("t_star"),
            F.col("_k").alias("k"),
            F.col("_cum").alias("cum"),
            F.abs(F.col("_s")).alias("s_abs"),
        )
        agg = cand.groupBy(*part_cols).agg(
            F.max("_n").alias("_nn"),
            F.max("_tot").alias("_tt"),
            F.max_by(payload, pick).alias("_p"),
        )
        k = F.col("_p.k").cast("double")
        n = F.col("_nn").cast("double")
        cum = F.col("_p.cum").cast("double")
        tot = F.col("_tt").cast("double")
        return agg.select(
            *keys,
            F.lit(level).cast("long").alias("level"),
            seg_expr.cast("long").alias("seg"),
            F.col("_p.t_star").alias("cp_pos"),
            F.col("_nn").cast("long").alias("n_seg"),
            (F.col("_p.s_abs") / F.lit(q) / n).alias("s_max_norm"),
            (cum / k / F.lit(q)).alias("mean_before"),
            ((tot - cum) / (n - k) / F.lit(q)).alias("mean_after"),
        ), e

    base = pts.withColumn("_vq", vq).select(
        *keys, axis_col, "_vq"
    )
    lvl1, e1 = level_pass(base, keys, 1, F.lit(-1))
    # assign halves from the level-1 winner via a window max of the
    # SAME (pick, payload) comparator — no join back
    pickw = F.struct(
        F.abs(F.col("_s")).alias("a"), (-F.col("_k")).alias("nk"),
        F.col("_k").alias("k"),
    )
    wfull = Window.partitionBy(*keys)
    cand1 = F.when(
        (F.col("_k") >= min_seg) & (F.col("_k") <= F.col("_n") - min_seg),
        pickw,
    )
    halves = (
        e1.withColumn("_best", F.max(cand1).over(wfull))
        .where(F.col("_best").isNotNull())
        .withColumn(
            "_seg", F.when(F.col("_k") <= F.col("_best.k"), 0).otherwise(1)
        )
        .where(F.col("_n") >= 2 * min_seg)  # root must have been splittable
        .select(*keys, axis_col, "_vq", "_seg")
    )
    lvl2, _ = level_pass(halves, [*keys, "_seg"], 2, F.col("_seg"))
    out = lvl1.unionByName(lvl2)
    return out.select(
        *keys, "level", "seg", "cp_pos", "n_seg",
        "s_max_norm", "mean_before", "mean_after",
    )


def mann_kendall_bins(
    df: DataFrame,
    every: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per ``every``-sized bin
    (Mann 1945 / Kendall 1975 — the standard nonparametric trend test;
    the natural verdict companion to :func:`theil_sen_bins`' slope:
    diive fits trends by least squares, pkgs/fits, which assumes
    normal residuals — MK does not).

    Per (key..., bin) with the bin's readings ordered by the axis:

    - ``s_stat``  = sum over pairs i<j of sign(v_j - v_i), an integer.
      Computed WITHOUT materializing the O(m²) pair set: with
      T = m(m-1)/2 total pairs, D = strict inversions (v_j < v_i for
      i < j) and E = tied pairs, S = T - 2·D - E.  Inversions are
      counted by a bottom-up merge (searchsorted per block), so the
      kernel is O(m log² m) on arrays bounded by ``every`` — at any
      table scale the per-bin work is a constant, and bins parallelize
      across the cluster (same contract as lttb_downsample's kernel).
    - ``tie_pairs`` = E = Σ t(t-1)/2 over value-tie groups (integer).
    - ``var_s`` = tie-corrected variance
      [m(m-1)(2m+5) - Σ t(t-1)(2t+5)] / 18  (Kendall 1975 §4).
    - ``z`` = (S∓1)/sqrt(var_s) with the continuity correction
      (0 when S = 0 or var_s = 0).
    - ``trend`` ∈ {'increasing','decreasing','no trend'} at the
      two-sided alpha implied by ``z_crit`` (default 5%).

    Bins with < 2 non-null readings are omitted.  One shuffle (the
    groupBy); output is one narrow row per bin.
    """
    keys = list(key_cols)
    e = int(every)
    import numpy as np
    import pandas as pd

    def _inversions(a: "np.ndarray") -> int:
        """Strict inversions (a[i] > a[j], i < j) via bottom-up merge
        counting; ties are not inversions."""
        n = a.size
        arr = a.copy()
        inv = 0
        width = 1
        while width < n:
            for lo in range(0, n, 2 * width):
                mid = min(lo + width, n)
                hi = min(lo + 2 * width, n)
                if mid >= hi:
                    continue
                left = arr[lo:mid]
                right = arr[mid:hi]
                # pairs (l, r) with l > r: per right element, count of
                # left strictly greater = len(left) - rank_right
                idx = np.searchsorted(left, right, side="right")
                inv += left.size * right.size - int(idx.sum())
                arr[lo:hi] = np.sort(arr[lo:hi], kind="mergesort")
            width *= 2
        return inv

    in_schema = df.select(
        *keys,
        (F.floor(F.col(axis_col).cast("long") / e) * e)
        .cast("long")
        .alias("bin_start"),
        F.col(axis_col).cast("long").alias("_x"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())

    key_schema = in_schema.select(*keys, "bin_start").schema
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType)

    out_schema = StructType(
        list(key_schema.fields)
        + [
            StructField("n", LongType()),
            StructField("s_stat", LongType()),
            StructField("tie_pairs", LongType()),
            StructField("var_s", DoubleType()),
            StructField("z", DoubleType()),
            StructField("trend", StringType()),
        ]
    )

    def _kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        v = (
            pdf.sort_values("_x")["_v"].to_numpy(dtype=np.float64)
        )
        m = v.size
        if m < 2:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        t_pairs = m * (m - 1) // 2
        d = _inversions(v)
        _, counts = np.unique(v, return_counts=True)
        ties = counts[counts > 1].astype(np.int64)
        e_pairs = int((ties * (ties - 1) // 2).sum())
        s = t_pairs - 2 * d - e_pairs
        tie_term = float((ties * (ties - 1) * (2 * ties + 5)).sum())
        var_s = (m * (m - 1) * (2 * m + 5) - tie_term) / 18.0
        if s > 0 and var_s > 0:
            z = (s - 1) / math.sqrt(var_s)
        elif s < 0 and var_s > 0:
            z = (s + 1) / math.sqrt(var_s)
        else:
            z = 0.0
        trend = (
            "increasing" if z > z_crit
            else "decreasing" if z < -z_crit
            else "no trend"
        )
        row = list(key) + [m, s, e_pairs, var_s, z, trend]
        return pd.DataFrame(
            [row], columns=[f.name for f in out_schema.fields]
        )

    return in_schema.groupBy(*keys, "bin_start").applyInPandas(
        _kernel, schema=out_schema
    )


def seasonal_mann_kendall(
    df: DataFrame,
    period: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    z_crit: float = 1.959964,
) -> DataFrame:
    """Seasonal Mann-Kendall test (Hirsch & Slack 1984): the MK S
    statistic and tie-corrected variance are computed INDEPENDENTLY
    per season (axis position mod ``period``) — so a strong diel/
    seasonal cycle cannot masquerade as a monotonic trend — and summed
    per series:  S* = Σ_s S_s,  var* = Σ_s var_s,  with the usual
    continuity-corrected z on the totals.

    Seasons with < 2 readings contribute nothing (standard).  Built on
    :func:`mann_kendall_bins`' merge-count kernel with the season as
    an extra group key, so the per-season work stays O(m log² m) and
    seasons parallelize like any other group; the combine is one tiny
    aggregate per series.
    """
    keys = list(key_cols)
    p = int(period)
    s = df.withColumn(
        "_season", F.pmod(F.col(axis_col).cast("long"), F.lit(p))
    )
    per_season = mann_kendall_bins(
        s,
        every=1 << 40,  # one bin spans the whole series
        value_col=value_col,
        axis_col=axis_col,
        key_cols=[*keys, "_season"],
        z_crit=z_crit,
    )
    comb = per_season.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_seasons"),
        F.sum("s_stat").cast("long").alias("s_total"),
        F.sum("var_s").alias("var_total"),
    )
    z = (
        F.when(
            (F.col("s_total") > 0) & (F.col("var_total") > 0),
            (F.col("s_total") - 1) / F.sqrt(F.col("var_total")),
        )
        .when(
            (F.col("s_total") < 0) & (F.col("var_total") > 0),
            (F.col("s_total") + 1) / F.sqrt(F.col("var_total")),
        )
        .otherwise(F.lit(0.0))
    )
    return comb.select(
        *keys, "n", "n_seasons", "s_total", "var_total",
        z.alias("z"),
        F.when(z > z_crit, "increasing")
        .when(z < -z_crit, "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


def dgim_window_count(
    df: DataFrame,
    window: int = 128,
    check_every: int = 60,
    threshold: float = 10.0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """DGIM sliding-window count of above-threshold readings
    (functions/dgim.py — Datar et al. 2002), evaluated as a batch
    kernel against the exact windowed count: per series, fold the bit
    stream (1 = value >= threshold; null reads as 0) through the
    O(log² W) sketch and, at every ``check_every``-th position, compare
    the estimate with the exact count over (pos - window, pos] under
    the sketch's own deterministic error bound floor(oldest/2).

    Output is one row per series with integer totals (``n_checks``,
    ``sum_exact`` — recomputable by any SQL engine from the raw rows)
    and two invariant booleans (every check within its bound; bucket
    count never above the O(log W) cap) — the self-verifying-oracle
    shape.  The per-series fold is sequential but series parallelize
    across the cluster, and state is O(log² W) — this is the operator
    you deploy when W is too wide to buffer (the streaming twin,
    stream_dgim_partials, shares the fold bit-for-bit).
    """
    keys = list(key_cols)
    import numpy as np
    import pandas as pd

    from ..functions.dgim import dgim_add, dgim_estimate, max_buckets

    w = int(window)
    ce = int(check_every)
    thr = float(threshold)
    cap = max_buckets(w)

    from pyspark.sql.types import (
        BooleanType, LongType, StructField, StructType)

    in_df = df.select(
        *keys,
        F.col(axis_col).cast("long").alias("_x"),
        F.col(value_col).cast("double").alias("_v"),
    )
    key_schema = in_df.select(*keys).schema
    out_schema = StructType(
        list(key_schema.fields)
        + [
            StructField("n_checks", LongType()),
            StructField("sum_exact", LongType()),
            StructField("all_within_bound", BooleanType()),
            StructField("buckets_bounded", BooleanType()),
        ]
    )

    def _kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_x")
        xs = pdf["_x"].to_numpy(dtype=np.int64)
        vs = pdf["_v"].to_numpy(dtype=np.float64)
        bits = (~np.isnan(vs)) & (vs >= thr)
        ones = xs[bits]
        bpos: list = []
        bsiz: list = []
        n_checks = 0
        sum_exact = 0
        ok_bound = True
        ok_cap = True
        for x, b in zip(xs.tolist(), bits.tolist()):
            dgim_add(x, 1 if b else 0, bpos, bsiz, w)
            if len(bpos) > cap:
                ok_cap = False
            if x % ce == 0:
                est, bound = dgim_estimate(bpos, bsiz)
                exact = int(
                    np.searchsorted(ones, x, side="right")
                    - np.searchsorted(ones, x - w, side="right")
                )
                n_checks += 1
                sum_exact += exact
                if abs(est - exact) > bound:
                    ok_bound = False
        row = list(key) + [n_checks, sum_exact, ok_bound, ok_cap]
        return pd.DataFrame(
            [row], columns=[f.name for f in out_schema.fields]
        )

    return in_df.groupBy(*keys).applyInPandas(_kernel, schema=out_schema)
