"""Outlier flag generators + the repeat-until-clean protocol.

Reference: all tests inherit FlagBase (diive/core/base/flagbase.py:17-150).
Per iteration a test yields flag {0=ok, 2=rejected}; with ``repeat=True``
the test re-runs on the filtered series (rejected -> NaN) until an
iteration finds 0 new outliers (flagbase.py:122-140); the overall flag is
2 where the point was rejected in any iteration, else 0 for tested points
(row-sum of the per-iteration hard flags, flagbase.py:134-136).

Spark mapping: each test is a pure DataFrame->DataFrame flag expression;
the repeat protocol is a bounded driver-side loop over a working column,
with ``localCheckpoint`` between iterations to truncate lineage
(SURVEY.md §4.2.4).  Aggregates used are ordering-insensitive, so results
are deterministic under any partitioning.

Parity traps honored:
- z-score uses the **population** std (np.std ddof=0,
  diive/core/funcs/funcs.py:37-41) — ``stddev_pop``, not samp;
- rejection is strict ``z > thres`` (zscore.py:195);
- LocalSD uses rolling **median** ± n_sd * rolling **sample** std over a
  centered window with min_periods=3 on the *non-null* rows
  (localsd.py:80-91), strict inequalities;
- AbsoluteLimits rejects outside [lo, hi] (absolutelimits.py:191 is the
  authoritative logic; the ``ok`` line :189 has a `|` bug we do not copy).
"""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..conventions import FLAG_HARD, FLAG_OK, KEY_COLS

MAX_ITERATIONS = 30  # safety bound for data-dependent repeat loops


def _finalize_flag(df: DataFrame, rejected: Column, value_col: str, flag_col: str) -> DataFrame:
    """0 where tested-ok, 2 where rejected, NULL where value was NULL
    (flagbase.py:80-88 conventions)."""
    v = F.col(value_col)
    return df.withColumn(
        flag_col,
        F.when(v.isNull(), F.lit(None).cast("int"))
        .when(rejected, F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )


def zscore_flag(
    df: DataFrame,
    thres: float = 4.0,
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    strata_col: str | None = None,
    flag_col: str = "flag_zscore",
) -> DataFrame:
    """Single-pass z-score flag: z = |(v - mean) / std_pop| over the
    series population (funcs.py:37-41), reject z > thres (zscore.py:195).
    ``strata_col`` partitions the population (daytime/nighttime analog,
    zscore.py:25-136).

    Plan shape: per-key stats come from a hash aggregate joined back to
    the rows, NOT an unordered window.  A whole-partition window sorts
    the full series on the keys (Exchange + Sort of every row) before
    downstream rollups pay their own Exchange; the aggregate moves only
    map-side-combined partial rows, and AQE broadcasts the stats table
    when it is small — this halves the big-side shuffles of a
    scan -> flag -> rollup pipeline (measured ~1.4x on the flag+rollup
    stage at 135M tokens).  When the population IS the input row (doc =
    series, the cascade's case) use ``zscore_flag_tokens`` instead:
    row-local stats need no second pass and no join at all."""
    parts = list(key_cols) + ([strata_col] if strata_col else [])
    v = F.col(value_col)
    # null-safe join keys: a NULL stratum (e.g. missing day/night flag)
    # is its own population, exactly as Window.partitionBy groups NULLs;
    # a plain equi-join would never match the NULL stats row and those
    # rows would silently pass unflagged.  Keys are aliased on the stats
    # side so the eqNullSafe condition is lineage-unambiguous.
    stats = df.groupBy(*parts).agg(
        F.avg(v).alias("_zs_mean"),
        F.stddev_pop(v).alias("_zs_sd"),
    ).select(
        *[F.col(c).alias(f"_zs_k{i}") for i, c in enumerate(parts)],
        "_zs_mean", "_zs_sd",
    )
    cond = None
    for i, c in enumerate(parts):
        term = F.col(c).eqNullSafe(F.col(f"_zs_k{i}"))
        cond = term if cond is None else cond & term
    joined = df.join(stats, on=cond, how="left").drop(
        *[f"_zs_k{i}" for i in range(len(parts))]
    )
    z = F.abs(F.try_divide(v - F.col("_zs_mean"), F.col("_zs_sd")))
    return _finalize_flag(joined, z > thres, value_col, flag_col).drop(
        "_zs_mean", "_zs_sd"
    )


def zscore_flag_tokens(
    tokens_df: DataFrame,
    thres: float = 4.0,
    tokens_col: str = "tokens",
    na_sentinel: float | int | None = None,
    key_cols: Sequence[str] = ("source", "doc_id"),
    flag_col: str = "flag_zscore",
) -> DataFrame:
    """Fused tokens -> flagged series: identical semantics to
    ``series_view |> zscore_flag`` when the z-score population is the
    doc itself (the cascade's case — keys (source, doc_id) == one input
    row), but computed as ROW-LOCAL array aggregates: per-doc
    sum / sum-of-squares / count in O(len) column expressions, then one
    posexplode that carries the doc's mean/sd as constants.

    Plan shape vs the generic path: the generic ``zscore_flag`` needs a
    second pass over the exploded series (stats aggregate) plus a join
    back; here the population is co-located in the row, so the whole
    scan -> flag pipeline is a single narrow map — zero joins, zero
    stat shuffles, one explode.  At 10^12 sequences this halves the
    scan work and leaves the 1m rollup exchange as the job's only
    shuffle.  Variance uses E[x2] - mean^2 — safe here because token
    values are bounded ints (no catastrophic cancellation regime);
    flags are identical to the two-pass form away from the |z - thres|
    < 1e-9 measure-zero boundary.
    """
    toks = F.col(tokens_col)
    vals = (
        F.filter(toks, lambda x: x != F.lit(na_sentinel))
        if na_sentinel is not None
        else toks
    )
    dsum = F.aggregate(
        vals, F.lit(0.0), lambda a, x: a + x.cast("double")
    )
    dss = F.aggregate(
        vals, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    n = F.size(vals)
    mean = F.try_divide(dsum, n)
    var = F.try_divide(dss, n) - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    staged = tokens_df.withColumn("_zs_mean", mean).withColumn("_zs_sd", sd)
    tok = F.col("tok")
    value = (
        F.when(tok == F.lit(na_sentinel), F.lit(None).cast("double"))
        if na_sentinel is not None
        else F.when(F.lit(False), F.lit(None).cast("double"))
    ).otherwise(tok.cast("double"))
    exploded = staged.select(
        *key_cols,
        "_zs_mean",
        "_zs_sd",
        F.posexplode(tokens_col).alias("pos", "tok"),
    ).withColumn("value", value)
    z = F.abs(F.try_divide(F.col("value") - F.col("_zs_mean"), F.col("_zs_sd")))
    return _finalize_flag(exploded, z > thres, "value", flag_col).select(
        *key_cols, "pos", "value", flag_col
    )


def zscore_increments_flag(
    df: DataFrame,
    thres: float = 30.0,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_zscore_incr",
) -> DataFrame:
    """z-score on the first difference v_t - v_{t-1}
    (diive/pkgs/outlierdetection/incremental.py:17-88)."""
    keys = list(key_cols)
    wo = Window.partitionBy(*keys).orderBy(axis_col)
    wk = Window.partitionBy(*keys)
    d = F.col(value_col) - F.lag(value_col).over(wo)
    tmp = df.withColumn("_incr", d)
    z = F.abs((F.col("_incr") - F.avg("_incr").over(wk)) / F.stddev_pop("_incr").over(wk))
    out = tmp.withColumn(
        flag_col,
        F.when(F.col(value_col).isNull(), F.lit(None).cast("int"))
        .when(F.col("_incr").isNotNull() & (z > thres), F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )
    return out.drop("_incr")


def local_sd_flag(
    df: DataFrame,
    winsize: int,
    n_sd: float = 7.0,
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_localsd",
    kernel: bool = False,
) -> DataFrame:
    """Hampel-style LocalSD flag (localsd.py:73-101): rolling median and
    rolling sample SD over a centered *row* window of the non-null rows
    (the reference drops NaN first, :77-78), min_periods=3; reject outside
    (median - n_sd*sd, median + n_sd*sd), strict.

    Window frame = [-(w//2), +(w-1)//2] rows, matching pandas
    ``rolling(window=w, center=True)`` label alignment.

    ``kernel=True`` computes the rolling median/SD as an Arrow-batched
    pandas kernel per series (``applyInPandas``) instead of the JVM
    ``percentile``-over-frame window — literally pandas'
    ``rolling(center=True, min_periods=3)``, i.e. the reference code
    itself, so flags are identical by construction (parity-tested).
    Measured 2.5x faster at sf0.1/local[32] (0.86s vs 2.19s): Spark
    re-buffers and interpolates the percentile per frame, while
    pandas' C rolling-median maintains a running window.  Requires one
    series per worker (token streams are n_tok-bounded); the JVM path
    remains the default for unbounded series.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    nn = df.where(v.isNotNull())
    if kernel:
        import pandas as pd
        import pyspark.sql.types as T

        w, min_n, thres = int(winsize), 3, float(n_sd)
        schema = T.StructType(
            [df.schema[k] for k in keys]
            + [df.schema[axis_col], T.StructField(flag_col, T.IntegerType())]
        )

        def _kern(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(axis_col)
            r = pdf[value_col].rolling(w, center=True, min_periods=min_n)
            med, sd, cnt = r.median(), r.std(), r.count()
            vv = pdf[value_col]
            rej = (vv > med + thres * sd) | (vv < med - thres * sd)
            out = pdf[[*keys, axis_col]].copy()
            flags = pd.array(
                np.where(rej.to_numpy(), 2, 0), dtype="Int32"
            )
            flags[cnt.to_numpy() < min_n] = pd.NA
            out[flag_col] = flags
            return out

        flagged = nn.select(*keys, axis_col, value_col).groupBy(
            *keys
        ).applyInPandas(_kern, schema=schema)
        return df.join(flagged, on=keys + [axis_col], how="left")
    frame = (
        Window.partitionBy(*keys)
        .orderBy(axis_col)
        .rowsBetween(-(winsize // 2), (winsize - 1) // 2)
    )
    # exact median == percentile 0.5 with linear interpolation (pandas
    # parity); Spark disallows median() over a frame but allows percentile
    rmed = F.percentile(v, F.lit(0.5)).over(frame)
    rsd = F.stddev_samp(v).over(frame)
    cnt = F.count(v).over(frame)
    upper, lower = rmed + rsd * n_sd, rmed - rsd * n_sd
    flagged = nn.withColumn(
        flag_col,
        F.when(cnt < 3, F.lit(None).cast("int"))
        .when((v > upper) | (v < lower), F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    ).select(*keys, axis_col, flag_col)
    return df.join(flagged, on=keys + [axis_col], how="left")


def abs_limits_flag(
    df: DataFrame,
    lo: float,
    hi: float,
    value_col: str = "value",
    flag_col: str = "flag_abslim",
) -> DataFrame:
    """Reject outside [lo, hi] (absolutelimits.py:191)."""
    v = F.col(value_col)
    return _finalize_flag(df, (v < lo) | (v > hi), value_col, flag_col)


def abs_limits_stratified_flag(
    df: DataFrame,
    limits: dict[object, tuple[float, float]],
    strata_col: str,
    value_col: str = "value",
    flag_col: str = "flag_abslim_strat",
) -> DataFrame:
    """Per-stratum absolute limits (AbsoluteLimitsDaytimeNighttime,
    absolutelimits.py:20-134)."""
    v = F.col(value_col)
    rejected = F.lit(False)
    for stratum, (lo, hi) in limits.items():
        rejected = F.when(
            F.col(strata_col) == F.lit(stratum), (v < lo) | (v > hi)
        ).otherwise(rejected)
    return _finalize_flag(df, rejected, value_col, flag_col)


def missing_vals_flag(
    df: DataFrame, value_col: str = "value", flag_col: str = "flag_missing"
) -> DataFrame:
    """Flag 2 where value is NULL (diive/pkgs/qaqc/flags.py:8-67)."""
    return df.withColumn(
        flag_col,
        F.when(F.col(value_col).isNull(), F.lit(FLAG_HARD)).otherwise(F.lit(FLAG_OK)),
    )


def manual_removal_flag(
    df: DataFrame,
    ranges: Sequence[tuple[int, int]],
    axis_col: str = "pos",
    value_col: str = "value",
    flag_col: str = "flag_manual",
) -> DataFrame:
    """Flag 2 inside configured [from, to] axis ranges
    (diive/pkgs/outlierdetection/manualremoval.py:18-99)."""
    a = F.col(axis_col)
    rejected = F.lit(False)
    for lo, hi in ranges:
        rejected = rejected | a.between(lo, hi)
    return _finalize_flag(df, rejected, value_col, flag_col)


def repeat_until_clean(
    df: DataFrame,
    flag_fn,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag",
    max_iterations: int = MAX_ITERATIONS,
) -> tuple[DataFrame, int]:
    """The FlagBase repeat protocol (flagbase.py:122-140): re-run
    ``flag_fn`` on the filtered series until an iteration rejects nothing.

    ``flag_fn(df, value_col, flag_col)`` must return df + a flag column
    computed on ``value_col``.  Returns (df + overall ``flag_col``,
    n_iterations).  The overall flag is 2 where rejected in any iteration,
    0 for other tested points, NULL where the original value was NULL.
    """
    work = df.withColumn("_work", F.col(value_col)).withColumn(
        "_rejected_any", F.lit(False)
    )
    n_iter = 0
    for _ in range(max_iterations):
        n_iter += 1
        flagged = flag_fn(work, "_work", "_iterflag")
        flagged = flagged.withColumn(
            "_rej", F.coalesce(F.col("_iterflag") == FLAG_HARD, F.lit(False))
        )
        flagged = flagged.localCheckpoint(eager=True)
        n_new = flagged.where(F.col("_rej")).count()
        work = (
            flagged.withColumn(
                "_work", F.when(F.col("_rej"), F.lit(None)).otherwise(F.col("_work"))
            )
            .withColumn("_rejected_any", F.col("_rejected_any") | F.col("_rej"))
            .drop("_iterflag", "_rej")
        )
        if n_new == 0:
            break
    out = work.withColumn(
        flag_col,
        F.when(F.col(value_col).isNull(), F.lit(None).cast("int"))
        .when(F.col("_rejected_any"), F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )
    return out.drop("_work", "_rejected_any"), n_iter


def ewma_chart(
    df: DataFrame,
    alpha: float = 0.2,
    window: int = 64,
    n_sigma: float = 3.0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_ewma",
    out_col: str = "ewma",
    kernel: bool = False,
) -> DataFrame:
    """EWMA control chart (Roberts 1959; NIST/SEMATECH e-handbook
    §6.3.2.4 semantics — public method, no reference-repo counterpart:
    diive's outlier battery has no drift-sensitive test; the EWMA chart
    catches slow level shifts that per-point z-scores miss).

    ``ewma_t`` is an EXACT left fold over the trailing ``window``
    non-null readings: seeded with the oldest reading in the frame,
    then ``acc*(1-alpha) + alpha*x`` — the classic recursion truncated
    to a bounded frame, so the per-row state is O(window) and no
    unbounded/whole-partition window exists in the plan.  Truncation
    error vs the infinite recursion is <= (1-alpha)^window * range
    (~1e-7 of range at the defaults).  The fold order is the frame
    order on BOTH Spark (``aggregate`` over a frame-ordered
    ``collect_list``) and any SQL engine (``list_reduce``), so the
    result is bit-deterministic and oracle-checkable.

    Control limits: per-series target = mean, asymptotic
    ``sigma_ewma = sd_pop * sqrt(alpha / (2 - alpha))``; flag ``2``
    (FLAG_HARD) where ``|ewma - mean| > n_sigma * sigma_ewma``.  Stats
    come from a hash aggregate joined back (zscore_flag's plan shape) —
    never a whole-partition window.  Null readings carry a NULL flag
    and do not enter the fold (gaps are skipped, locf-style).

    ``kernel=True`` computes the identical truncated fold as an
    Arrow-batched numpy kernel per series (``applyInPandas``) instead
    of the ``collect_list``-over-frame fold: the per-row trailing
    array is a ``window``-fold width amplification in the window
    stage, while the kernel sweeps one vectorized pass per window
    offset (O(window) passes over the series, no per-row arrays).
    The accumulator update sequence per row is EXACTLY the fold's, so
    ``ewma`` values are bit-identical (parity-tested); the fold path
    remains the default and the oracle twin.  Requires one series per
    worker (token streams are n_tok-bounded), like local_sd_flag's
    kernel."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    keys = list(key_cols)
    v = F.col(value_col)
    a = float(alpha)
    pts = df.where(v.isNotNull())
    if kernel:
        import pandas as pd
        import pyspark.sql.types as T

        w_, ns = int(window), float(n_sigma)
        schema = T.StructType(
            [df.schema[k] for k in keys]
            + [df.schema[axis_col],
               T.StructField(out_col, T.DoubleType()),
               T.StructField(flag_col, T.IntegerType())]
        )

        def _kern(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(axis_col)
            vv = pdf[value_col].to_numpy(dtype="float64")
            n = len(vv)
            t = np.arange(n)
            start = np.maximum(0, t - w_ + 1)
            acc = vv[start].copy()      # fold seed: oldest in frame
            for j in range(1, w_):
                idx = start + j
                m = idx <= t
                acc[m] = acc[m] * (1.0 - a) + a * vv[idx[m]]
            mean, sd = vv.mean(), vv.std()
            sigma = sd * math.sqrt(a / (2.0 - a))
            rej = np.abs(acc - mean) > ns * sigma
            out = pdf[[*keys, axis_col]].copy()
            out[out_col] = acc
            out[flag_col] = np.where(rej, FLAG_HARD, FLAG_OK).astype("int32")
            return out

        flagged = pts.select(*keys, axis_col, value_col).groupBy(
            *keys
        ).applyInPandas(_kern, schema=schema)
        return pts.join(flagged, on=keys + [axis_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(axis_col)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(v.cast("double")).over(w)
    ewma = F.aggregate(
        F.slice(arr, 2, window - 1),
        F.element_at(arr, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
    )
    stats = pts.groupBy(*keys).agg(
        F.avg(v).alias("_ew_mean"),
        F.stddev_pop(v).alias("_ew_sd"),
    )
    scored = pts.withColumn(out_col, ewma).join(stats, on=keys, how="left")
    sigma = F.col("_ew_sd") * F.lit(math.sqrt(a / (2.0 - a)))
    rejected = F.abs(F.col(out_col) - F.col("_ew_mean")) > F.lit(
        float(n_sigma)
    ) * sigma
    return _finalize_flag(scored, rejected, value_col, flag_col).drop(
        "_ew_mean", "_ew_sd"
    )


def cusum_chart(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    window: int = 128,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_cusum",
    kernel: bool = False,
) -> DataFrame:
    """Two-sided CUSUM changepoint chart (Page 1954; NIST/SEMATECH
    §6.3.2.3 tabular form — public method, no reference-repo
    counterpart; pairs with :func:`ewma_chart`: CUSUM accumulates
    small persistent shifts that even the EWMA smooths away).

    Readings are standardized per series (``z = (v - mean) / sd_pop``,
    stats via agg + join-back — never a whole-partition window), then

    - ``cusum_hi_t = max(0, cusum_hi_{t-1} + z_t - k)``
    - ``cusum_lo_t = max(0, cusum_lo_{t-1} - z_t - k)``

    computed as EXACT zero-seeded left folds over the trailing
    ``window`` readings — bounded per-row state, identical fold order
    on any engine (oracle-checkable), no unbounded window in the plan.
    Truncation is exact whenever the untruncated statistic touched 0
    inside the window (the in-control norm — the drift term ``-k``
    pulls it there), otherwise a lower bound; detections are therefore
    conservative, never spurious.  Flag ``2`` (FLAG_HARD) where
    ``cusum_hi > h`` or ``cusum_lo > h``.  Like :func:`ewma_chart` the
    chart is defined on OBSERVED readings — null rows are dropped from
    the output, so folds always span ``window`` readings.

    ``kernel=True``: same opt-in Arrow numpy kernel treatment as
    ewma_chart — one vectorized clamped-fold pass per window offset
    instead of a per-row 128-element ``collect_list``.  The clamped
    fold itself replays the JVM fold's operation order exactly, but
    its input ``z`` depends on mean/sd_pop whose summation order
    differs between numpy and the JVM hash aggregate, so cusum values
    agree to ~1e-12 (not bitwise; parity-tested at 1e-9 with exact
    flag agreement).  The fold path stays the default + oracle twin."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if k < 0 or h <= 0:
        raise ValueError(f"need k >= 0 and h > 0, got k={k}, h={h}")
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    if kernel:
        import pandas as pd
        import pyspark.sql.types as T

        w_, kf_, h_ = int(window), float(k), float(h)
        schema = T.StructType(
            [df.schema[kk] for kk in keys]
            + [df.schema[axis_col],
               T.StructField("cusum_hi", T.DoubleType()),
               T.StructField("cusum_lo", T.DoubleType()),
               T.StructField(flag_col, T.IntegerType())]
        )

        def _kern(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values(axis_col)
            vv = pdf[value_col].to_numpy(dtype="float64")
            n = len(vv)
            mean, sd = vv.mean(), vv.std()
            z = (vv - mean) / sd if sd > 0 else np.full(n, np.nan)
            t = np.arange(n)
            start = np.maximum(0, t - w_ + 1)
            hi = np.zeros(n)
            lo = np.zeros(n)
            for j in range(w_):              # zero seed: fold ALL frame rows
                idx = start + j
                m = idx <= t
                hi[m] = np.maximum(0.0, hi[m] + z[idx[m]] - kf_)
                lo[m] = np.maximum(0.0, lo[m] - z[idx[m]] - kf_)
            rej = (hi > h_) | (lo > h_)
            out = pdf[[*keys, axis_col]].copy()
            out["cusum_hi"] = hi
            out["cusum_lo"] = lo
            out[flag_col] = np.where(rej, FLAG_HARD, FLAG_OK).astype("int32")
            return out

        flagged = pts.select(*keys, axis_col, value_col).groupBy(
            *keys
        ).applyInPandas(_kern, schema=schema)
        return pts.join(flagged, on=keys + [axis_col], how="left")
    stats = pts.groupBy(*keys).agg(
        F.avg(v).alias("_cu_mean"),
        F.stddev_pop(v).alias("_cu_sd"),
    )
    z = F.try_divide(v - F.col("_cu_mean"), F.col("_cu_sd"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(axis_col)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(F.col("_z")).over(w)
    kf, zero = F.lit(float(k)), F.lit(0.0)

    def _fold(sign: float):
        return F.aggregate(
            arr, zero,
            lambda acc, x: F.greatest(zero, acc + F.lit(sign) * x - kf),
        )

    scored = (
        pts.join(stats, on=keys, how="left")
        .withColumn("_z", z)
        .withColumn("cusum_hi", _fold(1.0))
        .withColumn("cusum_lo", _fold(-1.0))
    )
    rejected = (F.col("cusum_hi") > h) | (F.col("cusum_lo") > h)
    return _finalize_flag(scored, rejected, value_col, flag_col).drop(
        "_cu_mean", "_cu_sd", "_z"
    )


def seasonal_zscore_flag(
    df: DataFrame,
    period: int,
    thres: float = 4.0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_seasonal_z",
) -> DataFrame:
    """Seasonal-residual z-score flag — the working analog of the
    reference's removed OutlierSTLRZ (diive retired the STL-based
    z-score in v0.68; see STATUS.md §2.5): deseasonalize by the
    per-phase MEDIAN cycle, then z-score the residual.

    A plain z-score flags every point of a strong diel cycle's crest;
    removing the phase median first (phase = ``axis_col % period``,
    diel_cycle's convention) leaves residuals that expose genuinely
    anomalous points at ANY phase.  The median cycle is robust to the
    outliers being hunted (an STL trend/seasonal fit is not, which is
    why a median cycle is the standard simplification).

    Two agg + join-back passes, both map-side combined — per-(series,
    phase) exact median, then per-series residual mean/sd_pop — never
    a whole-partition window; flag 2 (FLAG_HARD) where
    ``|residual - mean_res| / sd_res > thres``, NULL where the value
    is NULL.  Exact ``percentile(0.5)`` matches pandas/DuckDB median
    interpolation bit-for-bit, so the flag is oracle-checkable.
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    keys = list(key_cols)
    v = F.col(value_col)
    phase = F.pmod(F.col(axis_col), F.lit(period))
    staged = df.withColumn("_ph", phase)
    cyc = staged.groupBy(*keys, "_ph").agg(
        F.percentile(v, F.lit(0.5)).alias("_ph_med")
    )
    resid = staged.join(cyc, on=keys + ["_ph"], how="left").withColumn(
        "resid", v - F.col("_ph_med")
    )
    stats = resid.groupBy(*keys).agg(
        F.avg("resid").alias("_rs_mean"),
        F.stddev_pop("resid").alias("_rs_sd"),
    )
    scored = resid.join(stats, on=keys, how="left")
    z = F.abs(
        F.try_divide(F.col("resid") - F.col("_rs_mean"), F.col("_rs_sd"))
    )
    return _finalize_flag(scored, z > thres, value_col, flag_col).drop(
        "_ph", "_ph_med", "_rs_mean", "_rs_sd"
    )


def robust_zscore_flag(
    df: DataFrame,
    thres: float = 3.5,
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    flag_col: str = "flag_robust_z",
) -> DataFrame:
    """Robust (median/MAD) z-score — Iglewicz & Hoaglin's modified
    z-score (NIST/SEMATECH §1.3.5.17; public method, no reference-repo
    counterpart: diive's zScore uses mean/sd, which a single gross
    outlier inflates enough to mask its siblings).

    ``M_i = 0.6745 * (v - median) / MAD`` where ``MAD = median(|v -
    median|)``; reject ``|M| > thres`` (3.5 is the published default).
    Two aggregate+join-back passes (median, then MAD on the residual) —
    exact ``percentile(0.5)``, never a whole-partition window.  A zero
    MAD (>= half the readings identical) yields NULL scores — flagged 0
    (tested-ok), matching the reference convention that a degenerate
    population rejects nothing.  NULL values carry a NULL flag.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    med = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(0.5)).alias("_rb_med")
    )
    resid = df.join(med, on=keys, how="left")
    mad = resid.groupBy(*keys).agg(
        F.percentile(F.abs(v - F.col("_rb_med")), F.lit(0.5)).alias("_rb_mad")
    )
    scored = resid.join(mad, on=keys, how="left")
    m = F.lit(0.6745) * F.try_divide(
        v - F.col("_rb_med"),
        F.when(F.col("_rb_mad") > 0, F.col("_rb_mad")),
    )
    return _finalize_flag(scored, F.abs(m) > thres, value_col, flag_col).drop(
        "_rb_med", "_rb_mad"
    )


def page_hinkley(
    df: DataFrame,
    delta: float = 0.005,
    lam: float = 50.0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = None,
) -> DataFrame:
    """Page-Hinkley sequential drift test (Page 1954 Biometrika;
    Hinkley 1971; the standard streaming-drift detector, e.g. Gama et
    al. 2014 §3.1) for an upward mean shift, with restart-on-alarm:

        over the non-null readings in axis order:
          cnt += 1; sum += x; mean = sum/cnt
          m += x - mean - delta;  M = min(M, m)
          if m - M > lam:  alarm (count it, remember the first axis),
                           reset cnt/sum/m/M to zero (test restarts)

    Complements :func:`cusum_chart` (known target mean, two-sided
    per-point flags) with the UNKNOWN-mean sequential form whose
    statistic self-centers on the running mean — the right shape for
    unsupervised corpus-drift monitoring.  Emits per series: ``n``,
    ``n_alarms``, ``first_alarm`` (axis value, null if never),
    ``ph_stat`` (final m - M, the residual drift evidence).

    Determinism: add/divide/min on readings and literals only — every
    op correctly rounded, same sequential order in the recursive-CTE
    SQL twin, bit-identical across engines.  Scale: one groupBy
    collect per series, one row-local fold; state is 4 scalars, so
    the streaming stateful.py pattern applies unchanged if the series
    outgrows a row.
    """
    from ..conventions import KEY_COLS

    if delta < 0:
        raise ValueError(f"delta must be >= 0, got {delta}")
    if lam <= 0:
        raise ValueError(f"lam must be > 0, got {lam}")
    keys = list(key_cols) if key_cols is not None else list(KEY_COLS)
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
    d, l = F.lit(float(delta)), F.lit(float(lam))
    init = F.struct(
        F.lit(0.0).alias("cnt"),
        F.lit(0.0).alias("sum"),
        F.lit(0.0).alias("m"),
        F.lit(0.0).alias("mm"),
        F.lit(0).cast("long").alias("alarms"),
        F.lit(None).cast("long").alias("first"),
    )

    def step(acc, sx):
        cnt = acc["cnt"] + F.lit(1.0)
        s = acc["sum"] + sx["x"]
        m = acc["m"] + sx["x"] - s / cnt - d
        mm = F.when(m < acc["mm"], m).otherwise(acc["mm"])
        fired = (m - mm) > l
        return F.struct(
            F.when(fired, F.lit(0.0)).otherwise(cnt).alias("cnt"),
            F.when(fired, F.lit(0.0)).otherwise(s).alias("sum"),
            F.when(fired, F.lit(0.0)).otherwise(m).alias("m"),
            F.when(fired, F.lit(0.0)).otherwise(mm).alias("mm"),
            (acc["alarms"] + F.when(fired, 1).otherwise(0))
            .cast("long")
            .alias("alarms"),
            F.coalesce(
                acc["first"], F.when(fired, sx["p"])
            ).alias("first"),
        )

    st = F.aggregate(F.col("_arr"), init, step)
    g = g.withColumn("_st", st)
    return g.select(
        *keys,
        F.size("_arr").cast("long").alias("n"),
        F.col("_st.alarms").alias("n_alarms"),
        F.col("_st.first").alias("first_alarm"),
        (F.col("_st.m") - F.col("_st.mm")).alias("ph_stat"),
    )
