"""Forecast / state-space operators: Kalman local-level filtering,
classical seasonal decomposition, and the seasonal-naive backtest.

Reference context (diive): the reference smooths and gap-fills but never
forecasts — its closest tools are rolling means
(core/dfun/frames.py:728-747) and the fit battery (core/dfun/fits.py).
All three operators here are public textbook methods (Kalman 1960;
classical moving-average decomposition per Hyndman & Athanasopoulos FPP3
§3.4; seasonal-naive benchmark per FPP3 §5.2) that give a token-stream
pipeline the standard "is this series predictable, and by how much"
battery: the decomposition isolates a repeating phase profile, the
local-level filter tracks drift under noise with an interpretable gain,
and the backtest scores how much the seasonal structure actually buys
over a one-step carry-forward.

All pure JVM column expressions (array folds / pos-range windows /
guarded sums) — no UDFs.  The Kalman fold collects the per-series value
array (bounded by n_tok for the tokens payload; the
streaming/stateful.py partials are the unbounded-series path); the other
two run on ordered windows and never materialize a series in one row.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS


def kalman_local_level(
    df: DataFrame,
    q: float = 0.1,
    r: float = 1.0,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Kalman filter for the local-level model (Kalman 1960; Durbin &
    Koopman §2.2): state = latent level, process variance ``q``,
    observation variance ``r``.  Per pos-ordered reading::

        P_pred = P + q
        K      = P_pred / (P_pred + r)
        m'     = m + K * (x - m)         # innovation = x - m
        P'     = (1 - K) * P_pred

    with the explicit init ``m_1 = x_1, P_1 = r``.  One-step innovation
    squared errors accumulate alongside.  Computed as an EXACT left
    fold with a struct accumulator over the per-series value array
    (the holt_smooth precedent, analyses.py) so a SQL engine replaying
    the identical recurrence (recursive CTE) produces bit-identical
    doubles — oracle-checkable.

    Emits per series: ``n``, final ``level`` and error variance
    ``p_var``, the steady-state-converged ``gain`` the NEXT update
    would use (``(P+q)/((P+q)+r)``), and ``rmse`` over the n-1
    innovations (null when n < 2; all state outputs null when n < 1).

    One groupBy shuffle; O(n) row-local fold per series.
    """
    if q < 0 or r <= 0:
        raise ValueError(f"need q >= 0 and r > 0, got q={q} r={r}")
    keys = list(key_cols)
    qf, rf = float(q), float(r)
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
    g = (
        g.withColumn("_v", F.transform(F.col("_arr"), lambda s: s["x"]))
        .withColumn("_n", F.size("_v"))
        .drop("_arr")
    )
    x1 = F.element_at(F.col("_v"), 1)
    init = F.struct(
        x1.alias("m"), F.lit(rf).alias("p"), F.lit(0.0).alias("sse")
    )
    rest = F.expr("slice(_v, 2, greatest(size(_v) - 1, 0))")

    def step(acc, x):
        # write P_pred/K out in full so the SQL twin's spelled-out
        # expressions execute the identical double ops
        p_pred = acc["p"] + F.lit(qf)
        gain = p_pred / (p_pred + F.lit(rf))
        innov = x - acc["m"]
        return F.struct(
            (acc["m"] + gain * innov).alias("m"),
            ((F.lit(1.0) - gain) * p_pred).alias("p"),
            (acc["sse"] + innov * innov).alias("sse"),
        )

    state = F.aggregate(rest, init, step)
    n = F.col("_n")
    out = g.withColumn("_st", F.when(n >= 1, state))
    m = F.col("_st")["m"]
    p = F.col("_st")["p"]
    next_pred = p + F.lit(qf)
    return out.select(
        *keys,
        n.cast("long").alias("n"),
        m.alias("level"),
        p.alias("p_var"),
        (next_pred / (next_pred + F.lit(rf))).alias("gain"),
        F.when(
            n >= 2, F.sqrt(F.col("_st")["sse"] / (n - 1).cast("double"))
        ).alias("rmse"),
    )


def seasonal_decompose(
    df: DataFrame,
    period: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Classical additive seasonal decomposition (FPP3 §3.4) per series
    on the position axis, ``period`` odd:

    1. trend_t = centered moving average over pos range
       ``[t-h, t+h]`` (h = (period-1)/2), gated on ALL ``period``
       readings present (grid holes / null readings void the bin —
       the same full-window discipline as the reference's
       min-count-gated resampler, diive/core/times/resampling.py:76-97);
    2. detrended = x - trend;
    3. seasonal(phase) = mean detrended per phase (pos % period),
       re-centered so the emitted phase profile averages zero across
       the phases present;
    4. residual = detrended - seasonal(phase).

    Emits one row per (series, phase): ``phase, n_phase, seasonal``
    plus the series-level ``strength`` = max(0, 1 - Var(resid) /
    Var(detrended)) (Hyndman's seasonal-strength statistic, FPP3
    §4.3; sample variances) repeated on each row — null when fewer
    than 2 detrended readings.

    Scale shape: one pos-RANGE window pass (trend), one groupBy per
    (key, phase), one groupBy per key, and one broadcast-size join of
    the per-phase profile back onto the readings for the residual
    variance — the per-key profile table has ``period`` rows per
    series, so every join stage stays narrow.  No UDFs, no collect.
    """
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    keys = list(key_cols)
    h = (period - 1) // 2
    pos = F.col(axis_col).cast("long")
    v = F.col(value_col).cast("double")
    pts = df.select(*keys, pos.alias("_pos"), v.alias("_x"))
    w = (
        Window.partitionBy(*keys)
        .orderBy("_pos")
        .rangeBetween(-h, h)
    )
    t = pts.withColumn(
        "_trend",
        F.when(F.count("_x").over(w) == period, F.avg("_x").over(w)),
    )
    det = t.where(
        F.col("_x").isNotNull() & F.col("_trend").isNotNull()
    ).select(
        *keys,
        (F.pmod(F.col("_pos"), F.lit(period))).alias("phase"),
        (F.col("_x") - F.col("_trend")).alias("_d"),
    )
    ph = det.groupBy(*keys, "phase").agg(
        F.count("_d").alias("n_phase"), F.avg("_d").alias("_raw")
    )
    bar = ph.groupBy(*keys).agg(F.avg("_raw").alias("_bar"))
    ph = ph.join(bar, on=keys).withColumn(
        "seasonal", F.col("_raw") - F.col("_bar")
    )
    res = det.join(
        ph.select(*keys, "phase", "seasonal"), on=[*keys, "phase"]
    ).withColumn("_res", F.col("_d") - F.col("seasonal"))
    strength = res.groupBy(*keys).agg(
        F.var_samp("_d").alias("_vd"), F.var_samp("_res").alias("_vr")
    )
    strength = strength.withColumn(
        "strength",
        F.when(
            F.col("_vd") > 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vd")),
        ),
    )
    return ph.join(strength.select(*keys, "strength"), on=keys).select(
        *keys,
        F.col("phase").cast("long").alias("phase"),
        F.col("n_phase").cast("long").alias("n_phase"),
        "seasonal",
        "strength",
    )


def seasonal_naive_backtest(
    df: DataFrame,
    period: int,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (FPP3 §5.2:
    ``x̂_t = x_{t-period}``) against the naive-1 carry-forward
    benchmark (``x̂_t = x_{t-1}``), per series on the position axis.

    A reading is scored when the reading exactly ``period`` (resp. 1)
    positions earlier exists and is non-null — grid holes simply drop
    the pair, no interpolation.  Emits per series: ``n_seasonal, mae,
    rmse, bias`` (mean signed error) for the seasonal forecasts,
    ``n_naive, mae_naive`` for the benchmark, and ``skill`` = 1 -
    mae/mae_naive (positive = the seasonal structure beats
    carry-forward; null when either side scored nothing or
    mae_naive = 0).

    Scale shape: the "reading exactly k positions back" lookup is a
    pos-RANGE window frame ``[t-k, t-k]`` — one ordered window pass
    per horizon on the already-key-partitioned exchange, NO self-join
    (the equi-join formulation would shuffle the table twice on
    (key, pos)).  Then one groupBy.  All JVM expressions.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    keys = list(key_cols)
    pos = F.col(axis_col).cast("long")
    v = F.col(value_col).cast("double")
    pts = df.where(v.isNotNull()).select(*keys, pos.alias("_pos"), v.alias("_x"))

    def back(k):
        w = (
            Window.partitionBy(*keys)
            .orderBy("_pos")
            .rangeBetween(-k, -k)
        )
        return F.max("_x").over(w)

    stepped = pts.withColumn("_ps", back(period)).withColumn("_p1", back(1))
    es = F.col("_x") - F.col("_ps")
    e1 = F.col("_x") - F.col("_p1")
    agg = stepped.groupBy(*keys).agg(
        F.count(es).alias("n_seasonal"),
        F.avg(F.abs(es)).alias("mae"),
        F.sqrt(F.avg(es * es)).alias("rmse"),
        F.avg(es).alias("bias"),
        F.count(e1).alias("n_naive"),
        F.avg(F.abs(e1)).alias("mae_naive"),
    )
    skill = F.when(
        (F.col("n_seasonal") >= 1)
        & (F.col("n_naive") >= 1)
        & (F.col("mae_naive") > 0),
        F.lit(1.0) - F.col("mae") / F.col("mae_naive"),
    )
    return agg.select(
        *keys,
        F.col("n_seasonal").cast("long").alias("n_seasonal"),
        "mae",
        "rmse",
        "bias",
        F.col("n_naive").cast("long").alias("n_naive"),
        "mae_naive",
        skill.alias("skill"),
    )


def croston_forecast(
    df: DataFrame,
    alpha: float = 0.1,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Croston's method for INTERMITTENT series (Croston 1972, Oper.
    Res. Q. 23; the Syntetos-Boylan 2005 bias-corrected variant is
    emitted alongside): separate exponential smoothing of the demand
    SIZES and the inter-demand INTERVALS.  A gappy series — exactly
    the series view's shape, where sub-threshold readings are null —
    is the native input: SES of the non-null values, SES of the gaps
    between them.

        at the first demand x at 1-based step q:  z = x, p = q
        at each later demand x after interval q:  z += alpha*(x - z)
                                                  p += alpha*(q - p)
        forecast     = z / p          (Croston)
        forecast_sba = (1 - alpha/2) * z / p   (Syntetos-Boylan)

    The reference never forecasts (see module docstring); plain SES /
    Holt (``holt_smooth``) is badly biased on intermittent streams —
    this is the standard fix (FPP3 §13.2).  Emits per series: ``n``
    (grid length), ``n_demands``, ``z``, ``p``, ``forecast``,
    ``forecast_sba``; series with no demand yield nulls.

    Determinism: the update chain is mult/add/divide on the readings
    and the literal alpha — every op correctly rounded, evaluated in
    the same sequential order by a recursive-CTE SQL twin, so the
    result matches bit-for-bit.  Scale shape: one groupBy collect per
    series, one row-local fold (the streaming stateful.py partials
    are the unbounded-series path for the tier family; Croston state
    is 3 scalars and composes the same way if ever needed there).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    keys = list(key_cols)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(axis_col).cast("long").alias("p"),
                F.col(value_col).cast("double").alias("x"),
            )
        )
    )
    g = df.groupBy(*keys).agg(arr.alias("_arr"))
    a = F.lit(float(alpha))
    # state: z, p (smoothed size/interval), q (steps since last
    # demand), k (demand count)
    init = F.struct(
        F.lit(None).cast("double").alias("z"),
        F.lit(None).cast("double").alias("p"),
        F.lit(0.0).alias("q"),
        F.lit(0).cast("long").alias("k"),
    )

    def step(acc, sx):
        q1 = acc["q"] + F.lit(1.0)
        is_demand = sx["x"].isNotNull()
        first = acc["k"] == 0
        z_new = (
            F.when(~is_demand, acc["z"])
            .when(first, sx["x"])
            .otherwise(acc["z"] + a * (sx["x"] - acc["z"]))
        )
        p_new = (
            F.when(~is_demand, acc["p"])
            .when(first, q1)
            .otherwise(acc["p"] + a * (q1 - acc["p"]))
        )
        return F.struct(
            z_new.alias("z"),
            p_new.alias("p"),
            F.when(is_demand, F.lit(0.0)).otherwise(q1).alias("q"),
            (acc["k"] + F.when(is_demand, 1).otherwise(0))
            .cast("long")
            .alias("k"),
        )

    st = F.aggregate(F.col("_arr"), init, step)
    g = g.withColumn("_st", st)
    z, p = F.col("_st.z"), F.col("_st.p")
    fc = F.when(p > 0, z / p)
    return g.select(
        *keys,
        F.size("_arr").cast("long").alias("n"),
        F.col("_st.k").alias("n_demands"),
        z.alias("z"),
        p.alias("p"),
        fc.alias("forecast"),
        (F.lit(1.0 - float(alpha) / 2.0) * fc).alias("forecast_sba"),
    )
