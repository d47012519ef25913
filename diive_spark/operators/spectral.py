"""Frequency-domain / correlation-structure operators: discrete-Fourier
periodogram peak and Yule-Walker partial autocorrelations.

Reference context (diive): the reference carries no spectral tooling —
its periodicity checks are visual (diel/heatmap plots,
diive/core/plotting) and its correlation battery stops at plain lagged
Pearson (daily_correlation, pkgs/analyses/correlation.py:8-55).  Both
operators here are public textbook methods (periodogram: Schuster 1898 /
Brockwell & Davis §10.1; PACF via Durbin-Levinson: Durbin 1960,
Box & Jenkins §3.2.5) that complete the degeneration battery for token
streams: :func:`diive_spark.operators.analyses.acf_agg` says a stream is
looping, :func:`dft_power_peak` says at WHICH frequency, and
:func:`pacf_yule_walker` says how many AR lags actually carry signal.

Both are pure JVM column expressions (array folds / guarded sums) — no
UDFs, one groupBy shuffle each; per-series state is the value array,
bounded by n_tok for the tokens payload.
"""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS

_TWO_PI = 2.0 * math.pi


def dft_power_peak(
    df: DataFrame,
    max_k: int = 24,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Per-series periodogram over the first ``max_k`` Fourier
    frequencies and the dominant one (Schuster 1898's periodogram; the
    direct DFT form so a SQL twin can replay it with plain SUMs).

    For the mean-removed, pos-ordered readings ``x_0..x_{n-1}``::

        C_k = sum_i x_i * cos(2*pi*k*i / n)
        S_k = sum_i x_i * sin(2*pi*k*i / n)
        P_k = C_k^2 + S_k^2            for k = 1..min(max_k, n//2)

    Emits per series: ``n``, ``k_peak`` (argmax of P_k on ROUND-6
    values with smallest-k tie-break, so the winner is stable across
    engines and summation orders), ``period`` (= n / k_peak), the
    peak's ``power`` and its share of the emitted band's total
    (``power_frac``).  Series with < 4 readings yield nulls.

    Scale shape: one groupBy collect per series, then an O(n * max_k)
    row-local array fold — all JVM expressions inside whole-stage
    codegen, no explode of the (reading x frequency) cross product and
    no second shuffle.  ``max_k`` bounds per-row work; the per-series
    array is bounded by n_tok.  A naive cross-join formulation would
    shuffle n*max_k rows; this shuffles n.
    """
    if max_k < 1:
        raise ValueError(f"max_k must be >= 1, got {max_k}")
    keys = list(key_cols)
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
    n_d = F.col("_n").cast("double")
    mean = F.aggregate(
        F.col("_v"), F.lit(0.0), lambda acc, x: acc + x
    ) / n_d
    g = g.withColumn("_mu", mean)
    # k ranges over 1..min(max_k, n//2); empty when n < 4
    ks = F.when(
        F.col("_n") >= 4,
        F.sequence(
            F.lit(1), F.least(F.lit(int(max_k)), (F.col("_n") / 2).cast("int"))
        ),
    )

    def _power(k):
        # fold over (index, value): acc = (i, c, s)
        w = F.lit(_TWO_PI) * k.cast("double") / n_d
        init = F.struct(
            F.lit(0).cast("long").alias("i"),
            F.lit(0.0).alias("c"),
            F.lit(0.0).alias("s"),
        )

        def step(acc, x):
            ang = w * acc["i"].cast("double")
            xd = x - F.col("_mu")
            return F.struct(
                (acc["i"] + 1).alias("i"),
                (acc["c"] + xd * F.cos(ang)).alias("c"),
                (acc["s"] + xd * F.sin(ang)).alias("s"),
            )

        st = F.aggregate(F.col("_v"), init, step)
        return st["c"] * st["c"] + st["s"] * st["s"]

    g = g.withColumn(
        "_pk",
        F.transform(
            ks,
            lambda k: F.struct(
                k.cast("long").alias("k"), _power(k).alias("p")
            ),
        ),
    )
    # argmax on round-6 power, smallest-k tie-break: sort by
    # (-p_round6, k) and take the head — deterministic across engines
    best = F.element_at(
        F.expr(
            "array_sort(_pk, (a, b) -> CASE "
            "WHEN round(a.p, 6) > round(b.p, 6) THEN -1 "
            "WHEN round(a.p, 6) < round(b.p, 6) THEN 1 "
            "WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1 ELSE 0 END)"
        ),
        1,
    )
    total = F.aggregate(
        F.col("_pk"), F.lit(0.0), lambda acc, s: acc + s["p"]
    )
    return g.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        best["k"].alias("k_peak"),
        F.when(best["k"].isNotNull(), n_d / best["k"].cast("double")).alias(
            "period"
        ),
        best["p"].alias("power"),
        F.when(total > 0, best["p"] / total).alias("power_frac"),
    )


def pacf_yule_walker(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Partial autocorrelations at lags 1..3 per series via the
    closed-form Durbin-Levinson recursion on Yule-Walker
    autocorrelations (Durbin 1960; Box & Jenkins §3.2.5) — the AR-order
    tell: an AR(p) stream has pacf ~ 0 beyond lag p, so pacf2/pacf3
    separate "one-step momentum" token streams from genuinely
    higher-order loops that acf alone smears together.

    Autocorrelations use the standard stationary estimator over the
    pos-ordered readings (global mean, lag-0 sum of squares
    denominator)::

        r_k = sum_{t=k..n-1} (x_t - m)(x_{t-k} - m) / sum (x_t - m)^2

    then::

        pacf1 = r1
        pacf2 = (r2 - r1^2) / (1 - r1^2)
        pacf3 = (r3 - phi21*r2 - phi22*r1) / (1 - phi21*r1 - phi22*r2)
                with phi22 = pacf2, phi21 = r1*(1 - pacf2)

    Emitted per series: ``n, r1, r2, r3, pacf1, pacf2, pacf3``; lags
    needing more data than the series holds (n < k+1) and
    zero-variance/degenerate denominators (|den| < 1e-12) yield null.

    Scale shape: lag pairs come from one ordered window pass (3 lag
    columns), the sums from one groupBy — two narrow shuffles on the
    series key, all JVM expressions, no collect of the series array
    (works on unbounded series, unlike the fold-based operators).
    """
    keys = list(key_cols)
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    stepped = (
        pts.withColumn("_l1", F.lag(v, 1).over(w))
        .withColumn("_l2", F.lag(v, 2).over(w))
        .withColumn("_l3", F.lag(v, 3).over(w))
    )
    agg = stepped.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_ss"),
        F.sum(v * F.col("_l1")).alias("_c1"),
        F.sum(F.when(F.col("_l1").isNotNull(), v)).alias("_sa1"),
        F.sum(F.col("_l1")).alias("_sb1"),
        F.sum(v * F.col("_l2")).alias("_c2"),
        F.sum(F.when(F.col("_l2").isNotNull(), v)).alias("_sa2"),
        F.sum(F.col("_l2")).alias("_sb2"),
        F.sum(v * F.col("_l3")).alias("_c3"),
        F.sum(F.when(F.col("_l3").isNotNull(), v)).alias("_sa3"),
        F.sum(F.col("_l3")).alias("_sb3"),
    )
    n = F.col("n").cast("double")
    m = F.col("_s") / n
    # denominator: sum (x - m)^2 = ss - n m^2
    den0 = F.col("_ss") - n * m * m

    def _r(k):
        # sum over the n-k pairs of (x_t - m)(x_{t-k} - m)
        # = c_k - m*(sa_k + sb_k) + (n-k)*m^2
        c = F.col(f"_c{k}")
        sa, sb = F.col(f"_sa{k}"), F.col(f"_sb{k}")
        num = c - m * (sa + sb) + (n - F.lit(float(k))) * m * m
        return F.when(
            (F.col("n") >= k + 1) & (den0 > F.lit(1e-12)), num / den0
        )

    agg = (
        agg.withColumn("r1", _r(1))
        .withColumn("r2", _r(2))
        .withColumn("r3", _r(3))
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    p2_den = F.lit(1.0) - r1 * r1
    pacf2 = F.when(F.abs(p2_den) > 1e-12, (r2 - r1 * r1) / p2_den)
    agg = agg.withColumn("pacf2", pacf2)
    phi22 = F.col("pacf2")
    phi21 = r1 * (F.lit(1.0) - phi22)
    p3_den = F.lit(1.0) - phi21 * r1 - phi22 * r2
    pacf3 = F.when(
        F.abs(p3_den) > 1e-12, (r3 - phi21 * r2 - phi22 * r1) / p3_den
    )
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        "r1",
        "r2",
        "r3",
        r1.alias("pacf1"),
        "pacf2",
        pacf3.alias("pacf3"),
    )
