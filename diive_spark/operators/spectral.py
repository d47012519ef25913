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


def _let(expr, body):
    """Let-binding via a single-element transform: the lambda argument
    is evaluated ONCE per row, so a reused subexpression is not
    re-inlined (and re-computed) at every mention — Catalyst's
    projection collapse otherwise turns nested array folds into
    O(n^2) work per row."""
    return F.element_at(F.transform(F.array(expr), body), 1)


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


HURST_SIZES = (8, 16, 32, 64)


def hurst_rs(
    df: DataFrame,
    sizes: Sequence[int] = HURST_SIZES,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Hurst exponent per series by rescaled-range (R/S) analysis
    (Hurst 1951; Mandelbrot & Wallis 1969 — the classic long-range-
    dependence estimator): H ~ 0.5 = memoryless, H > 0.5 = persistent
    trends, H < 0.5 = mean-reverting.  The long-memory tell that
    completes the correlation battery — :func:`pacf_yule_walker` sees
    short AR structure, R/S sees power-law persistence PACF truncates.

    For each block size ``s``: split the pos-ordered non-null readings
    into complete blocks of ``s``; per block compute the cumulative
    deviations ``Z_t = cs_t - t * mean`` (cs = running sum), the range
    ``R = max Z - min Z`` and the population SD; ``RS = R / SD``
    (zero-SD blocks are skipped).  Per size: mean RS over complete
    blocks.  ``H`` = OLS slope of ln(mean RS) on ln(s) across sizes
    with a valid mean (null when fewer than 2 sizes qualify).

    Emits one row per (series, s): ``s, n_blocks, avg_rs`` plus the
    series-level ``h`` repeated on each row.

    Scale shape: per size, ONE window pass (running sum + block total
    as two frames over the same sort) and one groupBy per block — all
    on the series-key exchange, no collect, per-block state is 5
    scalars, so series length is unbounded.  The sizes loop unions
    len(sizes) such branches (bounded, default 4); the final OLS is a
    groupBy over <= len(sizes) rows per series.  No UDFs.
    """
    if len(sizes) < 2 or any(s < 2 for s in sizes):
        raise ValueError(f"need >= 2 sizes, all >= 2, got {sizes!r}")
    keys = list(key_cols)
    v = F.col(value_col).cast("double")
    pts = df.where(F.col(value_col).isNotNull())
    wseq = Window.partitionBy(*keys).orderBy(axis_col)
    pts = pts.select(
        *keys, v.alias("_x"), (F.row_number().over(wseq) - 1).alias("_rn")
    )
    per_size = []
    for s in sizes:
        sl = F.lit(int(s))
        b = (F.col("_rn") / sl).cast("long")
        t = pts.withColumn("_b", b).withColumn(
            "_k", (F.col("_rn") % sl + 1).cast("double")
        )
        wb = Window.partitionBy(*keys, "_b").orderBy("_rn")
        t = t.withColumn(
            "_cs",
            F.sum("_x").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        ).withColumn(
            "_tot",
            F.sum("_x").over(
                wb.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        z = F.col("_cs") - F.col("_k") * (F.col("_tot") / sl.cast("double"))
        blk = t.groupBy(*keys, "_b").agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.max(z).alias("_zmax"),
            F.min(z).alias("_zmin"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
        sm = F.col("_sx") / sl.cast("double")
        var = F.col("_sxx") / sl.cast("double") - sm * sm
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        rs = F.when(
            (F.col("_cnt") == s) & (std > 0),
            (F.col("_zmax") - F.col("_zmin")) / std,
        )
        per_size.append(
            blk.groupBy(*keys).agg(
                F.lit(int(s)).cast("long").alias("s"),
                F.count(rs).alias("n_blocks"),
                F.avg(rs).alias("avg_rs"),
            )
        )
    tall = per_size[0]
    for extra in per_size[1:]:
        tall = tall.unionByName(extra)
    x = F.log(F.col("s").cast("double"))
    y = F.when(F.col("avg_rs") > 0, F.log(F.col("avg_rs")))
    xv = F.when(y.isNotNull(), x)
    ols = tall.groupBy(*keys).agg(
        F.count(y).alias("_p"),
        F.sum(xv).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(xv * y).alias("_sxy"),
        F.sum(xv * xv).alias("_sxx"),
    )
    p = F.col("_p").cast("double")
    den = p * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    h = F.when(
        (F.col("_p") >= 2) & (F.abs(den) > 1e-12),
        (p * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den,
    )
    return tall.join(ols.select(*keys, h.alias("h")), on=keys).select(
        *keys,
        F.col("s"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        "avg_rs",
        "h",
    )


DTW_SENTINEL = 1.0e30


def dtw_to_exemplar(
    df: DataFrame,
    exemplar_doc: str = "0",
    segments: int = 24,
    radius: int = 4,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Banded dynamic-time-warping distance of every series to its
    group's exemplar series (DTW: Sakoe & Chiba 1978; the Keogh
    lower-bound school's standard |i-j| <= radius band) — the
    shape-alignment complement of :func:`sax_motif_buckets`: SAX words
    bucket candidates coarsely, DTW ranks how well a series' z-shape
    aligns to a reference allowing local time warps that plain
    Euclidean/correlation distance punishes.

    Pipeline per series: z-normalize (population moments; flat series
    map to all-zeros — the SAX convention) -> PAA to ``segments``
    equal slices (the published DTW-at-scale recipe: warp the PAA
    sketch, not the raw signal) -> banded DP against the exemplar of
    the same group (``doc = exemplar_doc``)::

        cost(i,j) = |x_i - y_j| + min(cost(i-1,j), cost(i-1,j-1),
                                      cost(i,j-1))   for |i-j| <= radius

    computed as an EXACT nested array fold (outer fold over rows
    carrying the previous DP row, inner fold building each row left to
    right) — all JVM expressions, NO UDF; out-of-band cells hold a
    1e30 sentinel that never wins a min.  DP values are
    order-independent, so a SQL engine replaying the grid in diagonal
    order (recursive CTE) reproduces them bit-for-bit on identical
    inputs — oracle-checkable.

    Emits per series: ``n_seg`` and ``dtw`` (null when the series or
    its group's exemplar has fewer non-null readings than
    ``segments``, or the exemplar is absent).  The exemplar scores 0
    against itself.

    Scale shape: the SAX-pipeline exchanges (one window pass + two
    groupBys on the series key) reduce every series to a
    ``segments``-float sketch; exemplars (one row per group) broadcast;
    the O(segments^2) DP is row-local and constant-bounded (24x24 =
    576 fused cells).  Series count is the parallel axis; nothing
    quadratic in series length or corpus size.
    """
    if segments < 2:
        raise ValueError(f"segments must be >= 2, got {segments}")
    if not 1 <= radius <= segments:
        raise ValueError(f"radius must be in [1, {segments}], got {radius}")
    keys = list(key_cols)
    if len(keys) < 2:
        raise ValueError("need >= 2 key cols: (*group, doc)")
    group_cols, doc_col = keys[:-1], keys[-1]
    seg_n = int(segments)
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
        F.col("_ci") * F.lit(seg_n) / F.col("_n")
    ).cast("long")
    paa = (
        pts.join(stats, keys)
        .select(*keys, seg.alias("_seg"), z.alias("_z"))
        .groupBy(*keys, "_seg")
        .agg(F.avg("_z").alias("_paa"))
    )
    arr = (
        paa.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_seg"), F.col("_paa")))
            ).alias("_a")
        )
        .select(
            *keys,
            F.transform(F.col("_a"), lambda s: s["_paa"]).alias("va"),
        )
        .withColumn("n_seg", F.size("va"))
    )
    ex = arr.where(F.col(doc_col) == exemplar_doc).select(
        *group_cols, F.col("va").alias("_ya"), F.col("n_seg").alias("_yn")
    )
    j = arr.join(F.broadcast(ex), on=group_cols, how="left")
    cost = _dtw_cost(F.col("va"), F.col("_ya"), seg_n, radius)
    ok = (F.col("n_seg") == seg_n) & (F.col("_yn") == seg_n)
    return j.select(
        *keys,
        F.col("n_seg").cast("long").alias("n_seg"),
        F.when(ok, cost).alias("dtw"),
    )


def _dtw_cost(xa, ya, seg_n: int, radius: int):
    """Banded DTW DP cost between two equal-length ``seg_n`` double
    arrays as a pure nested JVM fold (outer fold over rows carrying
    the previous DP row; inner fold builds each row left to right) —
    the exact Sakoe-Chiba recurrence, no UDF.  Out-of-band cells hold
    the :data:`DTW_SENTINEL` that never wins a min.  DP values are
    order-independent, so a SQL engine replaying the grid in diagonal
    order (recursive CTE) reproduces them bit-for-bit."""
    sent = F.lit(DTW_SENTINEL)
    init = F.array(F.lit(0.0), *[sent for _ in range(seg_n)])

    def outer(prev, i):
        def inner(acc2, jj):
            w = F.abs(F.element_at(xa, i) - F.element_at(ya, jj))
            cell = F.when(
                F.abs(i - jj) <= radius,
                w
                + F.least(
                    F.element_at(prev, jj + F.lit(1)),
                    F.element_at(prev, jj),
                    F.element_at(acc2, jj),
                ),
            ).otherwise(sent)
            return F.concat(acc2, F.array(cell))

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(seg_n)), F.array(sent), inner
        )

    rows = F.aggregate(F.sequence(F.lit(1), F.lit(seg_n)), init, outer)
    return F.element_at(rows, seg_n + 1)


def sax_dtw_motifs(
    df: DataFrame,
    segments: int = 8,
    alphabet: int = 4,
    radius: int = 3,
    max_bucket: int = 32,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Cross-series motif verification: SAX-word bucket FIRST, exact
    banded DTW only WITHIN buckets — the documented scale recipe of
    :func:`~..analyses.sax_motif_buckets` ("candidate buckets can then
    be verified exactly ... only within buckets, never all-pairs")
    made a first-class operator.  Lin et al. DMKD 2003 §5 (SAX as an
    index) + Sakoe & Chiba 1978 (the banded DP); diive's pattern
    tooling is histogram/peak-bin based (diive/pkgs/analyses/
    histogram.py:14-122), with no symbolic index or alignment
    distance — this is target-side capability.

    Per series: z-normalize -> ``segments``-slice PAA -> SAX word
    over ``alphabet`` Gaussian breakpoints.  Series sharing a word
    form a candidate bucket; within each bucket every (sid_a < sid_b)
    pair gets an exact banded DTW distance over the z-PAA sketches
    (:func:`_dtw_cost` — pure JVM fold, no UDF).  Only series with a
    full ``segments``-slot sketch participate (shorter series cannot
    produce a comparable word).

    Hot-bucket guard (the dedup.py minhash star-link pattern): a
    bucket with more than ``max_bucket`` members would emit O(B^2)
    pairs — at 10^12 series a degenerate word (e.g. every near-flat
    series) is a guaranteed skew bomb.  Such buckets degrade to
    star-link pairs against the bucket's min-sid anchor: O(B) rows,
    and connectivity through the anchor still links every member for
    a downstream connected-components pass.  ``pair_kind`` says which
    regime produced each row ('full' | 'star').

    Scale shape: the SAX pipeline is the single-exchange-on-series-key
    layout; bucketing adds ONE equi-shuffle on the 8-letter word
    (narrow rows: sid + word + ``segments`` doubles); pair DTW is
    row-local and constant-bounded.  Nothing is quadratic in corpus
    size or series length; per-bucket blowup is capped by
    ``max_bucket``.
    """
    if segments < 2:
        raise ValueError(f"segments must be >= 2, got {segments}")
    if not 1 <= radius <= segments:
        raise ValueError(f"radius must be in [1, {segments}], got {radius}")
    if max_bucket < 2:
        raise ValueError(f"max_bucket must be >= 2, got {max_bucket}")
    from .analyses import SAX_BREAKPOINTS

    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be one of {sorted(SAX_BREAKPOINTS)}, "
            f"got {alphabet}"
        )
    bps = SAX_BREAKPOINTS[alphabet]
    keys = list(key_cols)
    seg_n = int(segments)
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
        F.col("_ci") * F.lit(seg_n) / F.col("_n")
    ).cast("long")
    paa = (
        pts.join(stats, keys)
        .select(*keys, seg.alias("_seg"), z.alias("_z"))
        .groupBy(*keys, "_seg")
        .agg(F.avg("_z").alias("_paa"))
    )
    sym = F.lit(0)
    for bp in bps:
        sym = sym + F.when(F.col("_paa") > F.lit(float(bp)), 1).otherwise(0)
    sid = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    members = (
        paa.withColumn("_letter", F.char(sym + F.lit(97)))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_seg"), F.col("_letter"),
                                        F.col("_paa")))
            ).alias("_a")
        )
        .where(F.size("_a") == seg_n)
        .select(
            sid.alias("sid"),
            F.array_join(
                F.transform(F.col("_a"), lambda s: s["_letter"]), ""
            ).alias("word"),
            F.transform(F.col("_a"), lambda s: s["_paa"]).alias("va"),
        )
    )
    buckets = members.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_series"),
        F.min("sid").alias("_anchor"),
    ).where(F.col("n_series") >= 2)
    tagged = members.join(buckets, "word")
    full = tagged.where(F.col("n_series") <= int(max_bucket))
    hot = tagged.where(F.col("n_series") > int(max_bucket))
    a = full.select(
        "word", "n_series",
        F.col("sid").alias("sid_a"), F.col("va").alias("_xa"),
    )
    b = full.select(
        "word", F.col("sid").alias("sid_b"), F.col("va").alias("_yb"),
    )
    full_pairs = (
        a.join(b, "word")
        .where(F.col("sid_a") < F.col("sid_b"))
        .withColumn("pair_kind", F.lit("full"))
    )
    hot_anchor = hot.where(F.col("sid") == F.col("_anchor")).select(
        "word", F.col("sid").alias("sid_a"), F.col("va").alias("_xa"),
    )
    star_pairs = (
        hot.where(F.col("sid") != F.col("_anchor"))
        .select(
            "word", "n_series",
            F.col("sid").alias("sid_b"), F.col("va").alias("_yb"),
        )
        .join(hot_anchor, "word")
        .withColumn("pair_kind", F.lit("star"))
    )
    cols = ["word", "n_series", "sid_a", "sid_b", "pair_kind",
            "_xa", "_yb"]
    pairs = full_pairs.select(*cols).unionByName(star_pairs.select(*cols))
    cost = _dtw_cost(F.col("_xa"), F.col("_yb"), seg_n, radius)
    return pairs.select(
        "word", "n_series", "sid_a", "sid_b", "pair_kind",
        cost.alias("dtw"),
    )


def variance_ratio(
    df: DataFrame,
    q: int = 4,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Variance-ratio random-walk test per series (Lo & MacKinlay 1988,
    homoscedastic form, overlapping q-differences): VR(q) ~ 1 under a
    random walk, > 1 for trending/persistent streams, < 1 for
    mean-reverting ones — the hypothesis-test companion to
    :func:`hurst_rs` (H estimates the exponent, VR's z-statistic says
    whether the departure from memorylessness is significant).

    Over the pos-ordered non-null readings ``x_1..x_n`` with
    ``mu = (x_n - x_1) / (n - 1)``::

        sig1 = sum_{t=2..n}   (x_t - x_{t-1} - mu)^2     / (n - 1)
        sigq = sum_{t=q+1..n} (x_t - x_{t-q} - q*mu)^2   / (q * (n - q))
        VR   = sigq / sig1
        z    = (VR - 1) * sqrt(3 * q * (n - q)
                               / (2 * (2*q - 1) * (q - 1)))

    Emitted per series: ``n, mu, vr, z``; null when n < q + 1 or the
    lag-1 variance is ~0 (constant/deterministic-ramp series).

    Scale shape: two window lags + one groupBy of guarded sums — the
    pacf_yule_walker plan (two narrow exchanges on the series key, 6
    scalars of per-series state, unbounded series, no UDFs).
    """
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    keys = list(key_cols)
    v = F.col(value_col).cast("double")
    pts = df.where(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(axis_col)
    stepped = (
        pts.withColumn("_l1", F.lag(v, 1).over(w))
        .withColumn("_lq", F.lag(v, q).over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    agg = stepped.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.min_by(v, F.col("_rn")).alias("_x1"),
        F.max_by(v, F.col("_rn")).alias("_xn"),
        F.sum(
            (v - F.col("_l1")) * (v - F.col("_l1"))
        ).alias("_s1sq"),
        F.sum(v - F.col("_l1")).alias("_s1"),
        F.sum(
            (v - F.col("_lq")) * (v - F.col("_lq"))
        ).alias("_sqsq"),
        F.sum(v - F.col("_lq")).alias("_sq"),
        F.count(F.col("_l1")).alias("_n1"),
        F.count(F.col("_lq")).alias("_nq"),
    )
    n = F.col("n").cast("double")
    mu = F.when(
        F.col("n") >= 2, (F.col("_xn") - F.col("_x1")) / (n - 1.0)
    )
    # sum (d - c)^2 = sum d^2 - 2 c sum d + cnt * c^2
    qf = float(q)
    s1 = (
        F.col("_s1sq")
        - 2.0 * mu * F.col("_s1")
        + F.col("_n1").cast("double") * mu * mu
    ) / (n - 1.0)
    sq = (
        F.col("_sqsq")
        - 2.0 * (F.lit(qf) * mu) * F.col("_sq")
        + F.col("_nq").cast("double") * (F.lit(qf) * mu) * (F.lit(qf) * mu)
    ) / (F.lit(qf) * F.col("_nq").cast("double"))
    vr = F.when(
        (F.col("n") >= q + 1) & (s1 > 1e-12), sq / s1
    )
    z = vr.isNotNull()
    zstat = F.when(
        z,
        (vr - 1.0)
        * F.sqrt(
            F.lit(3.0 * qf)
            * F.col("_nq").cast("double")
            / F.lit(2.0 * (2.0 * qf - 1.0) * (qf - 1.0))
        ),
    )
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        mu.alias("mu"),
        vr.alias("vr"),
        zstat.alias("z"),
    )


def top_correlated_pairs(
    df: DataFrame,
    top_k: int = 5,
    min_overlap: int = 30,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    method: str = "pearson",
) -> DataFrame:
    """Most-correlated series pairs within each group: exact Pearson r
    over position-aligned readings for every within-group doc pair,
    ranked by |r| (deterministic tie-break on rounded |r|, then the
    pair ids) — the cross-SERIES companion of the reference's
    daily_correlation (diive/pkgs/analyses/correlation.py:8-55, which
    correlates two COLUMNS per calendar bucket): which token streams
    move together.

    Pairs need at least ``min_overlap`` aligned non-null readings;
    ``a < b`` on the doc id keeps each pair once.  Correlation is
    assembled from guarded component sums (NOT F.corr — ANSI division
    by zero on constant streams; the acf_agg precedent), null on
    zero-variance sides.

    ``method="spearman"`` first replaces each series' values by their
    fractional (average-tie) ranks WITHIN the series (Spearman 1904;
    Kendall 1948 ch.3 tie handling), then runs the same Pearson
    machinery — the rank-transform correlation.  Ranks are per-series
    (not per-pair-overlap): identical to textbook Spearman whenever
    the pair shares the full axis, and the only formulation that
    scales (per-pair re-ranking would be O(pairs x n) extra passes).
    Monotone-robust: outliers and nonlinear monotone warps that
    break Pearson leave rho intact.

    Scale shape: ONE equi-join on (group, pos) — readings meet their
    pair partners co-partitioned by position, no cartesian — then one
    groupBy per pair and a per-group TOP-K window over the pair
    aggregate (<= docs² rows per group, never the readings).  The
    within-group pair count is quadratic in docs-per-group BY
    DEFINITION of all-pairs output; at 10^12-series scale the recipe
    is sax_motif_buckets / similarity LSH first, then this exact pass
    bucket-locally (the dedup_minhash_lsh pattern).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_overlap < 3:
        raise ValueError(f"min_overlap must be >= 3, got {min_overlap}")
    if method not in ("pearson", "spearman"):
        raise ValueError(f"method must be pearson|spearman, got {method!r}")
    keys = list(key_cols)
    group_cols, doc_col = keys[:-1], keys[-1]
    pts = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(doc_col).alias("_doc"),
        F.col(axis_col).alias("_pos"),
        F.col(value_col).cast("double").alias("_x"),
    )
    if method == "spearman":
        # fractional (average-tie) ranks per series: min-rank + half
        # the tie-group size; Pearson over these ranks IS Spearman's
        # rho (Spearman 1904; tie correction per Kendall 1948 ch.3).
        # Two extra per-series window passes, still no collect.
        wr = Window.partitionBy(*group_cols, "_doc").orderBy("_x")
        wt = Window.partitionBy(*group_cols, "_doc", "_x")
        pts = pts.withColumn(
            "_x",
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2,
        )
    left = pts
    right = (
        pts.withColumnRenamed("_doc", "_doc_b")
        .withColumnRenamed("_x", "_y")
    )
    pairs = left.join(right, on=[*group_cols, "_pos"]).where(
        F.col("_doc") < F.col("_doc_b")
    )
    agg = pairs.groupBy(*group_cols, "_doc", "_doc_b").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum("_x").alias("_sa"),
        F.sum("_y").alias("_sb"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sab"),
        F.sum(F.col("_x") * F.col("_x")).alias("_saa"),
        F.sum(F.col("_y") * F.col("_y")).alias("_sbb"),
    )
    n = F.col("n_overlap").cast("double")
    cov_n = n * F.col("_sab") - F.col("_sa") * F.col("_sb")
    va_n = n * F.col("_saa") - F.col("_sa") * F.col("_sa")
    vb_n = n * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    r = F.when(
        (F.col("n_overlap") >= min_overlap) & (va_n > 0) & (vb_n > 0),
        cov_n / F.sqrt(va_n * vb_n),
    )
    scored = agg.withColumn("r", r).where(F.col("r").isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.round(F.abs(F.col("r")), 6).desc(),
        F.col("_doc").asc(),
        F.col("_doc_b").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            *group_cols,
            F.col("rank").cast("long").alias("rank"),
            F.col("_doc").alias("doc_a"),
            F.col("_doc_b").alias("doc_b"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            "r",
        )
    )


def lomb_scargle_peak(
    df: DataFrame,
    max_k: int = 24,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Lomb-Scargle periodogram peak for IRREGULARLY sampled series
    (Lomb 1976, Scargle 1982; the tau-corrected normalized form of
    Horne & Baliunas 1986).  Where :func:`dft_power_peak` assumes the
    readings are equally spaced (it indexes them 0..n-1 and ignores
    the axis), Lomb-Scargle evaluates the fit at the TRUE sample
    positions, so gaps and uneven spacing do not alias the estimate —
    the natural spectral tool for a gappy sensor stream.  The
    reference has no spectral tooling at all (its periodicity checks
    are visual heatmaps, diive/core/plotting); this is target-side
    capability.

    For the non-null readings (t_i, y_i), candidate angular
    frequencies w_k = 2*pi*k / P for k = 1..max_k with P = span of the
    axis (t_max - t_min + 1):

        tau_k = atan2(sum sin(2 w t_i), sum cos(2 w t_i)) / (2 w)
        P_k   = [ (sum dy cos(w (t_i - tau)))^2 / sum cos^2(w (t_i - tau))
                + (sum dy sin(w (t_i - tau)))^2 / sum sin^2(w (t_i - tau)) ]
                / (2 * sigma^2)                 with dy = y_i - mean

    Emits per series: ``n``, ``k_peak`` (argmax of P_k on ROUND-6
    values with smallest-k tie-break — the dft_power_peak comparator,
    stable across engines and summation orders), ``freq`` (= k/P,
    cycles per axis unit) and the normalized ``power`` at the peak.
    Series with < 8 readings, zero variance, or a degenerate
    cos/sin column (CC or SS = 0) at every k yield nulls.

    Scale shape: one groupBy collect per series, then O(n * max_k)
    row-local folds (two per frequency: the tau sums, then the four
    projection sums) — all JVM expressions, no explode of the
    (reading x frequency) cross product, no second shuffle.
    """
    if max_k < 1:
        raise ValueError(f"max_k must be >= 1, got {max_k}")
    keys = list(key_cols)
    pts = df.where(F.col(value_col).isNotNull())
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(axis_col).cast("double").alias("t"),
                F.col(value_col).cast("double").alias("x"),
            )
        )
    )
    g = pts.groupBy(*keys).agg(arr.alias("_arr"))
    g = g.withColumn("_n", F.size("_arr"))
    n_d = F.col("_n").cast("double")
    mean = (
        F.aggregate(F.col("_arr"), F.lit(0.0), lambda a, s: a + s["x"]) / n_d
    )
    g = g.withColumn("_mu", mean)
    var = (
        F.aggregate(
            F.col("_arr"),
            F.lit(0.0),
            lambda a, s: a + (s["x"] - F.col("_mu")) * (s["x"] - F.col("_mu")),
        )
        / n_d
    )
    g = g.withColumn("_var", var)
    span = (
        F.element_at(F.col("_arr"), -1)["t"]
        - F.element_at(F.col("_arr"), 1)["t"]
        + F.lit(1.0)
    )
    g = g.withColumn("_p", span)

    ks = F.when(
        (F.col("_n") >= 8) & (F.col("_var") > 0),
        F.sequence(F.lit(1), F.lit(int(max_k))),
    )

    _bind = _let  # tau/cos/sin reuse: see _let — without the binding
    # the nested folds degrade to O(n^2 * max_k) per series

    def _power_struct(k):
        w = F.lit(_TWO_PI) * k.cast("double") / F.col("_p")
        # pass 1: tau from the doubled-angle sums
        t2 = F.aggregate(
            F.col("_arr"),
            F.struct(F.lit(0.0).alias("c"), F.lit(0.0).alias("s")),
            lambda a, sx: _bind(
                F.lit(2.0) * w * sx["t"],
                lambda ang: F.struct(
                    (a["c"] + F.cos(ang)).alias("c"),
                    (a["s"] + F.sin(ang)).alias("s"),
                ),
            ),
        )
        tau = F.atan2(t2["s"], t2["c"]) / (F.lit(2.0) * w)

        def projections(tau_v):
            # pass 2: projections at the tau-shifted phase
            return F.aggregate(
                F.col("_arr"),
                F.struct(
                    F.lit(0.0).alias("cy"),
                    F.lit(0.0).alias("sy"),
                    F.lit(0.0).alias("cc"),
                    F.lit(0.0).alias("ss"),
                ),
                lambda a, sx: _bind(
                    F.struct(
                        F.cos(w * (sx["t"] - tau_v)).alias("c"),
                        F.sin(w * (sx["t"] - tau_v)).alias("s"),
                        (sx["x"] - F.col("_mu")).alias("d"),
                    ),
                    lambda v: F.struct(
                        (a["cy"] + v["d"] * v["c"]).alias("cy"),
                        (a["sy"] + v["d"] * v["s"]).alias("sy"),
                        (a["cc"] + v["c"] * v["c"]).alias("cc"),
                        (a["ss"] + v["s"] * v["s"]).alias("ss"),
                    ),
                ),
            )

        def power_of(pr):
            return F.when(
                (pr["cc"] > 0) & (pr["ss"] > 0),
                (
                    pr["cy"] * pr["cy"] / pr["cc"]
                    + pr["sy"] * pr["sy"] / pr["ss"]
                )
                / (F.lit(2.0) * F.col("_var")),
            )

        return _bind(
            tau,
            lambda tau_v: F.struct(
                k.cast("long").alias("k"),
                _bind(projections(tau_v), power_of).alias("p"),
            ),
        )

    g = g.withColumn(
        "_pk",
        F.filter(
            F.transform(ks, _power_struct),
            lambda s: s["p"].isNotNull(),
        ),
    )
    # _pk can be EMPTY (every k degenerate) — element_at would raise
    # under ANSI, so gate on size
    best = F.when(
        F.size("_pk") > 0,
        F.element_at(
            F.expr(
                "array_sort(_pk, (a, b) -> CASE "
                "WHEN round(a.p, 6) > round(b.p, 6) THEN -1 "
                "WHEN round(a.p, 6) < round(b.p, 6) THEN 1 "
                "WHEN a.k < b.k THEN -1 WHEN a.k > b.k THEN 1 ELSE 0 END)"
            ),
            1,
        ),
    )
    return g.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        best["k"].alias("k_peak"),
        F.when(best["k"].isNotNull(), best["k"].cast("double") / F.col("_p"))
        .alias("freq"),
        best["p"].alias("power"),
    )


def allan_variance(
    df: DataFrame,
    taus: Sequence[int] = (2, 4, 8, 16),
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Non-overlapped Allan variance per series at averaging factors
    ``taus`` (Allan 1966, the clock-stability statistic; IEEE 1139):
    the axis is cut into consecutive buckets of ``tau`` readings, each
    bucket's mean is taken only when ALL tau slots are present and
    non-null (a gapped bucket would bias the estimate), and

        AVAR(tau) = 0.5 * mean( (m_{b+1} - m_b)^2 )

    over ADJACENT defined bucket pairs.  Emits one row per
    (series, tau): ``tau``, ``n_pairs``, ``avar``, ``adev`` (sqrt).
    The reference's stability checks stop at rolling SD
    (diive/core/dfun/stats.py); Allan variance separates white noise
    (slope -1 in log-log) from random walk (+1), which a single-window
    SD cannot — target-side capability.

    Requires a DENSE integer axis per series (the series view's pos is
    a row_number, dense by construction); missing readings are
    represented as null values, which simply void their bucket.

    Scale shape: one groupBy shuffle builds a (pos -> value) map per
    series; every tau is then a row-local fold over the bucket grid —
    no per-tau shuffle, no explode.
    """
    taus = sorted(set(int(t) for t in taus))
    if not taus or taus[0] < 2:
        raise ValueError(f"taus must all be >= 2, got {taus!r}")
    keys = list(key_cols)
    # pos-sorted struct array: with a dense axis, slot i of the array
    # IS position i, so every lookup below is O(1) array indexing — a
    # map column would linear-scan per lookup, degrading bucket means
    # to O(npos^2) per series (measured 13s -> 1s at sf0.1).  Sparse
    # axes are detected per slot (s.p != idx -> NaN voids the bucket).
    g = df.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(axis_col).cast("long").alias("p"),
                    F.col(value_col).cast("double").alias("x"),
                )
            )
        ).alias("_arr"),
        F.max(F.col(axis_col).cast("long")).alias("_pmax"),
    )
    npos = (F.col("_pmax") + 1).cast("int")
    size = F.size("_arr")

    def _slotval(idx):
        # NaN when the slot is absent, misplaced (sparse axis), or null
        return F.when(
            idx < size,
            _let(
                F.element_at(F.col("_arr"), idx + 1),
                lambda s: F.when(
                    (s["p"] == idx.cast("long")) & s["x"].isNotNull(),
                    s["x"],
                ).otherwise(F.lit(float("nan"))),
            ),
        ).otherwise(F.lit(float("nan")))

    def _stats(tau: int):
        nb = F.floor(npos / tau).cast("int")
        # bucket mean, null unless all tau slots are present+non-null
        def bucket_mean(b):
            tot = F.aggregate(
                F.sequence(F.lit(0), F.lit(tau - 1)),
                F.lit(0.0).alias("a"),
                lambda a, j: a + _slotval(b * tau + j),
            )
            return F.when(~F.isnan(tot), tot / F.lit(float(tau)))

        # sequence(0, n) flips to a DESCENDING range when n < 0 — guard
        # short series explicitly so bucket/pair grids are empty, not
        # bogus negative indices.  _let-bind ms and d2 so each is
        # computed once, not re-inlined at every mention (see _let).
        empty = F.array().cast("array<int>")
        ms_expr = F.transform(
            F.when(nb >= 1, F.sequence(F.lit(0), nb - 1)).otherwise(empty),
            bucket_mean,
        )

        def with_ms(ms):
            d2_expr = F.filter(
                F.transform(
                    F.when(nb >= 2, F.sequence(F.lit(0), nb - 2)).otherwise(
                        empty
                    ),
                    lambda b: _let(
                        F.element_at(ms, b + 2) - F.element_at(ms, b + 1),
                        lambda d: d * d,
                    ),
                ),
                lambda x: x.isNotNull(),
            )

            def with_d2(d2):
                n_pairs = F.size(d2)
                avar = F.when(
                    n_pairs > 0,
                    F.lit(0.5)
                    * F.aggregate(d2, F.lit(0.0), lambda a, x: a + x)
                    / n_pairs.cast("double"),
                )
                return F.struct(
                    F.lit(tau).cast("long").alias("tau"),
                    n_pairs.cast("long").alias("n_pairs"),
                    avar.alias("avar"),
                )

            return _let(d2_expr, with_d2)

        return _let(ms_expr, with_ms)

    stacked = F.filter(
        F.array(*[_stats(t) for t in taus]),
        lambda s: s["n_pairs"] > 0,
    )
    out = g.select(*keys, F.explode(stacked).alias("_s"))
    return out.select(
        *keys,
        F.col("_s.tau").alias("tau"),
        F.col("_s.n_pairs").alias("n_pairs"),
        F.col("_s.avar").alias("avar"),
        F.sqrt(F.col("_s.avar")).alias("adev"),
    )


def granger_lag1(
    df: DataFrame,
    pairs: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    min_overlap: int = 30,
) -> DataFrame:
    """Lag-1 Granger causality F-test for chosen series pairs (Granger
    1969, Econometrica): does knowing x at t-1 improve a one-step
    forecast of y beyond y's own history?  For each directed pair the
    restricted model ``y_t = a + b*y_{t-1}`` is compared against the
    unrestricted ``y_t = a + b*y_{t-1} + c*x_{t-1}`` via

        F = (RSS_r - RSS_u) / (RSS_u / (n - 3))

    on the position-aligned rows where y_t, y_{t-1}, x_{t-1} are all
    non-null (a null reading breaks the lag chain for that row, it
    does not shift it).  Both OLS fits are CLOSED FORMS over centered
    component sums — no iterative solver, no UDF.  The reference's
    correlation battery stops at symmetric Pearson r
    (diive/pkgs/analyses/correlation.py:8-55); this adds the
    DIRECTION, completing discovery (:func:`top_correlated_pairs`) ->
    causality ordering.

    ``pairs`` carries one row per UNDIRECTED pair (group cols +
    ``doc_a`` < ``doc_b``, e.g. the output of
    :func:`top_correlated_pairs`); both directions are tested and
    emitted as (``doc_cause``, ``doc_effect``) rows with ``n``,
    ``f_stat`` and ``r2_gain`` (= (RSS_r - RSS_u)/RSS_r).  Degenerate
    fits (n < max(min_overlap, 4), near-singular normal matrix,
    RSS_u <= 0) yield null statistics.

    Scale shape: the pair list is a broadcast (it is the bounded
    output of a discovery pass, top-k per group); readings meet their
    partner co-partitioned on (group, pos) — one equi-shuffle, no
    cartesian.  The quadratic all-pairs risk lives in the DISCOVERY
    operator, not here.
    """
    if min_overlap < 4:
        raise ValueError(f"min_overlap must be >= 4, got {min_overlap}")
    keys = list(key_cols)
    group_cols, doc_col = keys[:-1], keys[-1]
    w = Window.partitionBy(*keys).orderBy(axis_col)
    base = df.select(
        *group_cols,
        F.col(doc_col).alias("_doc"),
        F.col(axis_col).alias("_pos"),
        F.col(value_col).cast("double").alias("_v"),
    ).withColumn("_v1", F.lag("_v").over(
        Window.partitionBy(*group_cols, "_doc").orderBy("_pos")
    ))

    directed = pairs.select(
        *group_cols,
        F.col("doc_a").alias("_cause"),
        F.col("doc_b").alias("_effect"),
    ).unionByName(
        pairs.select(
            *group_cols,
            F.col("doc_b").alias("_cause"),
            F.col("doc_a").alias("_effect"),
        )
    )

    eff = base.select(
        *group_cols,
        F.col("_doc").alias("_effect"),
        "_pos",
        F.col("_v").alias("_y"),
        F.col("_v1").alias("_y1"),
    )
    cau = base.select(
        *group_cols,
        F.col("_doc").alias("_cause"),
        "_pos",
        F.col("_v1").alias("_x1"),
    )
    j = (
        eff.join(F.broadcast(directed), on=[*group_cols, "_effect"])
        .join(cau, on=[*group_cols, "_cause", "_pos"])
        .where(
            F.col("_y").isNotNull()
            & F.col("_y1").isNotNull()
            & F.col("_x1").isNotNull()
        )
    )
    a = j.groupBy(*group_cols, "_cause", "_effect").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("_sy"),
        F.sum("_y1").alias("_s1"),
        F.sum("_x1").alias("_s2"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_y") * F.col("_y1")).alias("_sy1"),
        F.sum(F.col("_y") * F.col("_x1")).alias("_sy2"),
        F.sum(F.col("_y1") * F.col("_y1")).alias("_s11"),
        F.sum(F.col("_x1") * F.col("_x1")).alias("_s22"),
        F.sum(F.col("_y1") * F.col("_x1")).alias("_s12"),
    )
    n_d = F.col("n").cast("double")
    cyy = F.col("_syy") - F.col("_sy") * F.col("_sy") / n_d
    c11 = F.col("_s11") - F.col("_s1") * F.col("_s1") / n_d
    c22 = F.col("_s22") - F.col("_s2") * F.col("_s2") / n_d
    c12 = F.col("_s12") - F.col("_s1") * F.col("_s2") / n_d
    c1y = F.col("_sy1") - F.col("_s1") * F.col("_sy") / n_d
    c2y = F.col("_sy2") - F.col("_s2") * F.col("_sy") / n_d
    # restricted: y ~ 1 + y_lag
    rss_r = F.when(c11 > 0, cyy - c1y * c1y / c11)
    # unrestricted: y ~ 1 + y_lag + x_lag via the centered 2x2 solve
    det = c11 * c22 - c12 * c12
    ok = (
        (F.col("n") >= max(int(min_overlap), 4))
        & (c11 > 0)
        & (c22 > 0)
        & (det > F.lit(1e-12) * c11 * c22)
    )
    b_hat = (c1y * c22 - c2y * c12) / det
    c_hat = (c2y * c11 - c1y * c12) / det
    rss_u = cyy - b_hat * c1y - c_hat * c2y
    f_stat = F.when(
        ok & (rss_u > 0),
        (rss_r - rss_u) / (rss_u / (n_d - F.lit(3.0))),
    )
    r2_gain = F.when(
        ok & (rss_r > 0), (rss_r - rss_u) / rss_r
    )
    return a.select(
        *group_cols,
        F.col("_cause").alias("doc_cause"),
        F.col("_effect").alias("doc_effect"),
        F.col("n").cast("long").alias("n"),
        f_stat.alias("f_stat"),
        r2_gain.alias("r2_gain"),
    )


# ordinal patterns of order 3: stable-argsort permutations indexed
# lexicographically; rank of element i = #strictly-smaller + #equal
# with smaller index (Bandt-Pompe tie rule = stable sort)
PE_ORDER = 3


def permutation_entropy(
    df: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Permutation entropy of order 3, delay 1 (Bandt & Pompe 2002,
    PRL 88:174102) per series: the Shannon entropy of the ordinal
    pattern distribution over consecutive-position triples, normalized
    by ln(3!) to [0, 1].  Low PE = few ordinal shapes dominate (a
    looping or monotone stream); PE ~ 1 = all 6 shapes equally likely
    (white noise).  Complements :func:`hurst_rs` (memory) and
    :func:`dft_power_peak` (frequency) with a COMPLEXITY axis that is
    robust to monotone transforms — it sees only orderings, never
    magnitudes.  The reference has no complexity measure; target-side
    capability.

    A triple participates only when positions t, t+1, t+2 all carry
    non-null readings (grid holes void the window, the
    seasonal_decompose full-window discipline).  Ties follow the
    Bandt-Pompe stable rule: equal values keep their time order, so
    the pattern id is pure INTEGER comparison logic — a SQL twin
    reproduces the counts exactly; only the final ``p*ln p`` is
    floating (round-6 stable, H is O(1)).

    Emits per series: ``n_windows``, ``n_patterns`` (distinct ordinal
    shapes seen, <= 6), ``pe`` (normalized, null when no window).

    Scale shape: two ordered-window leads + two narrow groupBys
    ((key, pattern) then key) with map-side combine — per-series state
    is <= 6 pattern counts, series length unbounded, no collect.
    """
    keys = list(key_cols)
    pos = F.col(axis_col).cast("long")
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*keys).orderBy("_pos")
    pts = (
        df.select(*keys, pos.alias("_pos"), v.alias("_x0"))
        .withColumn("_x1", F.lead("_x0", 1).over(w))
        .withColumn("_x2", F.lead("_x0", 2).over(w))
        .withColumn("_p1", F.lead("_pos", 1).over(w))
        .withColumn("_p2", F.lead("_pos", 2).over(w))
    )
    ok = (
        F.col("_x0").isNotNull()
        & F.col("_x1").isNotNull()
        & F.col("_x2").isNotNull()
        & (F.col("_p1") == F.col("_pos") + 1)
        & (F.col("_p2") == F.col("_pos") + 2)
    )
    x0, x1, x2 = F.col("_x0"), F.col("_x1"), F.col("_x2")
    # stable ranks: strictly-smaller anywhere + equal at earlier index
    r0 = (x1 < x0).cast("int") + (x2 < x0).cast("int")
    r1 = (
        (x0 < x1).cast("int")
        + (x0 == x1).cast("int")
        + (x2 < x1).cast("int")
    )
    r2 = (
        (x0 < x2).cast("int")
        + (x0 == x2).cast("int")
        + (x1 < x2).cast("int")
        + (x1 == x2).cast("int")
    )
    # (r0, r1, r2) is a permutation of (0,1,2): 2-digit base-3 encode
    pat = r0 * 3 + r1  # r2 is determined by the other two
    triples = pts.where(ok).select(*keys, pat.alias("_pat"))
    pc = triples.groupBy(*keys, "_pat").agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    )
    agg = pc.groupBy(*keys).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.col("_c") * F.log(F.col("_c"))).alias("_clc"),
    )
    h = (F.log(F.col("_n")) - F.col("_clc") / F.col("_n")) / F.lit(
        math.log(6.0)
    )
    return agg.select(
        *keys,
        F.col("_n").cast("long").alias("n_windows"),
        "n_patterns",
        h.alias("pe"),
    )


def spectral_entropy(
    df: DataFrame,
    max_k: int = 24,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> DataFrame:
    """Normalized spectral entropy (the tsfeatures/forecastability
    classic — Goerg 2013's ForeCA omega is 1 minus this): Shannon
    entropy of the normalized periodogram over Fourier k = 1..max_k,

        H = -sum p_k ln p_k / ln(K),   p_k = P_k / sum P

    so 0 = a single dominant cycle (perfectly forecastable band) and
    1 = flat white-noise spectrum.  Same direct-DFT row-local array
    fold as :func:`dft_power_peak` (no (reading x frequency) explode,
    one shuffle); series with < 4 readings or zero band power yield
    null entropy.
    """
    if max_k < 2:
        raise ValueError(f"max_k must be >= 2, got {max_k}")
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
    g = g.withColumn(
        "_mu",
        F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x) / n_d,
    )
    ks = F.when(
        F.col("_n") >= 4,
        F.sequence(
            F.lit(1), F.least(F.lit(int(max_k)), (F.col("_n") / 2).cast("int"))
        ),
    )

    def _power(k):
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

    g = g.withColumn("_pw", F.transform(ks, _power))
    total = F.aggregate(F.col("_pw"), F.lit(0.0), lambda a, p: a + p)
    g = g.withColumn("_tot", total).withColumn(
        "_kk", F.size("_pw")
    )
    ent = F.when(
        (F.col("_tot") > 0) & (F.col("_kk") >= 2),
        -F.aggregate(
            F.col("_pw"),
            F.lit(0.0),
            lambda a, p: a
            + F.when(
                p > 0,
                (p / F.col("_tot")) * F.log(p / F.col("_tot")),
            ).otherwise(0.0),
        )
        / F.log(F.col("_kk").cast("double")),
    )
    return g.select(
        *keys,
        F.col("_n").cast("long").alias("n"),
        F.col("_kk").cast("long").alias("k_used"),
        ent.alias("entropy"),
    )


def cointegration_pairs(
    df: DataFrame,
    pairs: DataFrame,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    min_overlap: int = 30,
) -> DataFrame:
    """Engle-Granger two-step cointegration test for chosen series
    pairs (Engle & Granger 1987): two trending series are cointegrated
    when some linear combination is stationary — the mean-reversion
    complement of :func:`granger_lag1`'s direction test.

    Step 1: closed-form OLS ``y = alpha + beta*x`` on the
    position-aligned non-null rows of each (doc_a -> y, doc_b -> x)
    pair; residual e_t attaches back as a plain expression (the tiny
    per-pair coefficient relation re-joins broadcast).
    Step 2: Dickey-Fuller regression WITHOUT drift on the residuals,
    ``delta e_t = rho * e_{t-1}``, over consecutive kept rows (one lag
    window per pair):  t = rho_hat / se(rho_hat), and a verdict at the
    Engle-Granger 5% critical value -3.34 (MacKinnon 1991 surface,
    two-variable case with constant in step 1).

    Everything is moment sums + closed forms — no solver, no UDF; the
    pair list is the bounded output of a discovery pass and broadcasts
    (the granger_lag1 scale contract).  Degenerate fits (n below
    ``min_overlap``, zero x-variance, zero residual lag energy) yield
    null statistics.
    """
    if min_overlap < 4:
        raise ValueError(f"min_overlap must be >= 4, got {min_overlap}")
    keys = list(key_cols)
    group_cols, doc_col = keys[:-1], keys[-1]
    base = df.select(
        *group_cols,
        F.col(doc_col).alias("_doc"),
        F.col(axis_col).alias("_pos"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())

    p = pairs.select(
        *group_cols,
        F.col("doc_a").alias("_da"),
        F.col("doc_b").alias("_db"),
    )
    ya = base.select(
        *group_cols, F.col("_doc").alias("_da"), "_pos",
        F.col("_v").alias("_y"),
    )
    xb = base.select(
        *group_cols, F.col("_doc").alias("_db"), "_pos",
        F.col("_v").alias("_x"),
    )
    j = ya.join(F.broadcast(p), on=[*group_cols, "_da"]).join(
        xb, on=[*group_cols, "_db", "_pos"]
    )
    mom = j.groupBy(*group_cols, "_da", "_db").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n_d = F.col("n").cast("double")
    varx = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n_d
    covxy = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n_d
    coef = mom.select(
        *group_cols, "_da", "_db", "n",
        F.when(varx > 0, covxy / varx).alias("beta"),
        F.when(
            varx > 0,
            (F.col("_sy") - (covxy / varx) * F.col("_sx")) / n_d,
        ).alias("alpha"),
    ).where(
        (F.col("n") >= int(min_overlap)) & F.col("beta").isNotNull()
    )
    r = j.join(F.broadcast(coef), on=[*group_cols, "_da", "_db"]).select(
        *group_cols, "_da", "_db", "_pos", "n",
        (F.col("_y") - F.col("alpha") - F.col("beta") * F.col("_x")).alias(
            "_e"
        ),
    )
    wo = Window.partitionBy(*group_cols, "_da", "_db").orderBy("_pos")
    r = r.withColumn("_e1", F.lag("_e").over(wo)).where(
        F.col("_e1").isNotNull()
    )
    d = r.withColumn("_de", F.col("_e") - F.col("_e1"))
    a = d.groupBy(*group_cols, "_da", "_db").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("_e1") * F.col("_de")).alias("_s1d"),
        F.sum(F.col("_e1") * F.col("_e1")).alias("_s11"),
        F.sum(F.col("_de") * F.col("_de")).alias("_sdd"),
    )
    m_d = F.col("m").cast("double")
    rho = F.when(F.col("_s11") > 0, F.col("_s1d") / F.col("_s11"))
    rss = F.col("_sdd") - rho * rho * F.col("_s11")
    se = F.sqrt(
        F.when(
            (F.col("_s11") > 0) & (m_d > 1) & (rss > 0),
            (rss / (m_d - 1.0)) / F.col("_s11"),
        )
    )
    t = rho / se
    return a.select(
        *group_cols,
        F.col("_da").alias("doc_a"),
        F.col("_db").alias("doc_b"),
        F.col("n").cast("long").alias("n"),
        rho.alias("rho"),
        t.alias("df_t"),
        F.when(t < -3.34, "cointegrated")
        .otherwise("no-cointegration")
        .alias("verdict"),
    )


def ccf_peak_lag(
    df: DataFrame,
    pairs: DataFrame,
    max_lag: int = 5,
    value_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    min_overlap: int = 30,
) -> DataFrame:
    """Cross-correlation function peak lag for chosen series pairs:
    Pearson r between a_t and b_{t+k} for k in [-max_lag, max_lag],
    reporting the lag with the strongest |r| (round-6, smallest-k
    tie-break — deterministic across engines).  Where
    :func:`granger_lag1` answers "does a help predict b one step
    ahead", the CCF peak estimates BY HOW MANY steps one series leads
    the other — the alignment primitive for sensor clock-skew and
    cause-propagation-delay questions.

    Shape: the bounded pair list broadcasts; each pair's readings
    meet on a (group, doc, pos+k) equi-join after a (2·max_lag+1)-way
    lag explode of the left side — rows scale as (2K+1)·n per pair
    with K a small constant, never quadratically; per-(pair, k)
    moments reduce in one aggregate."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if min_overlap < 3:
        raise ValueError(f"min_overlap must be >= 3, got {min_overlap}")
    keys = list(key_cols)
    group_cols, doc_col = keys[:-1], keys[-1]
    base = df.select(
        *group_cols,
        F.col(doc_col).alias("_doc"),
        F.col(axis_col).cast("long").alias("_pos"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_v").isNotNull())
    p = pairs.select(
        *group_cols,
        F.col("doc_a").alias("_da"),
        F.col("doc_b").alias("_db"),
    )
    K = int(max_lag)
    a = (
        base.withColumnRenamed("_doc", "_da")
        .join(
            F.broadcast(p.select(*group_cols, "_da").distinct()),
            on=[*group_cols, "_da"],
        )
        .select(*group_cols, "_da", "_pos", F.col("_v").alias("_va"))
        .withColumn("_k", F.explode(F.sequence(F.lit(-K), F.lit(K))))
        .withColumn("_bpos", F.col("_pos") + F.col("_k"))
    )
    b = base.select(
        *group_cols,
        F.col("_doc").alias("_db"),
        F.col("_pos").alias("_bpos"),
        F.col("_v").alias("_vb"),
    )
    j = a.join(F.broadcast(p), on=[*group_cols, "_da"]).join(
        b, on=[*group_cols, "_db", "_bpos"]
    )
    mom = j.groupBy(*group_cols, "_da", "_db", "_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_va").alias("_sa"),
        F.sum("_vb").alias("_sb"),
        F.sum(F.col("_va") * F.col("_vb")).alias("_sab"),
        F.sum(F.col("_va") * F.col("_va")).alias("_saa"),
        F.sum(F.col("_vb") * F.col("_vb")).alias("_sbb"),
    )
    n_d = F.col("n").cast("double")
    va = n_d * F.col("_saa") - F.col("_sa") * F.col("_sa")
    vb = n_d * F.col("_sbb") - F.col("_sb") * F.col("_sb")
    r = F.when(
        (F.col("n") >= int(min_overlap)) & (va > 0) & (vb > 0),
        (n_d * F.col("_sab") - F.col("_sa") * F.col("_sb"))
        / F.sqrt(va * vb),
    )
    scored = mom.select(
        *group_cols, "_da", "_db", "_k", "n", r.alias("_r")
    ).where(F.col("_r").isNotNull())
    w = Window.partitionBy(*group_cols, "_da", "_db").orderBy(
        F.round(F.abs(F.col("_r")), 6).desc(), F.col("_k").asc()
    )
    best = scored.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    return best.select(
        *group_cols,
        F.col("_da").alias("doc_a"),
        F.col("_db").alias("doc_b"),
        F.col("_k").alias("best_lag"),
        F.col("n").cast("long").alias("n"),
        F.col("_r").alias("r"),
    )
