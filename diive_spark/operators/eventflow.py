"""Event-flow analytics over raw event streams: ordered funnels,
retention cohorts, and two-state burst detection.

The reference's event tooling stops at per-series time grids and gap
runs (diive/core/times/gapfinding.py, diive/core/times/times.py) — it
has no notion of per-actor event *sequences*.  These operators are
target-side capability for the events table: the funnel is the
ClickHouse ``windowFunnel`` semantics (ordered steps, window anchored
at the first step) re-expressed as one grouped array fold; retention
is the classic cohort matrix; bursts are Kleinberg's two-state
automaton (Kleinberg, KDD 2002) with a Gaussian emission cost so the
whole Viterbi DP stays in exact IEEE arithmetic (+, -, *, / on
integer-derived doubles — no transcendentals), replayable bit-for-bit
by a SQL engine.

Scale shapes (the 100 TB question):

- ``funnel_conversion``: prefilter to the step types, ONE shuffle on
  the actor key, then row-local array expressions.  The collected
  array is bounded by the actor's own step-event count (``max_events``
  caps runaway/bot actors explicitly).  A join-chain formulation would
  need len(steps)-1 shuffles and re-materialize the events each time.
- ``retention_cohorts``: ONE shuffle on the actor key produces both
  the cohort (min day) and the active-day set in the same aggregate;
  the (cohort, offset) re-aggregation is over at most
  n_actors x active-days rows, and the final matrix is tiny
  (cohorts x offsets).
- ``kleinberg_bursts``: counts aggregate per (key, bin) — one shuffle
  — then the per-key Viterbi is a row-local fold over the completed
  bin grid.  Bins per key are bounded by span/bin_seconds; for
  multi-year keys chunk the span upstream (same recipe as the tier
  cascade's per-day raw partitions).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _epoch(c):
    """Epoch seconds (fractional, exact micros/1e6) for timestamps."""
    return F.unix_micros(F.col(c).cast("timestamp")) / F.lit(1e6)


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    window_seconds: float = 86400.0,
    ts_col: str = "ts",
    type_col: str = "event_type",
    key_cols: Sequence[str] = ("user_id",),
    max_events: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion per actor (ClickHouse ``windowFunnel``
    semantics): the funnel anchors at the actor's EARLIEST ``steps[0]``
    event; each later step must occur at-or-after the previous step's
    matched time and within ``window_seconds`` of the anchor.  Emits
    one row per actor that has at least one event of any step type:
    the key columns, ``level`` (how many steps matched, 0 if the actor
    never performed ``steps[0]``), ``t_anchor`` (epoch seconds of the
    anchor, null at level 0), and ``dur_s`` (time from anchor to the
    last matched step, null below level 2).

    One shuffle: events are prefiltered to the step types, grouped per
    actor into a time-sorted (t, y) array, and the step chain is pure
    array expressions (filter -> transform -> array_min) — no UDF, no
    join chain.  ``max_events`` (optional) caps the per-actor array at
    the N earliest step-events, bounding worst-case actors (bots)
    explicitly rather than letting one hot key own a task.

    Determinism: epochs are exact micros/1e6 doubles and the chain
    uses only min/compare arithmetic, so a SQL twin reproduces every
    value bit-for-bit.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 funnel steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if max_events is not None and max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    keys = list(key_cols)

    ev = df.where(F.col(type_col).isin(steps)).select(
        *keys,
        _epoch(ts_col).alias("_t"),
        F.col(type_col).alias("_y"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("_t").alias("t"), F.col("_y").alias("y")))
    )
    if max_events is not None:
        arr = F.slice(arr, 1, max_events)
    g = ev.groupBy(*keys).agg(arr.alias("_ev"))

    def first_at_or_after(step: str, t_prev, deadline):
        hits = F.filter(
            F.col("_ev"),
            lambda x: (x["y"] == F.lit(step))
            & (x["t"] >= t_prev)
            & (x["t"] <= deadline),
        )
        return F.array_min(F.transform(hits, lambda x: x["t"]))

    t0 = F.array_min(
        F.transform(
            F.filter(F.col("_ev"), lambda x: x["y"] == F.lit(steps[0])),
            lambda x: x["t"],
        )
    )
    g = g.withColumn("_t0", t0)
    deadline = F.col("_t0") + F.lit(float(window_seconds))
    t_cols = [F.col("_t0")]
    for i, step in enumerate(steps[1:], start=1):
        # a null previous step nulls the comparison -> empty filter ->
        # null array_min: the chain cascades without explicit guards
        g = g.withColumn(f"_t{i}", first_at_or_after(step, t_cols[-1], deadline))
        t_cols.append(F.col(f"_t{i}"))

    level = sum(
        (F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0))
        for i in range(len(steps))
    )
    last_t = F.coalesce(*[F.col(f"_t{i}") for i in range(len(steps) - 1, 0, -1)])
    return g.select(
        *keys,
        level.cast("int").alias("level"),
        F.col("_t0").alias("t_anchor"),
        F.when(F.col("_t1").isNotNull(), last_t - F.col("_t0")).alias("dur_s"),
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    max_offset: int = 30,
) -> DataFrame:
    """Classic cohort-retention matrix: actors are cohorted by the DAY
    of their first event; for each (cohort_day, day-offset k) the
    matrix counts how many of that cohort were active k days later.
    Emits ``cohort`` (yyyy-MM-dd string), ``offset`` (0..max_offset),
    ``n_active``, ``n_cohort`` (= n_active at offset 0 — every cohort
    member is by construction active on day 0) and ``retention``
    (round-6 ratio).

    ONE shuffle on the actor key computes the cohort (min day) and the
    distinct active-day set in the same aggregate (collect_set); the
    explode emits at most (actor x active-days) rows and the final
    matrix is cohorts x offsets.  No distinct-count shuffle and no
    self-join on the events table.
    """
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    keys = list(key_cols)
    d = df.select(*keys, F.to_date(F.col(ts_col)).alias("_day"))
    g = d.groupBy(*keys).agg(
        F.min("_day").alias("_cohort"),
        F.collect_set("_day").alias("_days"),
    )
    ex = g.select(
        F.col("_cohort"), F.explode("_days").alias("_day")
    ).withColumn("offset", F.datediff(F.col("_day"), F.col("_cohort")))
    mat = (
        ex.where(F.col("offset") <= max_offset)
        .groupBy("_cohort", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    w = Window.partitionBy("_cohort")
    n_cohort = F.max(
        F.when(F.col("offset") == 0, F.col("n_active"))
    ).over(w)
    return mat.select(
        F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
        F.col("offset").cast("long").alias("offset"),
        "n_active",
        n_cohort.alias("n_cohort"),
        F.round(F.col("n_active") / n_cohort, 6).alias("retention"),
    )


BURST_SENTINEL = 1.0e30


def kleinberg_bursts(
    df: DataFrame,
    bin_seconds: int = 3600,
    s: float = 2.0,
    gamma: float = 1.0,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    max_bins: int = 100_000,
) -> DataFrame:
    """Two-state burst detection on per-bin event counts (Kleinberg,
    KDD 2002 "Bursty and hierarchical structure in streams", the
    2-state automaton) with a GAUSSIAN emission cost so the DP stays
    in exact IEEE arithmetic:

    - bin the stream into ``bin_seconds`` buckets and complete the
      per-key grid (zero-count bins matter — they end bursts);
    - base rate ``r0`` = total/n_bins (exact: integer totals, one
      correctly-rounded division), burst rate ``r1 = s * r0``;
    - emission cost in state q for count x: ``(x - r_q)^2``;
      entering the burst state costs ``gamma * (r1 - r0)^2`` extra
      (Kleinberg's structure, with his Poisson -log-likelihood swapped
      for the quadratic so no transcendental enters the DP — a 1-ULP
      ``ln`` difference between engines could flip an argmin and
      change the burst set; squares/sums/divisions are correctly
      rounded everywhere, so a SQL twin replays the DP bit-for-bit);
    - Viterbi over the bin sequence (start state 0, ties prefer
      state 0), traceback, and emission of maximal state-1 runs.

    Emits one row per burst episode: key cols, ``burst_start`` /
    ``burst_end`` (epoch seconds of the first/last bin in the run),
    ``n_bins``, ``total_count`` (events inside the run) and
    ``peak_count``.

    Scale: one shuffle aggregates (key, bin) counts; the grid
    completion and the whole forward/traceback DP are row-local array
    folds over at most ``max_bins`` bins per key (guarded — a key
    spanning more should be chunked upstream, same recipe as the tier
    cascade's per-day partitions).
    """
    if bin_seconds < 1:
        raise ValueError(f"bin_seconds must be >= 1, got {bin_seconds}")
    if s <= 1.0:
        raise ValueError(f"burst rate multiplier s must be > 1, got {s}")
    if gamma < 0:
        raise ValueError(f"gamma must be >= 0, got {gamma}")
    keys = list(key_cols)

    b = df.select(
        *keys,
        (F.floor(_epoch(ts_col) / bin_seconds) * bin_seconds)
        .cast("long")
        .alias("_bin"),
    )
    counts = b.groupBy(*keys, "_bin").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    g = counts.groupBy(*keys).agg(
        F.min("_bin").alias("_b0"),
        F.max("_bin").alias("_b1"),
        F.sum("_c").alias("_total"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_bin"), F.col("_c")))
        ).alias("_m"),
    )
    n_bins = ((F.col("_b1") - F.col("_b0")) / bin_seconds + 1).cast("int")
    g = g.withColumn("_n", n_bins)
    over = g.where(F.col("_n") > max_bins)
    if over.limit(1).count() > 0:
        bad = over.select(*keys, "_n").limit(5).collect()
        raise ValueError(
            f"kleinberg_bursts: keys exceed max_bins={max_bins}: "
            f"{[tuple(r) for r in bad]} — chunk the span upstream"
        )
    # completed grid: counts[i] for bin _b0 + i*bin_seconds, zeros filled
    xs = F.transform(
        F.sequence(F.lit(0), F.col("_n") - 1),
        lambda i: F.coalesce(
            F.element_at(
                F.col("_m"), F.col("_b0") + i * F.lit(bin_seconds)
            ),
            F.lit(0),
        ).cast("double"),
    )
    g = g.select(*keys, "_b0", "_n", xs.alias("_x"))

    r0 = F.col("_total_r0")
    g = g.withColumn(
        "_total_r0",
        F.aggregate(F.col("_x"), F.lit(0.0), lambda a, x: a + x)
        / F.col("_n").cast("double"),
    )
    r1 = r0 * F.lit(float(s))
    trans = F.lit(float(gamma)) * (r1 - r0) * (r1 - r0)
    sent = F.lit(BURST_SENTINEL)

    # forward Viterbi: state = (c0, c1, d0: array<int>, d1: array<int>)
    # d_q[t] = predecessor state chosen when entering state q at step t
    # (step 0 decisions are placeholders; start state is forced to 0
    # by the c1 sentinel).  Ties prefer predecessor 0 (<=) — the SQL
    # twin uses the same comparator.
    def fwd(acc, x):
        c0, c1 = acc["c0"], acc["c1"]
        e0 = (x - r0) * (x - r0)
        e1 = (x - r1) * (x - r1)
        p0 = F.when(c0 <= c1, c0).otherwise(c1)
        d0 = F.when(c0 <= c1, 0).otherwise(1)
        p1 = F.when(c0 + trans <= c1, c0 + trans).otherwise(c1)
        d1 = F.when(c0 + trans <= c1, 0).otherwise(1)
        return F.struct(
            (e0 + p0).alias("c0"),
            (e1 + p1).alias("c1"),
            F.concat(acc["d0"], F.array(d0)).alias("d0"),
            F.concat(acc["d1"], F.array(d1)).alias("d1"),
        )

    x0 = F.element_at(F.col("_x"), 1)
    init = F.struct(
        ((x0 - r0) * (x0 - r0)).alias("c0"),
        (((x0 - r1) * (x0 - r1)) + sent).alias("c1"),
        F.array(F.lit(0)).alias("d0"),
        F.array(F.lit(0)).alias("d1"),
    )
    # slice length must not overflow start+length: use the exact size
    vit = F.aggregate(
        F.slice(F.col("_x"), 2, F.greatest(F.col("_n") - 1, F.lit(1))),
        init,
        fwd,
    )
    g = g.withColumn("_v", vit)

    # traceback: states[n-1] = argmin(c0, c1) (tie -> 0); walking t
    # from n-1 down to 1, prepend d_{state}[t].
    last = F.when(F.col("_v.c0") <= F.col("_v.c1"), 0).otherwise(1)
    tb = F.aggregate(
        F.sequence(F.col("_n") - 1, F.lit(1), F.lit(-1)),
        F.array(last),
        lambda acc, t: F.concat(
            F.array(
                F.when(
                    F.element_at(acc, 1) == 0,
                    F.element_at(F.col("_v.d0"), t + 1),
                ).otherwise(F.element_at(F.col("_v.d1"), t + 1))
            ),
            acc,
        ),
    )
    states = F.when(F.col("_n") >= 2, tb).otherwise(F.array(last))
    g = g.select(*keys, "_b0", "_x", states.alias("_s"))

    rows = g.select(
        *keys,
        F.col("_b0"),
        F.posexplode(F.arrays_zip(F.col("_s"), F.col("_x"))).alias(
            "_i", "_z"
        ),
    ).select(
        *keys,
        (F.col("_b0") + F.col("_i") * F.lit(bin_seconds)).alias("_bin"),
        F.col("_i"),
        F.col("_z._s").alias("_st"),
        F.col("_z._x").alias("_c"),
    )
    # gaps-and-islands over the already-computed state sequence
    w = Window.partitionBy(*keys).orderBy("_i")
    runs = rows.withColumn(
        "_grp",
        F.sum(
            F.when(
                F.lag("_st").over(w).isNull()
                | (F.lag("_st").over(w) != F.col("_st")),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        runs.where(F.col("_st") == 1)
        .groupBy(*keys, "_grp")
        .agg(
            F.min("_bin").alias("burst_start"),
            F.max("_bin").alias("burst_end"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("_c").cast("long").alias("total_count"),
            F.max("_c").cast("long").alias("peak_count"),
        )
        .drop("_grp")
    )


def token_bucket_throttle(
    df: DataFrame,
    capacity: float = 5.0,
    refill_per_s: float = 0.01,
    cost: float = 1.0,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Token-bucket rate-limit REPLAY (the classic traffic-shaping
    automaton, e.g. RFC 2697's single-rate policer / Tanenbaum §5.4):
    audit which of an actor's historical events WOULD have been
    throttled under a (capacity, refill) policy — the capacity-planning
    question behind every quota rollout.

    Per actor, over events in time order (bucket starts full)::

        level = min(capacity, level + (t - t_prev) * refill_per_s)
        allowed: level >= cost  ->  level -= cost
        else throttled (level keeps the refilled value)

    Emits one row per actor: ``n_events``, ``n_throttled``,
    ``first_throttled_t`` (epoch seconds, null if never) and
    ``final_level``.  Exact IEEE arithmetic on exact micros/1e6
    epochs — a recursive-CTE SQL twin replays every decision
    bit-for-bit.

    Scale: one shuffle on the actor key, one row-local fold; the
    5-scalar state makes the streaming-partial port mechanical
    (stream_ph_partials pattern) if the audit must run continuously.
    """
    if capacity <= 0 or refill_per_s < 0 or cost <= 0:
        raise ValueError(
            f"need capacity>0, refill_per_s>=0, cost>0; got "
            f"{capacity}, {refill_per_s}, {cost}"
        )
    if cost > capacity:
        raise ValueError("cost > capacity would throttle every event")
    keys = list(key_cols)
    ev = df.select(*keys, _epoch(ts_col).alias("_t"))
    g = ev.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_t")).alias("_ts")
    )
    cap = F.lit(float(capacity))
    rate = F.lit(float(refill_per_s))
    c = F.lit(float(cost))
    init = F.struct(
        F.lit(None).cast("double").alias("tp"),
        cap.alias("lvl"),
        F.lit(0).cast("long").alias("thr"),
        F.lit(None).cast("double").alias("first"),
    )

    def step(acc, t):
        refill = F.when(
            acc["tp"].isNotNull(), (t - acc["tp"]) * rate
        ).otherwise(F.lit(0.0))
        lvl = F.when(acc["lvl"] + refill < cap, acc["lvl"] + refill).otherwise(
            cap
        )
        ok = lvl >= c
        return F.struct(
            t.alias("tp"),
            F.when(ok, lvl - c).otherwise(lvl).alias("lvl"),
            (acc["thr"] + F.when(ok, 0).otherwise(1)).cast("long").alias(
                "thr"
            ),
            F.coalesce(acc["first"], F.when(~ok, t)).alias("first"),
        )

    st = F.aggregate(F.col("_ts"), init, step)
    g = g.withColumn("_st", st)
    return g.select(
        *keys,
        F.size("_ts").cast("long").alias("n_events"),
        F.col("_st.thr").alias("n_throttled"),
        F.col("_st.first").alias("first_throttled_t"),
        F.col("_st.lvl").alias("final_level"),
    )
