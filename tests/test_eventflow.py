"""Event-flow battery: ordered funnel, retention cohorts, Kleinberg
bursts — each checked against an independent pandas/numpy twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from diive_spark.operators.eventflow import (
    funnel_conversion,
    kleinberg_bursts,
    retention_cohorts,
)

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(EV).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def events_pd(events) -> pd.DataFrame:
    return events.toPandas().sort_values("event_id").reset_index(drop=True)


# -------------------------------------------------------------- funnel
STEPS = ["view", "click", "purchase"]
WIN = 86400.0


def _funnel_pd(pdf: pd.DataFrame, steps, window):
    out = []
    sub = pdf[pdf["event_type"].isin(steps)]
    for uid, g in sub.groupby("user_id"):
        # ns -> us in INTEGER arithmetic (ns exceeds float64's exact
        # range), then one /1e6 division, matching unix_micros/1e6
        t = (g["ts"].astype("int64").to_numpy() // 1000).astype(float) / 1e6
        y = g["event_type"].to_numpy()
        order = np.argsort(t, kind="stable")
        t, y = t[order], y[order]
        m0 = t[y == steps[0]]
        t0 = m0.min() if len(m0) else None
        times = [t0]
        for step in steps[1:]:
            prev = times[-1]
            if prev is None:
                times.append(None)
                continue
            cand = t[(y == step) & (t >= prev) & (t <= t0 + window)]
            times.append(cand.min() if len(cand) else None)
        level = sum(1 for x in times if x is not None)
        last = None
        for x in reversed(times[1:]):
            if x is not None:
                last = x
                break
        out.append(
            dict(
                user_id=uid,
                level=level,
                t_anchor=t0,
                dur_s=(last - t0) if (last is not None and t0 is not None) else None,
            )
        )
    return pd.DataFrame(out).sort_values("user_id").reset_index(drop=True)


def test_funnel_matches_pandas(spark, events, events_pd):
    got = (
        funnel_conversion(events, STEPS, window_seconds=WIN)
        .orderBy("user_id")
        .toPandas()
    )
    exp = _funnel_pd(events_pd, STEPS, WIN)
    assert len(got) == len(exp) > 0
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["level"].tolist() == exp["level"].tolist()
    np.testing.assert_allclose(
        got["t_anchor"].astype(float),
        exp["t_anchor"].astype(float),
        rtol=0,
        atol=0,
    )
    np.testing.assert_allclose(
        got["dur_s"].astype(float), exp["dur_s"].astype(float), rtol=0, atol=0
    )
    # the corpus must exercise every level for the test to mean much
    assert got["level"].nunique() >= 2


def test_funnel_window_and_order_enforced(spark):
    rows = [
        # u1: completes in order inside the window
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 01:00:00", "b"),
        # u2: step b BEFORE the anchor only -> level 1
        (2, "2024-01-01 05:00:00", "b"),
        (2, "2024-01-01 06:00:00", "a"),
        # u3: step b outside the window -> level 1
        (3, "2024-01-01 00:00:00", "a"),
        (3, "2024-01-03 00:00:00", "b"),
        # u4: never does a -> level 0 (has a step event so still emitted)
        (4, "2024-01-01 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        [(u, pd.Timestamp(t).to_pydatetime(), y) for u, t, y in rows],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["user_id"]: r["level"]
        for r in funnel_conversion(df, ["a", "b"], window_seconds=86400.0).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1, 4: 0}


def test_funnel_max_events_caps_hot_actor(spark):
    rows = [(1, (pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i)).to_pydatetime(), "a")
            for i in range(10)]
    rows.append((1, pd.Timestamp("2024-01-01 02:00:00").to_pydatetime(), "b"))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    full = funnel_conversion(df, ["a", "b"]).collect()[0]
    assert full["level"] == 2
    capped = funnel_conversion(df, ["a", "b"], max_events=5).collect()[0]
    # the b event is the 11th in time order; a 5-event cap drops it
    assert capped["level"] == 1


def test_funnel_validation(spark):
    df = None
    with pytest.raises(ValueError):
        funnel_conversion(df, ["a"])
    with pytest.raises(ValueError):
        funnel_conversion(df, ["a", "a"])
    with pytest.raises(ValueError):
        funnel_conversion(df, ["a", "b"], window_seconds=0)
    with pytest.raises(ValueError):
        funnel_conversion(df, ["a", "b"], max_events=0)


def test_funnel_plan_single_exchange(spark, events):
    plan = (
        funnel_conversion(events, STEPS, window_seconds=WIN)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


# ----------------------------------------------------------- retention
def _retention_pd(pdf: pd.DataFrame, max_offset: int) -> pd.DataFrame:
    d = pdf[["user_id", "ts"]].copy()
    d["day"] = d["ts"].dt.normalize()
    cohort = d.groupby("user_id")["day"].min().rename("cohort")
    ud = d[["user_id", "day"]].drop_duplicates().join(cohort, on="user_id")
    ud["offset"] = (ud["day"] - ud["cohort"]).dt.days
    ud = ud[ud["offset"] <= max_offset]
    mat = (
        ud.groupby([ud["cohort"].dt.strftime("%Y-%m-%d"), "offset"])
        .size()
        .rename("n_active")
        .reset_index()
    )
    base = mat[mat["offset"] == 0].set_index("cohort")["n_active"]
    mat["n_cohort"] = mat["cohort"].map(base)
    mat["retention"] = (mat["n_active"] / mat["n_cohort"]).round(6)
    return mat.sort_values(["cohort", "offset"]).reset_index(drop=True)


def test_retention_matches_pandas(spark, events, events_pd):
    got = (
        retention_cohorts(events, max_offset=30)
        .orderBy("cohort", "offset")
        .toPandas()
    )
    exp = _retention_pd(events_pd, 30)
    assert len(got) == len(exp) > 0
    assert got["cohort"].tolist() == exp["cohort"].tolist()
    assert got["offset"].tolist() == exp["offset"].tolist()
    assert got["n_active"].tolist() == exp["n_active"].tolist()
    assert got["n_cohort"].tolist() == exp["n_cohort"].tolist()
    np.testing.assert_allclose(got["retention"], exp["retention"], atol=1e-12)


def test_retention_offset_cap_and_validation(spark, events):
    got = retention_cohorts(events, max_offset=3)
    assert got.agg(F.max("offset")).collect()[0][0] <= 3
    with pytest.raises(ValueError):
        retention_cohorts(events, max_offset=-1)


# ------------------------------------------------------------- bursts
def _viterbi_pd(xs: np.ndarray, s: float, gamma: float):
    """Definitional two-state Viterbi twin (Gaussian emission)."""
    n = len(xs)
    r0 = xs.sum() / n
    r1 = s * r0
    trans = gamma * (r1 - r0) ** 2
    c0 = (xs[0] - r0) ** 2
    c1 = (xs[0] - r1) ** 2 + 1.0e30
    d0 = [0]
    d1 = [0]
    for x in xs[1:]:
        e0, e1 = (x - r0) ** 2, (x - r1) ** 2
        n0 = e0 + (c0 if c0 <= c1 else c1)
        d0.append(0 if c0 <= c1 else 1)
        n1 = e1 + (c0 + trans if c0 + trans <= c1 else c1)
        d1.append(0 if c0 + trans <= c1 else 1)
        c0, c1 = n0, n1
    states = [0 if c0 <= c1 else 1]
    for t in range(n - 1, 0, -1):
        states.insert(0, d0[t] if states[0] == 0 else d1[t])
    return states


def _bursts_pd(pdf: pd.DataFrame, bin_seconds: int, s: float, gamma: float):
    out = []
    d = pdf.copy()
    ep = d["ts"].astype("int64") // 1000 / 1e6
    d["bin"] = (np.floor(ep / bin_seconds) * bin_seconds).astype("int64")
    for key, g in d.groupby("event_type"):
        counts = g.groupby("bin").size()
        b0, b1 = counts.index.min(), counts.index.max()
        grid = np.arange(b0, b1 + 1, bin_seconds)
        xs = counts.reindex(grid, fill_value=0).to_numpy().astype(float)
        states = np.array(_viterbi_pd(xs, s, gamma))
        i = 0
        while i < len(states):
            if states[i] == 1:
                j = i
                while j + 1 < len(states) and states[j + 1] == 1:
                    j += 1
                out.append(
                    dict(
                        event_type=key,
                        burst_start=int(grid[i]),
                        burst_end=int(grid[j]),
                        n_bins=j - i + 1,
                        total_count=int(xs[i : j + 1].sum()),
                        peak_count=int(xs[i : j + 1].max()),
                    )
                )
                i = j + 1
            else:
                i += 1
    return (
        pd.DataFrame(out)
        .sort_values(["event_type", "burst_start"])
        .reset_index(drop=True)
    )


def test_bursts_match_numpy_viterbi(spark, events, events_pd):
    got = (
        kleinberg_bursts(events, bin_seconds=3600, s=2.0, gamma=5.0)
        .orderBy("event_type", "burst_start")
        .toPandas()
    )
    exp = _bursts_pd(events_pd, 3600, 2.0, 5.0)
    assert len(got) == len(exp) > 0
    for col in ["event_type", "burst_start", "burst_end", "n_bins",
                "total_count", "peak_count"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_bursts_constant_rate_no_bursts(spark):
    # perfectly flat stream: one event per hour -> never worth gamma
    rows = [
        ((pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), "a")
        for i in range(48)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    assert kleinberg_bursts(df, bin_seconds=3600, s=2.0, gamma=1.0).count() == 0


def test_bursts_detects_planted_burst(spark):
    rows = [
        ((pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)).to_pydatetime(), "a")
        for i in range(48)
    ]
    # plant 10 extra events inside hours 20-21
    for k in range(10):
        rows.append(
            ((pd.Timestamp("2024-01-01 20:00:00") + pd.Timedelta(minutes=5 * k)).to_pydatetime(), "a")
        )
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = kleinberg_bursts(df, bin_seconds=3600, s=2.0, gamma=1.0).collect()
    assert len(got) == 1
    assert got[0]["burst_start"] == int(pd.Timestamp("2024-01-01 20:00:00").timestamp())
    assert got[0]["total_count"] >= 10


def test_bursts_single_bin_key_and_validation(spark):
    df = spark.createDataFrame(
        [(pd.Timestamp("2024-01-01").to_pydatetime(), "a")], "ts timestamp, event_type string"
    )
    # one bin: DP degenerates to the start state -> no burst rows
    assert kleinberg_bursts(df, bin_seconds=3600).count() == 0
    with pytest.raises(ValueError):
        kleinberg_bursts(df, bin_seconds=0)
    with pytest.raises(ValueError):
        kleinberg_bursts(df, s=1.0)
    with pytest.raises(ValueError):
        kleinberg_bursts(df, gamma=-1)
    with pytest.raises(ValueError, match="max_bins"):
        kleinberg_bursts(df, bin_seconds=3600, max_bins=0).count()


# ------------------------------------------------- token_bucket_throttle
def _bucket_np(ts, cap, rate, cost):
    tp, lvl, thr, first = None, cap, 0, None
    for t in sorted(ts):
        if tp is not None:
            refill = (t - tp) * rate
            lvl = lvl + refill if lvl + refill < cap else cap
        tp = t
        if lvl >= cost:
            lvl -= cost
        else:
            thr += 1
            if first is None:
                first = t
    return thr, first, lvl


def test_token_bucket_matches_python_twin(spark, events, events_pd):
    from diive_spark.operators.eventflow import token_bucket_throttle

    got = {
        r["user_id"]: r
        for r in token_bucket_throttle(
            events, capacity=3.0, refill_per_s=0.00001
        ).collect()
    }
    n_throttled_total = 0
    for uid, g in events_pd.groupby("user_id"):
        ts = (g["ts"].astype("int64").to_numpy() // 1000).astype(float) / 1e6
        thr, first, lvl = _bucket_np(ts, 3.0, 0.00001, 1.0)
        r = got[uid]
        assert r["n_events"] == len(ts)
        assert r["n_throttled"] == thr
        assert (r["first_throttled_t"] is None) == (first is None)
        if first is not None:
            assert r["first_throttled_t"] == first
        assert r["final_level"] == lvl
        n_throttled_total += thr
    assert n_throttled_total > 0  # the policy must bite on this corpus


def test_token_bucket_hand_case_and_validation(spark):
    import datetime as dt

    from diive_spark.operators.eventflow import token_bucket_throttle

    base = dt.datetime(2024, 1, 1)
    # capacity 2, refill 0.1/s: events at t=0,1,2 -> levels 2,1.1,0.2
    # -> third event throttled; then t=100 refills to cap -> allowed
    ts = [0.0, 1.0, 2.0, 100.0]
    rows = [(1, base + dt.timedelta(seconds=s)) for s in ts]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = token_bucket_throttle(
        df, capacity=2.0, refill_per_s=0.1
    ).collect()[0]
    assert r["n_events"] == 4 and r["n_throttled"] == 1
    assert r["first_throttled_t"] == base.timestamp() + 2.0
    np.testing.assert_allclose(r["final_level"], 1.0)  # cap 2 - cost 1
    with pytest.raises(ValueError):
        token_bucket_throttle(df, capacity=0)
    with pytest.raises(ValueError):
        token_bucket_throttle(df, cost=5.0, capacity=2.0)
