"""Gap engine vs pandas oracles (GapFinder gapfinder.py:58-95,
interpolation-intent interpolate.py:8-35, backfill meteoscreening.py:597-615)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.operators.gaps import (
    backfill_limited,
    banded_fill,
    gap_runs,
    interpolate_limited,
    lookup_table_fill,
)

from .conftest import seeded_series


def pandas_gap_runs(s: pd.Series, limit=None) -> pd.DataFrame:
    """Oracle re-derived from gapfinder.py semantics."""
    isnum = s.notnull().astype(int)
    runid = isnum.cumsum()
    gaps = s[s.isnull()]
    if gaps.empty:
        return pd.DataFrame(columns=["gap_start", "gap_end", "gap_length"])
    g = gaps.groupby(runid[s.isnull()])
    out = pd.DataFrame(
        {
            "gap_start": g.apply(lambda x: x.index.min()),
            "gap_end": g.apply(lambda x: x.index.max()),
            "gap_length": g.size(),
        }
    ).reset_index(drop=True)
    if limit is not None:
        out = out[out["gap_length"] <= limit]
    return out.reset_index(drop=True)


def test_gap_runs_matches_pandas(spark):
    pdf = seeded_series(n=500, gap_frac=0.15)
    s = pd.Series(pdf["value"].values, index=pdf["pos"].values)
    for limit in (None, 2):
        got = (
            gap_runs(spark.createDataFrame(pdf), limit=limit)
            .toPandas()
            .sort_values("gap_start")
            .reset_index(drop=True)[["gap_start", "gap_end", "gap_length"]]
        )
        exp = pandas_gap_runs(s, limit).sort_values("gap_start").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interpolate_limited_matches_pandas(spark):
    pdf = seeded_series(n=400, gap_frac=0.2)
    limit = 3
    got = (
        interpolate_limited(spark.createDataFrame(pdf), limit=limit)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    s = pd.Series(pdf["value"].values)
    interp_all = s.interpolate(method="linear", limit_area="inside")
    runs = pandas_gap_runs(pd.Series(s.values, index=np.arange(len(s))), limit)
    exp = s.copy()
    for _, row in runs.iterrows():
        sl = slice(int(row["gap_start"]), int(row["gap_end"]) + 1)
        exp.iloc[sl] = interp_all.iloc[sl]
    np.testing.assert_allclose(
        got["value_gf"].values, exp.values, atol=1e-9, equal_nan=True
    )
    # flags: 1 exactly where a fill happened
    filled_mask = s.isnull() & exp.notnull()
    assert (got["value_gf_flag"].fillna(-1) == 1).sum() == filled_mask.sum()


def test_backfill_limited_matches_pandas(spark):
    pdf = seeded_series(n=300, gap_frac=0.25)
    for k in (1, 4):
        got = (
            backfill_limited(spark.createDataFrame(pdf), limit=k)
            .toPandas()
            .sort_values("pos")
            .reset_index(drop=True)
        )
        exp = pdf["value"].bfill(limit=k)
        np.testing.assert_allclose(
            got["value_bf"].values, exp.values, atol=1e-9, equal_nan=True
        )


def test_banded_fill_median(spark):
    pdf = seeded_series(n=300, gap_frac=0.1)
    band = 20
    got = (
        banded_fill(spark.createDataFrame(pdf), band=band, agg="median", min_vals=5)
        .toPandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    s = pdf["value"]
    for i in np.flatnonzero(s.isnull().values):
        seg = s.iloc[max(0, i - band) : i + band + 1].dropna()
        if len(seg) >= 5:
            assert abs(got.loc[i, "value_lookupfill"] - seg.median()) < 1e-9
        else:
            assert np.isnan(got.loc[i, "value_lookupfill"])


def test_lookup_table_fill_broadcast_plan(spark, tiny_series):
    out = lookup_table_fill(tiny_series, bucket=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # lookup table must broadcast
    assert out.where(F.col("value_ltf").isNull()).count() <= tiny_series.where(
        F.col("value").isNull()
    ).count()


def test_interpolate_dense_fast_path_equals_general(spark):
    pdf = seeded_series(n=400, gap_frac=0.2)
    sdf = spark.createDataFrame(pdf)
    slow = interpolate_limited(sdf, limit=3).toPandas().sort_values("pos")
    fast = interpolate_limited(sdf, limit=3, dense_grid=True).toPandas().sort_values("pos")
    np.testing.assert_allclose(
        slow["value_gf"].values, fast["value_gf"].values, atol=1e-12, equal_nan=True
    )
    pd.testing.assert_series_equal(
        slow["value_gf_flag"].reset_index(drop=True),
        fast["value_gf_flag"].reset_index(drop=True),
        check_dtype=False,
    )


def test_complete_grid_chunked(spark):
    """Multi-chunk grid generation (chunk smaller than the span) must
    produce the identical grid as single-chunk."""
    from diive_spark.operators.timegrid import complete_grid

    pdf = seeded_series(n=10, gap_frac=0.0)
    pdf["pos"] = pdf["pos"] * 37  # sparse positions 0..333
    sdf = spark.createDataFrame(pdf)
    one = complete_grid(sdf, step=1, chunk=100000).toPandas().sort_values("pos")
    many = complete_grid(sdf, step=1, chunk=16).toPandas().sort_values("pos")
    assert len(one) == len(many) == 334
    np.testing.assert_array_equal(one["pos"].values, many["pos"].values)
    np.testing.assert_allclose(
        one["value"].values, many["value"].values, equal_nan=True
    )
