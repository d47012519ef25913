"""Offset corrections, wind-direction sweep, optimum range, setto_value,
QCF report, FLUXNET export — previously untested operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.operators.analyses import find_optimum_range
from diive_spark.operators.corrections import (
    apply_wind_offset,
    remove_high_bound_offset,
    remove_stratum_offset,
    setto_value,
    wind_direction_offset,
)
from diive_spark.operators.qcf import qcf_flag, qcf_report
from diive_spark.sources.readers import export_fluxnet

from .conftest import seeded_series


def test_remove_stratum_offset(spark):
    # nighttime (stratum) should be ~5 offset; day signal 100 + offset
    n = 200
    pos = np.arange(n)
    is_night = (pos % 20) < 10
    v = np.where(is_night, 5.0, 105.0)
    pdf = pd.DataFrame(
        {"source": "s", "doc_id": "d", "pos": pos, "value": v, "night": is_night}
    )
    out = (
        remove_stratum_offset(
            spark.createDataFrame(pdf), stratum_col="night", bucket=20
        )
        .toPandas().sort_values("pos")
    )
    day = out[~out["night"]]
    night = out[out["night"]]
    np.testing.assert_allclose(day["value_offsetcorr"], 100.0, atol=1e-9)
    np.testing.assert_allclose(night["value_offsetcorr"], 0.0, atol=1e-9)


def test_remove_high_bound_offset(spark):
    # RH-style: values occasionally exceed 100 by ~+4
    n = 120
    v = np.full(n, 98.0)
    v[10:20] = 104.0  # bucket 0 exceeds by 4
    pdf = pd.DataFrame({"source": "s", "doc_id": "d", "pos": np.arange(n), "value": v})
    out = (
        remove_high_bound_offset(spark.createDataFrame(pdf), bound=100.0, bucket=40)
        .toPandas().sort_values("pos").reset_index(drop=True)
    )
    # offset for bucket 0 = mean(104-100) = 4 → corrected 104→100, 98→94
    assert abs(out.loc[15, "value_offsetcorr"] - 100.0) < 1e-9
    assert abs(out.loc[5, "value_offsetcorr"] - 94.0) < 1e-9
    # later buckets inherit the ffilled offset
    assert abs(out.loc[80, "value_offsetcorr"] - 94.0) < 1e-9


def test_wind_direction_offset_recovers_shift(spark):
    rng = np.random.default_rng(31)
    base = np.concatenate([rng.normal(90, 15, 600), rng.normal(270, 20, 400)]) % 360
    ref = pd.DataFrame({"period": 2000, "value": base})
    shifted = pd.DataFrame({"period": 2001, "value": (base + 30) % 360})
    df = spark.createDataFrame(pd.concat([ref, shifted]))
    offs = wind_direction_offset(
        df, "period", ref_periods=[2000], offsets=range(-40, 41, 5),
    ).toPandas().set_index("period")
    assert offs.loc[2000, "best_offset"] == 0
    assert offs.loc[2001, "best_offset"] == -30  # undo the +30 shift
    corrected = apply_wind_offset(
        df, wind_direction_offset(df, "period", [2000], offsets=range(-40, 41, 5)),
        "period",
    )
    m = corrected.groupBy("period").agg(F.avg("value").alias("m")).toPandas()
    assert abs(m["m"].iloc[0] - m["m"].iloc[1]) < 10


def test_setto_value(spark):
    pdf = seeded_series(n=50, gap_frac=0.0)
    out = setto_value(spark.createDataFrame(pdf), ranges=[(10, 14)], value=7.0)
    got = out.toPandas().set_index("pos")["value"]
    assert (got.loc[10:14] == 7.0).all()
    assert got.loc[20] != 7.0


def test_find_optimum_range(spark):
    # y peaks where x is mid-range
    rng = np.random.default_rng(17)
    x = rng.uniform(0, 100, 3000)
    y = -((x - 60.0) ** 2) + rng.normal(0, 30, 3000)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    best = find_optimum_range(df, "x", "y", n_bins=20).first()
    assert 45 < best["x_lo"] < 70 and 50 < best["x_hi"] < 75


def test_qcf_report(spark):
    pdf = seeded_series(n=100, gap_frac=0.1)
    pdf.loc[5, "value"] = 1e6
    sdf = spark.createDataFrame(pdf)
    from diive_spark.operators.outliers import zscore_flag

    # like the reference battery, missingness is its own hard flag
    # (flags.py:8-67); rows with all-NULL test flags get QCF=0 in the
    # reference too (sum of NaN flags == 0, qcf.py:247-248)
    from diive_spark.operators.outliers import missing_vals_flag

    flagged = missing_vals_flag(zscore_flag(sdf, thres=3.0))
    q = qcf_flag(flagged, ["flag_zscore", "flag_missing"])
    rep = qcf_report(q).first()
    assert rep["n_total"] == 100
    n_missing = int(pdf["value"].isnull().sum())
    assert rep["n_rejected"] >= n_missing + 1  # gaps + the spike
    assert rep["n_unknown"] == 0
    assert rep["n_ok"] + rep["n_soft"] + rep["n_rejected"] == 100


def test_export_fluxnet(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2023-12-31 23:00", periods=4, freq="30min").to_pydatetime(),
            "NEE": [1.0, None, 3.0, 4.0],
        }
    )
    out_dir = str(tmp_path / "fluxnet")
    export_fluxnet(spark.createDataFrame(pdf), out_dir, ts_col="ts")
    back = spark.read.option("header", "true").csv(out_dir)
    rows = {r["TIMESTAMP_START"]: r for r in back.collect()}
    assert "202312312300" in rows and "202401010000" in rows  # year partitioning
    assert rows["202312312330"]["NEE"] == "-9999.0"  # NA sentinel
    assert rows["202312312300"]["TIMESTAMP_END"] == "202312312330"


def test_flag_evolution(spark):
    from diive_spark.operators.qcf import flag_evolution

    rows = [
        # f1 rejects ids 1,2; f2 rejects 2,3; f3 rejects nothing new
        (1, 2, 0, 0), (2, 2, 2, 0), (3, 0, 2, 2), (4, 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, "id int, f1 int, f2 int, f3 int")
    ev = flag_evolution(df, ["f1", "f2", "f3"]).toPandas().sort_values("step")
    assert list(ev["n_rejected_cum"]) == [2, 3, 3]
    assert list(ev["n_new"]) == [2, 1, 0]
    assert list(ev["flag_name"]) == ["f1", "f2", "f3"]
