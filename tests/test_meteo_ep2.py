"""EP2 end-to-end on the F2 meteo fixture: the reference's
StepwiseMeteoScreeningDb story (meteoscreening.py:120-533) told in one
Spark plan — potential radiation -> daytime flag -> stratified z-score
-> absolute limits -> QCF with day/night acceptance -> corrections ->
min-count-gated resample to 1H."""

from __future__ import annotations

import pyspark.sql.functions as F

from diive_spark.datagen import meteo_table
from diive_spark.operators.derived import daytime_flag_from_potrad, potential_radiation
from diive_spark.operators.outliers import abs_limits_flag, missing_vals_flag, zscore_flag
from diive_spark.operators.qcf import apply_qcf, qcf_flag
from diive_spark.operators.resample import bucket_rollup


def test_meteo_screening_chain(spark):
    met = meteo_table(spark)

    # derived vars
    d = potential_radiation(met, ts_col="TIMESTAMP_MIDDLE")
    d = daytime_flag_from_potrad(d)

    # long series for TA keyed like the engine expects
    s = d.select(
        F.lit("meteo").alias("source"),
        F.lit("TA").alias("doc_id"),
        F.unix_timestamp(F.col("TIMESTAMP_MIDDLE").cast("timestamp")).alias("pos"),
        F.col("TA").alias("value"),
        "is_daytime",
    )

    # flag battery: stratified z-score (day/night populations,
    # zscore.py:25-136) + absolute limits + missing
    flagged = zscore_flag(s, thres=3.5, strata_col="is_daytime")
    flagged = abs_limits_flag(flagged, lo=-30.0, hi=45.0)
    flagged = missing_vals_flag(flagged)

    q = qcf_flag(
        flagged,
        ["flag_zscore", "flag_abslim", "flag_missing"],
        daytime_col="is_daytime",
        daytime_accept_qcf_below=2,
        nighttime_accept_qcf_below=1,  # stricter at night: soft -> rejected
    )
    q = apply_qcf(q)

    # night records with a single soft flag must be forced to 2
    forced = q.where(
        (F.col("is_daytime") == 0) & (F.col("sum_softflags") == 1)
        & (F.col("sum_hardflags") == 0)
    )
    if forced.count() > 0:
        assert forced.where(F.col("qcf") != 2).count() == 0

    # gated resample of the filtered series to 1H
    rolled = bucket_rollup(
        q, every=3600, value_col="value_qcf", mincounts_perc=0.9
    )
    n_hours = rolled.count()
    assert 600 < n_hours <= 744  # July = 744 hours; gaps + gate drop some
    # means stay in physical range
    row = rolled.agg(F.min("mean").alias("lo"), F.max("mean").alias("hi")).first()
    assert -30.0 < row["lo"] and row["hi"] < 45.0


def test_qcf_acceptance_thresholds(spark):
    rows = [
        # (id, f1, is_day, expected_qcf)
        (1, 1, 1, 1),   # day, 1 soft, accept_below=2 -> stays 1
        (2, 1, 0, 2),   # night, 1 soft, accept_below=1 -> forced 2
        (3, 0, 0, 0),   # night, clean -> 0
        (4, 2, 1, 2),   # day, hard -> 2
    ]
    df = spark.createDataFrame(rows, "id int, f1 int, is_day int, expected int")
    out = qcf_flag(
        df, ["f1"], daytime_col="is_day",
        daytime_accept_qcf_below=2, nighttime_accept_qcf_below=1,
    ).toPandas().sort_values("id")
    assert (out["qcf"] == out["expected"]).all()


def test_histogram_unique_trim(spark):
    from diive_spark.operators.analyses import histogram_unique

    df = spark.createDataFrame(
        [(v,) for v in [1.0] * 5 + [2.0] * 3 + [3.0] * 7 + [4.0] * 2], "value double"
    )
    full = histogram_unique(df).toPandas().sort_values("bin_value")
    assert list(full["count"]) == [5, 3, 7, 2]
    trimmed = histogram_unique(df, trim_first=1, trim_last=1).toPandas().sort_values("bin_value")
    assert list(trimmed["bin_value"]) == [2.0, 3.0]
