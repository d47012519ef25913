"""ScreeningPipeline orchestration, multires harmonization, sources,
derived variables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from diive_spark.operators.pipeline import ScreeningPipeline, harmonize_multires
from diive_spark.operators.derived import (
    daytime_flag_from_potrad,
    potential_radiation,
    timestamp_features,
    vpd_from_ta_rh,
)
from diive_spark.sources.readers import (
    dedup_column_names,
    merge_files_combine_first,
)
from diive_spark.datagen import meteo_table

from .conftest import seeded_series


def test_screening_pipeline_end_to_end(spark):
    pdf = seeded_series(n=600, gap_frac=0.05)
    pdf.loc[100, "value"] = 500.0  # spike
    p = (
        ScreeningPipeline(spark.createDataFrame(pdf))
        .flag_zscore(thres=4.0)
        .flag_abs_limits(lo=0.0, hi=120.0)
        .flag_missing()
        .finalize_qcf()
    )
    assert p.flag_cols == ["flag_zscore", "flag_abslim", "flag_missing"]
    rolled = p.resample(every=60, mincounts_perc=0.25)
    assert rolled.count() == 10
    # the spike must not contaminate any bin mean
    assert rolled.agg(F.max("max")).first()[0] < 500.0


def test_pipeline_dedups_repeated_tests(spark):
    pdf = seeded_series(n=100)
    p = (
        ScreeningPipeline(spark.createDataFrame(pdf))
        .flag_zscore(thres=4.0)
        .flag_zscore(thres=3.0)
    )
    assert p.flag_cols == ["flag_zscore", "flag_zscore_2"]
    assert "flag_zscore_2" in p.df.columns


def test_harmonize_multires_backfill(spark):
    # END-stamped series: coarse 10-step then fine 1-step (F3 fixture)
    rows = []
    for a in range(10, 101, 10):          # coarse: pos 10,20,...,100
        rows.append(("s", "d", a, float(a)))
    for a in range(101, 131):             # fine: pos 101..130
        rows.append(("s", "d", a, float(a)))
    df = spark.createDataFrame(rows, "source string, doc_id string, pos long, value double")
    out = harmonize_multires(df).toPandas().sort_values("pos").reset_index(drop=True)
    # grid complete
    assert len(out) == 121  # pos 10..130
    h = out.set_index("pos")["value_harmonized"]
    # a coarse value stamped at 20 (END convention) backfills 11..19
    assert (h.loc[11:20] == 20.0).all()
    # fine region keeps its own values
    assert (h.loc[101:130] == np.arange(101, 131)).all()


def test_merge_files_combine_first(spark):
    a = spark.createDataFrame([(1, 10.0), (2, None), (3, 30.0)], "t long, v double")
    b = spark.createDataFrame([(2, 99.0), (3, 99.0), (4, 40.0)], "t long, v double")
    out = (
        merge_files_combine_first([a, b], "t", ["v"])
        .toPandas().sort_values("t").reset_index(drop=True)
    )
    assert list(out["v"]) == [10.0, 99.0, 30.0, 40.0]  # earlier file wins


def test_dedup_column_names():
    assert dedup_column_names(["a", "b", "a", "a"]) == ["a", "b", "a.1", "a.2"]


def test_derived_variables(spark):
    met = meteo_table(spark)
    out = potential_radiation(met, ts_col="TIMESTAMP_MIDDLE")
    out = daytime_flag_from_potrad(out)
    out = vpd_from_ta_rh(out)
    out = timestamp_features(out, ts_col="TIMESTAMP_MIDDLE")
    row = out.agg(
        F.max("sw_in_pot").alias("max_pot"),
        F.sum("is_daytime").alias("n_day"),
        F.min("VPD").alias("min_vpd"),
        F.max("feat_season").alias("season"),
    ).first()
    assert 800 < row["max_pot"] < 1361
    assert 0 < row["n_day"] < 1488
    assert row["min_vpd"] >= 0.0
    assert row["season"] == 2  # July -> JJA
    # night has zero potential radiation
    night = out.where(F.hour("TIMESTAMP_MIDDLE") == 1).agg(F.max("sw_in_pot")).first()[0]
    assert night == 0.0


def test_identify_flagcols_alias_groups():
    """Rename-aware flag selection (reference core/base/identify.py:4-47):
    NEE-family series pick up flags computed under FC / co2_flux names."""
    from diive_spark.conventions import identify_flagcols, identify_relevants

    cols = [
        "TIMESTAMP", "NEE_L2", "FLAG_L2_FC_OUTLIER_TEST",
        "FLAG_L2_NEE_RANGE_TEST", "FLAG_L2_H_SPIKE_TEST",
        "FLAG_L3.1_NEE_QCF", "FLAG_L2_TA_RANGE_TEST", "NOT_A_FLAG_TEST",
    ]
    assert identify_relevants("NEE_L3.1") == ["_FC_", "_NEE_", "_co2_flux_"]
    assert identify_relevants("FC") == ["_FC_", "_NEE_", "_co2_flux_"]
    assert identify_relevants("TA_T1") == ["TA_T1"]
    got = identify_flagcols(cols, "NEE_L2")
    assert got == [
        "FLAG_L2_FC_OUTLIER_TEST", "FLAG_L2_NEE_RANGE_TEST", "FLAG_L3.1_NEE_QCF",
    ]
    # H flags only for H-family series
    assert identify_flagcols(cols, "H") == ["FLAG_L2_H_SPIKE_TEST"]
    # plain meteo variable: substring match on its own name
    # (reference identify.py:46: `any(n in f)`)
    assert identify_flagcols(cols, "TA") == ["FLAG_L2_TA_RANGE_TEST"]
    assert identify_flagcols(cols, "SW_IN") == []


def test_reference_name_facade(spark, tiny_series):
    """diive vocabulary routes to the distributed operators: a
    reference-style flow (zScore -> GapFinder -> linear_interpolation
    -> resample_series_to_30MIN) runs end-to-end through the facade,
    and aliases are the SAME objects as the implementations."""
    import pyspark.sql.functions as F

    from diive_spark import api
    from diive_spark.operators.gaps import gap_runs
    from diive_spark.operators.outliers import zscore_flag

    assert api.zScore is zscore_flag
    assert api.GapFinder is gap_runs
    assert len(api.__all__) >= 50

    flagged = api.zScore(tiny_series, thres=4.0)
    assert "flag_zscore" in flagged.columns
    runs = api.GapFinder(tiny_series)
    assert runs.count() > 0
    filled = api.linear_interpolation(tiny_series, limit=3)
    rolled = api.resample_series_to_30MIN(filled, every=1800,
                                          value_col="value_gf")
    assert rolled.where(F.col("n") > 0).count() > 0


def test_match_var_group_selects_by_glob():
    """Variable-group glob selection (reference vargroups.py idiom)."""
    from diive_spark.conventions import VAR_GROUPS, match_var_group

    cols = ["TA_1_1_1", "Ta_f", "SW_IN_POT", "co2_flux", "NEE_CUT_50",
            "wind_dir", "VPD_hPa", "junk"]
    assert match_var_group(cols, "AIR_TEMPERATURE") == ["TA_1_1_1", "Ta_f"]
    assert match_var_group(cols, "FLUXES") == ["co2_flux", "NEE_CUT_50"]
    assert match_var_group(cols, ["*VPD*", "wind_dir"]) == ["wind_dir", "VPD_hPa"]
    assert "SHORTWAVE_IN" in VAR_GROUPS
