"""Derived variables (reference diive/pkgs/createvar/*): potential
radiation, daytime/nighttime flags, VPD, timestamp feature columns,
season labels.  All pure column math (JVM, codegen-friendly).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def potential_radiation(
    df: DataFrame,
    ts_col: str = "ts",
    lat: float = 47.0,
    lon: float = 8.0,
    utc_offset: int = 1,
    out_col: str = "sw_in_pot",
) -> DataFrame:
    """Potential shortwave radiation (Stull 1988 closed form) from
    lat/lon/UTC offset over day-of-year and hour fraction
    (diive/pkgs/createvar/potentialradiation.py:6-78)."""
    doy = F.dayofyear(ts_col)
    hour_frac = (
        F.hour(ts_col) + F.minute(ts_col) / 60.0 + F.second(ts_col) / 3600.0
    )
    lat_r = math.radians(lat)
    # solar declination (rad)
    decl = F.radians(F.lit(23.45) * F.sin(F.radians((F.lit(360.0) / 365) * (doy - 81))))
    # local solar time correction: longitude vs zone meridian
    lstm = 15.0 * utc_offset
    b = F.radians((F.lit(360.0) / 365) * (doy - 81))
    eot = (
        9.87 * F.sin(2 * b) - 7.53 * F.cos(b) - 1.5 * F.sin(b)
    )  # equation of time, minutes
    tc = 4.0 * (lon - lstm) + eot
    lst = hour_frac + tc / 60.0
    hra = F.radians(F.lit(15.0) * (lst - 12.0))  # hour angle
    sin_alt = (
        F.lit(math.sin(lat_r)) * F.sin(decl)
        + F.lit(math.cos(lat_r)) * F.cos(decl) * F.cos(hra)
    )
    s0 = 1361.0  # solar constant W m-2
    return df.withColumn(out_col, F.greatest(F.lit(0.0), F.lit(s0) * sin_alt))


def daytime_flag_from_potrad(
    df: DataFrame, potrad_col: str = "sw_in_pot", thres: float = 50.0,
    out_col: str = "is_daytime",
) -> DataFrame:
    """Daytime = potential radiation >= 50 W m-2
    (diive/pkgs/createvar/daynightflag.py:18-131)."""
    return df.withColumn(out_col, (F.col(potrad_col) >= thres).cast("int"))


def daytime_flag_from_hour(
    df: DataFrame, ts_col: str = "ts", start: int = 7, end: int = 18,
    out_col: str = "is_daytime",
) -> DataFrame:
    """Hour-window day flag (core/dfun/frames.py:900-929)."""
    h = F.hour(ts_col)
    return df.withColumn(out_col, h.between(start, end).cast("int"))


def vpd_from_ta_rh(
    df: DataFrame, ta_col: str = "TA", rh_col: str = "RH", out_col: str = "VPD"
) -> DataFrame:
    """Magnus-formula VPD in kPa from air temperature (degC) and relative
    humidity (%) (diive/pkgs/createvar/vpd.py:5-49)."""
    ta, rh = F.col(ta_col), F.col(rh_col)
    es = 0.6108 * F.exp(17.27 * ta / (ta + 237.3))  # kPa
    return df.withColumn(out_col, F.greatest(F.lit(0.0), es * (1 - rh / 100.0)))


def timestamp_features(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """year/season/month/week/doy/hour feature columns
    (diive/core/times/times.py:513-597)."""
    t = F.col(ts_col)
    return (
        df.withColumn("feat_year", F.year(t))
        .withColumn("feat_month", F.month(t))
        .withColumn("feat_week", F.weekofyear(t))
        .withColumn("feat_doy", F.dayofyear(t))
        .withColumn("feat_hour", F.hour(t))
        .withColumn("feat_season", season_from_month(F.month(t)))
    )


def season_from_month(month: Column) -> Column:
    """Meteorological season int (times.py:600-632): DJF=0, MAM=1,
    JJA=2, SON=3."""
    return (
        F.when(month.isin(12, 1, 2), 0)
        .when(month.isin(3, 4, 5), 1)
        .when(month.isin(6, 7, 8), 2)
        .otherwise(3)
    )
