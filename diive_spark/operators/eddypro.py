"""EddyPro-style flag extraction + Level-2 battery (reference
diive/pkgs/qaqc/eddyproflags.py, levels pipeline
diive/pkgs/fluxprocessingchain/level2_qualityflags.py:16-139).

All tests are pure column expressions over flag/metric columns:

- signal-strength threshold flag (eddyproflags.py:13-59): hard-flag
  records whose signal strength is below a threshold;
- VM97 multi-digit flag strings (:62-105, 153-355): each test is one
  digit of an integer flag (e.g. ``8112``); digit 9 -> NULL (unknown),
  1 -> hard 2, 0 -> 0;
- gas completeness (:356-406): expected number of high-frequency
  records per averaging interval; below a fraction -> hard flag;
- spectral correction factor threshold (:407-454): SCF above limit ->
  hard flag;
- SSITC pass-through (:455+): EddyPro's 0/1/2 flag taken as-is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..conventions import FLAG_HARD, FLAG_OK


def signal_strength_flag(
    df: DataFrame, signal_col: str, thres: float, flag_col: str = "flag_signal"
) -> DataFrame:
    """Hard flag where signal strength < threshold (eddyproflags.py:13-59)."""
    s = F.col(signal_col)
    return df.withColumn(
        flag_col,
        F.when(s.isNull(), F.lit(None).cast("int"))
        .when(s < thres, F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )


def vm97_digit_flag(
    df: DataFrame, vm97_col: str, digit_pos: int, flag_col: str
) -> DataFrame:
    """Extract one test's digit from a VM97 flag integer
    (eddyproflags.py:62-105): the flag string looks like ``8` + one
    digit per test`` — digit_pos is 1-based after the leading 8.
    Digit 9 -> NULL (not available), 1 -> 2 (hard), 0 -> 0."""
    digit = F.substring(F.col(vm97_col).cast("string"), digit_pos + 1, 1)
    return df.withColumn(
        flag_col,
        F.when(F.col(vm97_col).isNull() | (digit == "9"), F.lit(None).cast("int"))
        .when(digit == "1", F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )


def completeness_flag(
    df: DataFrame,
    n_records_col: str,
    expected: int,
    min_frac: float = 0.9,
    flag_col: str = "flag_completeness",
) -> DataFrame:
    """Hard flag when fewer than min_frac * expected raw records were
    available in the averaging interval (eddyproflags.py:356-406)."""
    n = F.col(n_records_col)
    return df.withColumn(
        flag_col,
        F.when(n.isNull(), F.lit(None).cast("int"))
        .when(n / expected < min_frac, F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )


def scf_flag(
    df: DataFrame, scf_col: str, thres: float = 2.0, flag_col: str = "flag_scf"
) -> DataFrame:
    """Hard flag where the spectral correction factor exceeds *thres*
    (eddyproflags.py:407-454)."""
    s = F.col(scf_col)
    return df.withColumn(
        flag_col,
        F.when(s.isNull(), F.lit(None).cast("int"))
        .when(s > thres, F.lit(FLAG_HARD))
        .otherwise(F.lit(FLAG_OK)),
    )


def ssitc_flag(df: DataFrame, ssitc_col: str, flag_col: str = "flag_ssitc") -> DataFrame:
    """SSITC 0/1/2 pass-through (eddyproflags.py:455+)."""
    return df.withColumn(flag_col, F.col(ssitc_col).cast("int"))


def level2_battery(
    df: DataFrame,
    ssitc_col: str | None = None,
    signal_col: str | None = None,
    signal_thres: float = 60.0,
    vm97_col: str | None = None,
    vm97_tests: dict[str, int] | None = None,
) -> tuple[DataFrame, list[str]]:
    """Level-2 flag battery orchestration
    (level2_qualityflags.py:16-139): apply the configured tests, return
    (df, flag column names) ready for the QCF combiner."""
    flags: list[str] = []
    if ssitc_col:
        df = ssitc_flag(df, ssitc_col)
        flags.append("flag_ssitc")
    if signal_col:
        df = signal_strength_flag(df, signal_col, signal_thres)
        flags.append("flag_signal")
    if vm97_col and vm97_tests:
        for name, pos in vm97_tests.items():
            col = f"flag_vm97_{name}"
            df = vm97_digit_flag(df, vm97_col, pos, col)
            flags.append(col)
    return df, flags


def storage_correction(
    df: DataFrame,
    flux_col: str,
    storage_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Level-3.1 storage correction: corrected flux = flux + storage term
    (diive/pkgs/fluxprocessingchain/level31_storagecorrection.py:129-146)."""
    out_col = out_col or f"{flux_col}_L31"
    return df.withColumn(out_col, F.col(flux_col) + F.col(storage_col))


def storage_correction_gapfilled(
    df: DataFrame,
    flux_col: str,
    storage_col: str,
    axis_col: str = "pos",
    key_cols: Sequence[str] = None,
    out_col: str | None = None,
    **rf_kwargs,
) -> tuple[DataFrame, dict]:
    """Level-3.1 storage correction with RF-gap-filled storage term
    (level31_storagecorrection.py `gapfill_storage_term=True` path):
    the storage series is gap-filled with
    :func:`diive_spark.operators.ml_gapfill.rf_gapfill` first, then
    corrected flux = flux + filled storage."""
    from ..conventions import KEY_COLS
    from .ml_gapfill import rf_gapfill

    keys = list(key_cols) if key_cols is not None else list(KEY_COLS)
    out_col = out_col or f"{flux_col}_L31"
    filled, scores = rf_gapfill(
        df, target_col=storage_col, axis_col=axis_col, key_cols=keys,
        **rf_kwargs,
    )
    gf = f"{storage_col}_gfRF"
    return (
        filled.withColumn(out_col, F.col(flux_col) + F.col(gf)),
        scores,
    )
