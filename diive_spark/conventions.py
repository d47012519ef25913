"""Shared constants & naming conventions (reference parity).

Flag values follow the reference exactly
(diive/core/base/flagbase.py:80-88): 0 = ok, 1 = soft, 2 = hard/rejected,
NULL = unknown. Timestamp conventions START/MIDDLE/END follow
diive/core/times/times.py:280-305.
"""

from __future__ import annotations

FLAG_OK = 0
FLAG_SOFT = 1
FLAG_HARD = 2

# Timestamp/label conventions for bucket rollups.
# diive resample_series_to_30MIN stamps bins with their END
# (label='right', resampling.py:86-93); resample_df uses label/closed
# 'left' for T/H/D and 'right' for W/M/A (frames.py:353-362).
LABEL_LEFT = "left"   # bin labelled with its start (T/H/D convention)
LABEL_RIGHT = "right"  # bin labelled with its end (30MIN path, W/M/A)

# Missing-data sentinel used by the reference CSV formats
# (diive/configs/filetypes/DIIVE_CSV_30MIN.yml NA_VALUES; fluxnet export
# fillna(-9999), diive/core/io/filereader.py:596).
NA_SENTINEL = -9999

# Series key columns for the tokens graft: per-doc token streams are
# per-series signals keyed by (source, doc_id), position = time axis.
KEY_COLS = ("source", "doc_id")
POS_COL = "pos"
VALUE_COL = "value"


# ---- rename-aware flag-column identification (core/base/identify.py:4-47)
# Variables change names across QC levels (e.g. NEE checks run on FC);
# each entry maps a series-name rule to the flag-name substrings that
# remain relevant for it.
_ALIAS_GROUPS: list[tuple[tuple[str, ...], tuple[str, ...], list[str]]] = [
    # (prefixes, exact names, relevant substrings)
    (("NEE_",), ("FC", "co2_flux"), ["_FC_", "_NEE_", "_co2_flux_"]),
    (("co2_flux_",), (), ["CHECK", "_NEE_"]),
    (("H_",), ("H",), ["_H_"]),
    (("LE_",), ("LE",), ["_LE_"]),
    (("ET_",), ("ET",), ["_ET_"]),
    (("FH2O_",), ("FH2O",), ["_FH2O_"]),
    (("h2o_flux_",), ("h2o_flux",), ["_h2o_flux_"]),
    (("TAU_",), ("TAU",), ["_TAU_"]),
    (("FN2O_",), ("FN2O",), ["_FN2O_"]),
    (("FCH4_",), ("FCH4",), ["_FCH4_"]),
]


def identify_relevants(seriescol: str) -> list[str]:
    """Substrings of flag names relevant for *seriescol*
    (identify.py:4-34): alias groups tie renamed flux variables to the
    flags computed under their other names."""
    for prefixes, exacts, relevant in _ALIAS_GROUPS:
        if seriescol.startswith(prefixes) or seriescol in exacts:
            return list(relevant)
    return [seriescol]


def identify_flagcols(columns: list[str], seriescol: str) -> list[str]:
    """FLAG_*_TEST / FLAG_*_QCF columns relevant for *seriescol*
    (identify.py:36-47)."""
    flagcols = [
        c for c in columns
        if str(c).startswith("FLAG_") and str(c).endswith(("_TEST", "_QCF"))
    ]
    relevant = identify_relevants(seriescol)
    return [f for f in flagcols if any(n in f for n in relevant)]


# Variable-group glob patterns (reference core/utils/vargroups.py:1-70 —
# only consumed by a __BAK__ module there, kept here as the documented
# selector idiom).  Patterns are fnmatch-style; match_var_group picks a
# frame's columns for batch operations ("flag every TA_* column").
VAR_GROUPS: dict[str, list[str]] = {
    "AIR_TEMPERATURE": ["*TA_*", "Ta_*", "*air_temperature*"],
    "SHORTWAVE_IN": ["*SW_IN_*", "Rg_*"],
    "NIGHTTIME_DETECTION": ["*SW_IN*", "*Rg_*", "*daytime*", "*PPFD_*"],
    "FLUXES": ["co2_flux", "h2o_flux", "LE", "H", "ET", "n2o_flux",
               "ch4_flux", "NEE*", "GPP*", "RECO*"],
    "WIND_SPEED": ["*wind_speed*", "*u_rot*"],
    "WIND_DIR": ["wind_dir"],
    "VPD": ["*VPD*"],
    "STORAGE": ["*_strg*"],
    "SPECTRAL_CORRECTION_FACTOR": ["*_scf*"],
    "SIGNAL_STRENGTH": ["*signal_strength*", "*window_dirtiness*",
                        "*status_byte*", "*agc*"],
}


def match_var_group(columns: list[str], patterns: list[str] | str) -> list[str]:
    """Columns matching any fnmatch-style pattern (a VAR_GROUPS key or
    an explicit pattern list), order-preserving and deduplicated."""
    import fnmatch

    if isinstance(patterns, str):
        patterns = VAR_GROUPS[patterns]
    out: list[str] = []
    for c in columns:
        if any(fnmatch.fnmatch(str(c), p) for p in patterns) and c not in out:
            out.append(c)
    return out
