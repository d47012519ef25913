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
