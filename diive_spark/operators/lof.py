"""Local Outlier Factor flag — sklearn inside applyInPandas.

Reference: diive/pkgs/outlierdetection/lof.py:44-89
(LocalOutlierFactorAllData): sklearn LOF with minkowski p=2,
n_neighbors default len/200 (stepwiseoutlierdetection.py:180,195),
contamination='auto'; daytime/nighttime variant = stratified fit.

Spark has no native LOF; each series group fits independently in a
pandas cohort (``groupBy(key).applyInPandas``) — the distributed
pattern for per-series model fits.  sklearn is optional (import-try):
without it an exact numpy LOF kernel (same algorithm: k-distance,
reachability distance, lrd with sklearn's 1e-10 floor, LOF ratio,
contamination='auto' -> LOF > 1.5) runs instead, so the operator works
in sklearn-free environments.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..conventions import FLAG_HARD, FLAG_OK, KEY_COLS

try:  # optional dependency
    from sklearn.neighbors import LocalOutlierFactor

    HAVE_SKLEARN = True
except ImportError:  # pragma: no cover
    HAVE_SKLEARN = False


def lof_scores_numpy(x: np.ndarray, k: int) -> np.ndarray:
    """Exact Local Outlier Factor (Breunig et al. 2000) for a 1-D
    sample, matching sklearn's formulation: stable-sorted k nearest
    neighbors, reach-dist = max(k-distance(o), d(p,o)),
    lrd = 1/(mean reach + 1e-10), LOF = mean(lrd(kNN))/lrd.
    O(n^2) per cohort — cohorts are per-series groups, bounded."""
    n = len(x)
    d = np.abs(x[:, None] - x[None, :])
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    ndist = np.take_along_axis(d, idx, axis=1)
    kdist = ndist[:, -1]
    reach = np.maximum(kdist[idx], ndist)
    lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
    return lrd[idx].mean(axis=1) / lrd


def _predict_numpy(x: np.ndarray, k: int, contamination) -> np.ndarray:
    """-1 outlier / 1 inlier, sklearn decision rule: 'auto' -> LOF > 1.5;
    float c -> the c-fraction with the highest LOF."""
    lof = lof_scores_numpy(x, k)
    if contamination == "auto":
        thresh = 1.5
    else:
        thresh = np.percentile(lof, 100.0 * (1.0 - float(contamination)))
    return np.where(lof > thresh, -1, 1)


def lof_flag(
    df: DataFrame,
    n_neighbors: int | None = None,
    contamination: str | float = "auto",
    axis_col: str = "pos",
    value_col: str = "value",
    key_cols: Sequence[str] = KEY_COLS,
    strata_col: str | None = None,
    flag_col: str = "flag_lof",
) -> DataFrame:
    """Per-series LOF flag (0 ok / 2 outlier / NULL missing).  Uses
    sklearn when present, else the exact numpy kernel above."""
    keys = list(key_cols) + ([strata_col] if strata_col else [])
    schema = T.StructType(
        [df.schema[k] for k in list(key_cols)]
        + ([df.schema[strata_col]] if strata_col else [])
        + [df.schema[axis_col], T.StructField(flag_col, T.IntegerType())]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].values
        ok_mask = ~pd.isna(vals)
        flags = np.full(len(pdf), np.nan)
        x = vals[ok_mask].reshape(-1, 1)
        if len(x) >= 10:
            k = n_neighbors or max(2, int(len(x) / 200))
            k = min(k, len(x) - 1)
            if HAVE_SKLEARN:
                lof = LocalOutlierFactor(
                    n_neighbors=k, contamination=contamination, p=2
                )
                pred = lof.fit_predict(x)  # -1 outlier, 1 inlier
            else:
                pred = _predict_numpy(x.ravel(), k, contamination)
            flags[ok_mask] = np.where(pred == -1, FLAG_HARD, FLAG_OK)
        elif len(x) > 0:
            flags[ok_mask] = FLAG_OK
        out = pdf[keys + [axis_col]].copy()
        out[flag_col] = pd.array(
            [None if np.isnan(f) else int(f) for f in flags], dtype="Int32"
        )
        return out

    flagged = df.groupBy(*keys).applyInPandas(fit, schema=schema)
    return df.join(flagged, on=keys + [axis_col], how="left")
