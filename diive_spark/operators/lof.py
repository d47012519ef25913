"""Local Outlier Factor flag — sklearn inside applyInPandas.

Reference: diive/pkgs/outlierdetection/lof.py:44-89
(LocalOutlierFactorAllData): sklearn LOF with minkowski p=2,
n_neighbors default len/200 (stepwiseoutlierdetection.py:180,195),
contamination='auto'; daytime/nighttime variant = stratified fit.

Spark has no native LOF; each series group fits independently in a
pandas cohort (``groupBy(key).applyInPandas``) — the distributed
pattern for per-series model fits.  sklearn is optional (import-try):
without it the operator raises at call time with a clear message.
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
    """Per-series LOF flag (0 ok / 2 outlier / NULL missing)."""
    if not HAVE_SKLEARN:
        raise ImportError(
            "sklearn is required for lof_flag (LocalOutlierFactor); "
            "not installed in this environment"
        )
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
            lof = LocalOutlierFactor(
                n_neighbors=min(k, len(x) - 1), contamination=contamination, p=2
            )
            pred = lof.fit_predict(x)  # -1 outlier, 1 inlier
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
