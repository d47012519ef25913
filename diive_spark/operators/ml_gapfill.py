"""Random-forest gap filling — Spark ML rewrite of RandomForestTS
(reference diive/pkgs/gapfilling/randomforest_ts.py:160-899).

Pipeline parity with the reference:
- feature synthesis: lagged copies of the target (:232-233, 719-724),
  position/timestamp features (times.py:513-597), record number;
- train on observed rows, score on a held-out split with
  mae/rmse/r2 (core/ml/common.py:126-176 subset);
- "full model" predictions fill gaps where ALL features are present
  (flag 1, :732-811);
- a FALLBACK model trained on position-only features fills the
  remaining gaps (flag 2, :813-839);
- output ``<target>_gfRF`` = observed where present else prediction,
  plus the 0/1/2 source flag (:891-898).

Runs distributed via Spark ML (JVM forests); for per-series small-model
fits an ``applyInPandas`` + sklearn variant is the alternative — not
needed for the flagship path.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..conventions import KEY_COLS


def build_features(
    df: DataFrame,
    target_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    lags: Sequence[int] = (1, 2, 3),
    cycle: int | None = 64,
) -> tuple[DataFrame, list[str], list[str]]:
    """Lag + position feature columns.  Returns (df, full_features,
    fallback_features)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(axis_col)
    out = df
    lag_cols = []
    for k in lags:
        c = f"feat_lag{k}"
        out = out.withColumn(c, F.lag(target_col, k).over(w))
        lag_cols.append(c)
    out = out.withColumn("feat_recno", F.row_number().over(w).cast("double"))
    out = out.withColumn("feat_pos", F.col(axis_col).cast("double"))
    ts_cols = ["feat_recno", "feat_pos"]
    if cycle:
        out = out.withColumn(
            "feat_phase", F.pmod(F.col(axis_col), F.lit(cycle)).cast("double")
        )
        ts_cols.append("feat_phase")
    return out, lag_cols + ts_cols, ts_cols


def rf_gapfill(
    df: DataFrame,
    target_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    lags: Sequence[int] = (1, 2, 3),
    cycle: int | None = 64,
    n_trees: int = 30,
    max_depth: int = 8,
    test_frac: float = 0.25,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """Gap-fill *target_col*; returns (df + ``<target>_gfRF`` +
    ``<target>_gfRF_flag``, scores dict)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    feat_df, full_feats, fb_feats = build_features(
        df, target_col, axis_col, key_cols, lags, cycle
    )
    feat_df = feat_df.localCheckpoint(eager=True)

    def fit_predict(features: list[str], name: str):
        asm = VectorAssembler(
            inputCols=features, outputCol=f"_vec_{name}", handleInvalid="skip"
        )
        observed = feat_df.where(F.col(target_col).isNotNull())
        for c in features:
            observed = observed.where(F.col(c).isNotNull())
        train, test = observed.randomSplit([1 - test_frac, test_frac], seed=seed)
        rf = RandomForestRegressor(
            featuresCol=f"_vec_{name}", labelCol=target_col,
            predictionCol=f"_pred_{name}", numTrees=n_trees,
            maxDepth=max_depth, seed=seed,
        )
        model = rf.fit(asm.transform(train))
        test_pred = model.transform(asm.transform(test))
        scores = {}
        for metric in ("mae", "rmse", "r2"):
            scores[metric] = RegressionEvaluator(
                labelCol=target_col, predictionCol=f"_pred_{name}", metricName=metric
            ).evaluate(test_pred)
        pred_all = model.transform(asm.transform(feat_df))
        return pred_all.select(
            *key_cols, axis_col, F.col(f"_pred_{name}").alias(f"pred_{name}")
        ), scores

    full_pred, full_scores = fit_predict(full_feats, "full")
    fb_pred, fb_scores = fit_predict(fb_feats, "fb")

    keys = list(key_cols) + [axis_col]
    joined = (
        feat_df.join(full_pred, on=keys, how="left")
        .join(fb_pred, on=keys, how="left")
    )
    t = F.col(target_col)
    gf = F.coalesce(t, F.col("pred_full"), F.col("pred_fb"))
    flag = (
        F.when(t.isNotNull(), F.lit(0))
        .when(F.col("pred_full").isNotNull(), F.lit(1))
        .when(F.col("pred_fb").isNotNull(), F.lit(2))
    )
    out = (
        joined.withColumn(f"{target_col}_gfRF", gf)
        .withColumn(f"{target_col}_gfRF_flag", flag)
        .drop("pred_full", "pred_fb",
              *[c for c in joined.columns if c.startswith("feat_")])
    )
    return out, {"full_model": full_scores, "fallback_model": fb_scores}
