"""Random-forest gap filling — Spark ML rewrite of RandomForestTS
(reference diive/pkgs/gapfilling/randomforest_ts.py:160-899).

Pipeline parity with the reference:
- feature synthesis: lagged copies of the target (:232-233, 719-724),
  position/timestamp features (times.py:513-597), record number;
- feature reduction vs a seeded random benchmark feature
  (:345-398): a ``.RANDOM`` noise column joins the features; every
  feature whose importance is <= the random feature's importance is
  rejected before the final model.  Importance is permutation
  importance (reference parity, per-feature re-predict over the test
  split) or Spark ML's impurity importances (``importance='impurity'``,
  zero extra passes — the 100 TB default);
- train on observed rows, score on a held-out split with the full
  battery mae/medae/mse/rmse/mape/maxe/r2 (core/ml/common.py:126-176),
  all from ONE aggregate over the test predictions;
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


def regression_scores(
    pred_df: DataFrame, label_col: str, pred_col: str
) -> dict:
    """Full reference score battery (core/ml/common.py:126-176):
    mae, medae, mse, rmse, mape, maxe, r2 — one aggregate job.
    mape follows sklearn: |err| / max(|y|, eps)."""
    err = F.col(pred_col) - F.col(label_col)
    y = F.col(label_col)
    eps = 2.220446049250313e-16  # np.finfo(np.float64).eps, sklearn's floor
    row = pred_df.agg(
        F.avg(F.abs(err)).alias("mae"),
        F.percentile(F.abs(err), F.lit(0.5)).alias("medae"),
        F.avg(err * err).alias("mse"),
        F.avg(F.abs(err) / F.greatest(F.abs(y), F.lit(eps))).alias("mape"),
        F.max(F.abs(err)).alias("maxe"),
        F.sum(err * err).alias("_sse"),
        F.sum(y * y).alias("_syy"),
        F.sum(y).alias("_sy"),
        F.count(y).alias("_n"),
    ).collect()[0]
    sst = row["_syy"] - row["_sy"] ** 2 / row["_n"]
    return {
        "mae": row["mae"],
        "medae": row["medae"],
        "mse": row["mse"],
        "rmse": row["mse"] ** 0.5,
        "mape": row["mape"],
        "maxe": row["maxe"],
        "r2": 1.0 - row["_sse"] / sst if sst > 0 else 0.0,
    }


def _permuted_column(test: DataFrame, feature: str, order_cols: Sequence[str],
                     seed: int, n_buckets: int = 64) -> DataFrame:
    """Deterministically permute *feature* across rows — within seeded
    hash buckets, so no global sort: rows and values are ranked by two
    different orders inside each bucket and re-paired."""
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in order_cols])
    b = test.withColumn("_pb", F.pmod(h, F.lit(n_buckets)))
    w_row = Window.partitionBy("_pb").orderBy(*[F.col(c) for c in order_cols])
    w_val = Window.partitionBy("_pb").orderBy(h, *[F.col(c) for c in order_cols])
    rows = b.drop(feature).withColumn("_pr", F.row_number().over(w_row))
    vals = b.select("_pb", F.col(feature), h.alias("_h"), *order_cols).withColumn(
        "_pr", F.row_number().over(
            Window.partitionBy("_pb").orderBy("_h", *order_cols)
        )
    ).select("_pb", "_pr", feature)
    return rows.join(vals, on=["_pb", "_pr"], how="inner").drop("_pb", "_pr")


def reduce_features(
    feat_df: DataFrame,
    features: Sequence[str],
    target_col: str,
    order_cols: Sequence[str],
    n_trees: int = 30,
    max_depth: int = 8,
    test_frac: float = 0.25,
    seed: int = 42,
    importance: str = "permutation",
) -> tuple[list[str], list[str], dict]:
    """Feature reduction vs a random benchmark
    (randomforest_ts.py:345-398): add a seeded ``.RANDOM`` noise
    feature, fit, compute importances, reject every feature whose
    importance is <= the random feature's.

    Returns (accepted, rejected, importances dict incl. '.RANDOM').

    ``importance='permutation'`` re-predicts the test split once per
    feature with that column permuted (reference parity; cost scales
    with n_features x |test|).  ``importance='impurity'`` uses the
    forest's impurity importances — no extra passes, the default
    choice at 100 TB scale.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor

    random_col = "feat_RANDOM"
    # seeded noise: a pure function of the row key — deterministic
    # across partitionings/retries (rand() is not)
    noise = (
        F.pmod(F.xxhash64(F.lit(seed), *[F.col(c) for c in order_cols]),
               F.lit(1_000_003)).cast("double") / 1_000_003.0
    )
    df = feat_df.withColumn(random_col, noise)
    feats = list(features) + [random_col]
    observed = df.where(F.col(target_col).isNotNull())
    for c in feats:
        observed = observed.where(F.col(c).isNotNull())
    train, test = observed.randomSplit([1 - test_frac, test_frac], seed=seed)
    asm = VectorAssembler(inputCols=feats, outputCol="_vec_red",
                          handleInvalid="skip")
    rf = RandomForestRegressor(
        featuresCol="_vec_red", labelCol=target_col, predictionCol="_pred_red",
        numTrees=n_trees, maxDepth=max_depth, seed=seed,
    )
    model = rf.fit(asm.transform(train))
    if importance == "impurity":
        imps = dict(zip(feats, (float(x) for x in model.featureImportances)))
    else:
        test = test.localCheckpoint(eager=True)
        base = regression_scores(
            model.transform(asm.transform(test)), target_col, "_pred_red"
        )["r2"]
        imps = {}
        for i, fcol in enumerate(feats):
            perm = _permuted_column(test, fcol, order_cols, seed + 1 + i)
            r2 = regression_scores(
                model.transform(asm.transform(perm)), target_col, "_pred_red"
            )["r2"]
            imps[fcol] = base - r2
    thresh = imps[random_col]
    accepted = [f for f in features if imps[f] > thresh]
    rejected = [f for f in features if imps[f] <= thresh]
    return accepted, rejected, imps


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
    feature_reduction: bool = False,
    importance: str = "permutation",
    model: str = "rf",
) -> tuple[DataFrame, dict]:
    """Gap-fill *target_col*; returns (df + ``<target>_gfRF`` +
    ``<target>_gfRF_flag``, scores dict).  With ``feature_reduction``
    the full model keeps only features beating the seeded random
    benchmark (reference randomforest_ts.py:345-398).

    ``model='gbt'`` swaps the forest for Spark ML's gradient-boosted
    trees — the distributed analog of the reference's unreleased
    XGBoostTS (gapfilling/__future__/xgboost_ts.py: same feature
    matrix, boosted ensemble instead of bagged; n_trees becomes
    maxIter).  Everything else (features, fallback model, flags,
    score battery) is identical."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

    if model not in ("rf", "gbt"):
        raise ValueError(f"model must be 'rf' or 'gbt', got {model!r}")

    feat_df, full_feats, fb_feats = build_features(
        df, target_col, axis_col, key_cols, lags, cycle
    )
    feat_df = feat_df.localCheckpoint(eager=True)

    reduction: dict = {}
    if feature_reduction:
        accepted, rejected, imps = reduce_features(
            feat_df, full_feats, target_col,
            order_cols=list(key_cols) + [axis_col],
            n_trees=n_trees, max_depth=max_depth,
            test_frac=test_frac, seed=seed, importance=importance,
        )
        # the fallback feature set always stays available (flag-2 path)
        full_feats = accepted or fb_feats
        reduction = {
            "accepted_features": accepted,
            "rejected_features": rejected,
            "importances": imps,
        }

    def fit_predict(features: list[str], name: str):
        asm = VectorAssembler(
            inputCols=features, outputCol=f"_vec_{name}", handleInvalid="skip"
        )
        observed = feat_df.where(F.col(target_col).isNotNull())
        for c in features:
            observed = observed.where(F.col(c).isNotNull())
        train, test = observed.randomSplit([1 - test_frac, test_frac], seed=seed)
        if model == "gbt":
            reg = GBTRegressor(
                featuresCol=f"_vec_{name}", labelCol=target_col,
                predictionCol=f"_pred_{name}", maxIter=n_trees,
                maxDepth=max_depth, seed=seed,
            )
        else:
            reg = RandomForestRegressor(
                featuresCol=f"_vec_{name}", labelCol=target_col,
                predictionCol=f"_pred_{name}", numTrees=n_trees,
                maxDepth=max_depth, seed=seed,
            )
        fitted = reg.fit(asm.transform(train))
        test_pred = fitted.transform(asm.transform(test))
        scores = regression_scores(test_pred, target_col, f"_pred_{name}")
        pred_all = fitted.transform(asm.transform(feat_df))
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
    report = {"full_model": full_scores, "fallback_model": fb_scores}
    if reduction:
        report["feature_reduction"] = reduction
    return out, report


def optimize_rf_params(
    df: DataFrame,
    target_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
    lags: Sequence[int] = (1, 2, 3),
    cycle: int | None = 64,
    num_trees_grid: Sequence[int] = (10, 30),
    max_depth_grid: Sequence[int] = (4, 8),
    n_folds: int = 3,
    seed: int = 42,
) -> dict:
    """OptimizeParamsRFTS analog (randomforest_ts.py:42-160): grid-
    search RF hyperparameters with k-fold cross-validation, RMSE
    scoring.  Spark ML CrossValidator trains all grid cells on the
    cluster (parallelism = grid size); the reference's GridSearchCV +
    TimeSeriesSplit becomes CrossValidator + ParamGridBuilder.

    Returns {"best_params", "best_rmse", "cv_results" (list per cell)}.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    feat_df, full_feats, _fb = build_features(
        df, target_col, axis_col, key_cols, lags, cycle
    )
    observed = feat_df.where(F.col(target_col).isNotNull())
    for c in full_feats:
        observed = observed.where(F.col(c).isNotNull())
    asm = VectorAssembler(inputCols=full_feats, outputCol="_vec",
                          handleInvalid="skip")
    rf = RandomForestRegressor(featuresCol="_vec", labelCol=target_col,
                               predictionCol="_pred", seed=seed)
    grid = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, list(num_trees_grid))
        .addGrid(rf.maxDepth, list(max_depth_grid))
        .build()
    )
    ev = RegressionEvaluator(labelCol=target_col, predictionCol="_pred",
                             metricName="rmse")
    cv = CrossValidator(
        estimator=Pipeline(stages=[asm, rf]), estimatorParamMaps=grid,
        evaluator=ev, numFolds=n_folds, seed=seed,
        parallelism=max(1, len(grid)),
    )
    model = cv.fit(observed)
    cells = [
        {
            "numTrees": pm[rf.numTrees],
            "maxDepth": pm[rf.maxDepth],
            "rmse": m,
        }
        for pm, m in zip(grid, model.avgMetrics)
    ]
    best = min(cells, key=lambda c: c["rmse"])
    return {
        "best_params": {"numTrees": best["numTrees"], "maxDepth": best["maxDepth"]},
        "best_rmse": best["rmse"],
        "cv_results": cells,
    }


def quick_rf_fill(
    df: DataFrame,
    target_col: str = "value",
    axis_col: str = "pos",
    key_cols: Sequence[str] = KEY_COLS,
) -> tuple[DataFrame, dict]:
    """QuickFillRFTS (randomforest_ts.py:901-935): preliminary one-call
    gap fill with the reference's canned parameters — 1-step lag
    features, timestamp features on, a 20-tree forest — no tuning, no
    feature reduction."""
    return rf_gapfill(
        df, target_col=target_col, axis_col=axis_col, key_cols=key_cols,
        lags=(1,), cycle=64, n_trees=20, max_depth=8,
        feature_reduction=False,
    )
