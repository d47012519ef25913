"""Trainable quality classifier for corpus filtering (target-side; the
reference has no corpus tooling — this is the fasttext/LR quality-filter
stage every pre-training pipeline runs, here as Spark ML so training and
scoring are both distributed).

Self-supervised weak labels (CCNet-style): the unigram-logprob fluency
proxy marks the most-fluent quantile positive and the least-fluent
quantile negative; a logistic regression then learns to predict that
verdict from cheap surface features (length/punctuation/stopword/
repetition ratios) and scores EVERY doc — including the unlabeled middle
— with a calibrated probability.  The point of the model over the raw
proxy: the proxy needs a corpus-wide vocabulary join per scoring run,
the trained model is a dot product over per-doc column expressions.

Scale shape: feature engineering is pure column expressions (zero UDFs,
zero shuffles); label quantiles are one broadcast percentile row;
LogisticRegression is Spark ML's distributed L-BFGS (tree-aggregated
gradients); scoring is a map-only transform.  Nothing in the path
collects rows to the driver except the fitted coefficient vector.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_COLS = [
    "n_words",
    "mean_word_len",
    "punct_ratio",
    "upper_ratio",
    "digit_ratio",
    "stopword_ratio",
    "dup_line_frac",
    "dup_ngram_frac_2",
    "top_bigram_frac",
    "type_token_ratio",
]


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Surface quality features (textstats.quality_score +
    Gopher repetition signals) — pure column expressions."""
    from .textstats import quality_score, repetition_features

    out = repetition_features(quality_score(df, text_col=text_col),
                              text_col=text_col)
    # type-token ratio (unique-word fraction): rare-token spam and
    # boilerplate loops sit at the extremes — a Gopher-family signal
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ttr = F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1))
    out = out.withColumn("type_token_ratio", ttr)
    # log-compress the unbounded length feature so L-BFGS sees a sane
    # scale; everything else is already a ratio in [0, 1]
    return out.withColumn("n_words", F.log1p(F.col("n_words")))


def weak_labels(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pos_quantile: float = 0.85,
    neg_quantile: float = 0.15,
    score_col: str = "unigram_logprob",
) -> DataFrame:
    """Self-supervised labels from the fluency proxy: label 1 above the
    ``pos_quantile`` cut, 0 below the ``neg_quantile`` cut, NULL (and
    excluded from training) in between."""
    from .textstats import unigram_logprob_score

    scored = unigram_logprob_score(df, text_col=text_col, id_col=id_col)
    cuts = scored.agg(
        F.percentile(F.col(score_col),
                     F.array(F.lit(neg_quantile), F.lit(pos_quantile))
                     ).alias("_cuts")
    )
    s = F.col(score_col)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "label",
            F.when(s >= F.col("_cuts")[1], F.lit(1.0))
            .when(s <= F.col("_cuts")[0], F.lit(0.0))
            .otherwise(F.lit(None).cast("double")),
        )
        .drop("_cuts")
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the LR quality model on weak-labeled docs.  Returns
    (model, auc) where auc is evaluated on a deterministic 20% holdout
    (hash_split on ``id_col`` — frozen across runs/partitionings)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    from .scrub import hash_split

    labeled = weak_labels(featurize(df, text_col=text_col),
                          text_col=text_col, id_col=id_col)
    labeled = labeled.where(F.col("label").isNotNull())
    labeled = hash_split(labeled, {"fit": 0.8, "holdout": 0.2},
                         key_col=id_col, seed=11)
    asm = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features",
                          handleInvalid="keep")
    fit_df = asm.transform(labeled.where(F.col("split") == "fit"))
    hold_df = asm.transform(labeled.where(F.col("split") == "holdout"))
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=reg_param, maxIter=max_iter, standardization=True,
    )
    model = lr.fit(fit_df)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(model.transform(hold_df))
    return model, auc


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score every doc with the fitted model: adds ``quality_prob``
    (P(high quality)) and ``quality_pred`` (prob >= threshold).
    Map-only: featurize -> assemble -> dot product."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    asm = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features",
                          handleInvalid="keep")
    scored = model.transform(asm.transform(featurize(df, text_col=text_col)))
    return (
        scored.withColumn(out_col, vector_to_array("probability")[1])
        .withColumn("quality_pred",
                    (F.col(out_col) >= threshold).cast("int"))
        .drop("features", "rawPrediction", "probability", "prediction")
    )
