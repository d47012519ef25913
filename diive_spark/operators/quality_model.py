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

from ..plans.barrier import no_pushdown_filter

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


def binned_auc(
    scored: DataFrame,
    label_col: str = "label",
    prob_col: str = "quality_prob",
    bins: int = 10000,
) -> float:
    """Area under the ROC curve via probability-binned trapezoids: one
    hash aggregate over (bin, label) counts, the cumulative sweep over
    the <=``bins`` bin rows on the driver.  Chosen over
    ``BinaryClassificationEvaluator`` deliberately — the evaluator
    serializes the model's training summary (which drags the
    unserializable SparkSession/ObservationManager into an RDD task
    closure once any ``observe()`` has run in the session), and its
    RDD path sorts every (score, label) pair; binned counts shuffle
    ``bins`` rows regardless of corpus size and are exactly
    reproducible under any partitioning."""
    b = F.least(
        F.floor(F.col(prob_col) * bins).cast("long"), F.lit(bins - 1)
    )
    counts = (
        scored.groupBy(b.alias("_bin"))
        .agg(
            F.sum(F.col(label_col)).alias("_pos"),
            F.sum(F.lit(1.0) - F.col(label_col)).alias("_neg"),
        )
        .orderBy(F.col("_bin").desc())
        .toPandas()
    )
    tot_pos, tot_neg = counts["_pos"].sum(), counts["_neg"].sum()
    if tot_pos == 0 or tot_neg == 0:
        return float("nan")
    auc, tpr_prev, fpr_prev, cp, cn = 0.0, 0.0, 0.0, 0.0, 0.0
    for _, row in counts.iterrows():
        cp += row["_pos"]
        cn += row["_neg"]
        tpr, fpr = cp / tot_pos, cn / tot_neg
        auc += (fpr - fpr_prev) * (tpr + tpr_prev) / 2.0
        tpr_prev, fpr_prev = tpr, fpr
    return float(auc)


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
    from pyspark.ml.feature import VectorAssembler

    from .scrub import hash_split

    labeled = weak_labels(featurize(df, text_col=text_col),
                          text_col=text_col, id_col=id_col)
    # barrier: label is a when-chain over the text-feature battery;
    # plain where() would inline that battery into a pushed-down Filter
    # and re-evaluate it per doc (plans/barrier.py)
    labeled = no_pushdown_filter(labeled, F.col("label").isNotNull())
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
    hold_scored = hold_df.withColumn("quality_prob", _sigmoid_expr(model))
    auc = binned_auc(hold_scored)
    return model, auc


def _sigmoid_expr(model):
    """P(label=1) as a pure column expression from the fitted linear
    model: sigmoid(w·x + b) over FEATURE_COLS.  Used instead of
    ``model.transform`` everywhere: the transform closure serializes
    the model WITH its training summary, which references the
    unserializable SparkSession/ObservationManager once any
    ``observe()`` has run in the session — and a dot product of column
    expressions stays in whole-stage codegen anyway (no predict UDF)."""
    w = model.coefficients.toArray().tolist()
    z = F.lit(float(model.intercept))
    for coef, col_name in zip(w, FEATURE_COLS):
        z = z + F.lit(float(coef)) * F.col(col_name)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score every doc with the fitted model: adds ``quality_prob``
    (P(high quality)) and ``quality_pred`` (prob >= threshold).
    Map-only: featurize -> sigmoid dot-product column expression
    (see ``_sigmoid_expr`` — no predict UDF, no model in any task
    closure)."""
    scored = featurize(df, text_col=text_col).withColumn(
        out_col, _sigmoid_expr(model)
    )
    return scored.withColumn(
        "quality_pred", (F.col(out_col) >= threshold).cast("int")
    )
