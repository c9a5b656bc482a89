"""Learned quality classifier — the fasttext-style quality-filter
stage of a training-data pipeline (GPT-3 appendix A / CCNet shape:
label a small curated seed set as positive and a crawl sample as
negative, train a linear classifier, score the whole corpus),
re-expressed on MLlib primitives so both training and scoring are
distributed JVM work.

Features are the engine's own heuristic signals (textops.
quality_features + textnorm.repetition_signals) — native expressions,
computed at scan speed — so the classifier learns a weighting over
interpretable columns instead of opaque n-gram buckets. This keeps the
whole path Python-free: feature build, LR fit (MLlib's distributed
L-BFGS), and scoring (a dot product in whole-stage codegen via the
model transform).

Scale: training input is the labeled SEED set (small by construction —
curated positives + sampled negatives), while scoring streams over the
full corpus with no shuffle at all (transform is a per-row projection)
— the 100 TB pattern: learn tiny, apply wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustering_spark.operators import textnorm, textops

# the interpretable signal set every stage of this module shares
FEATURE_COLS = [
    "n_tokens",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "dup_line_ratio",
    "rep_2gram_ratio",
    "top_token_ratio",
]


_TEXT_TMP = "__qm_text"


def _with_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append the signal columns, computed over a NULL-coalesced copy
    of the text: a NULL document must score like an empty one (all
    ratios 0, n_tokens 0 → low quality), not crash the whole job in
    VectorAssembler's handleInvalid='error' path. The caller's text
    column is untouched; the temp column never leaves score_quality's
    final projection."""
    out = df.withColumn(_TEXT_TMP, F.coalesce(F.col(text_col), F.lit("")))
    out = textops.quality_features(out, _TEXT_TMP)
    out = textnorm.repetition_signals(out, _TEXT_TMP)
    return out


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    max_iter: int = 50,
    reg_param: float = 0.01,
    seed: int = 42,
):
    """Fit a logistic-regression quality model on a labeled seed set
    (label 1 = keep-quality, 0 = reject). Returns the fitted
    ``PipelineModel`` (assembler + LR) — pass it to
    :func:`score_quality`.

    MLlib's LR trains with distributed L-BFGS over the assembled
    feature vector; the seed set is small in practice, but nothing
    here collects to the driver, so an accidentally-huge labeled set
    still trains."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    from clustering_spark.operators.fit_guard import guarded_fit

    feats = _with_features(labeled, text_col)
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="__raw_features"
    )
    scaler = StandardScaler(
        inputCol="__raw_features",
        outputCol="__features",
        withMean=True,
        withStd=True,
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        probabilityCol="__prob",
        rawPredictionCol="__rawpred",
        predictionCol="__pred",
    )
    # guarded like every MLlib fit in this repo: L-BFGS won't LAPACK-spin
    # the way GMM EM does, but a hung fit anywhere must terminate at the
    # driver rather than wedge the job (fit_guard module docstring)
    return guarded_fit(
        Pipeline(stages=[assembler, scaler, lr]), feats, desc="quality LR pipeline"
    )


def score_quality(
    df: DataFrame,
    model,
    text_col: str,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col`` — P(quality=1) — to every document. Pure
    per-row projection (feature expressions + the model's linear
    transform), no shuffle: safe to run over the full corpus at any
    scale. The helper feature/vector columns are dropped from the
    output."""
    from pyspark.ml.functions import vector_to_array

    # score over a POSITIONALLY-RENAMED copy: the feature builders
    # REPLACE same-named columns, so a caller column that happens to
    # share a feature name (e.g. n_tokens computed over a different
    # text column) would otherwise come back silently recomputed in
    # the output — violating the exactly-the-caller's-columns contract
    safe = df.select(
        *[df[c].alias(f"__orig_{i}") for i, c in enumerate(df.columns)]
    )
    feats = _with_features(safe, f"__orig_{df.columns.index(text_col)}")
    scored = model.transform(feats)
    prob = F.round(vector_to_array(F.col("__prob")).getItem(1), 6)
    scored = scored.withColumn(out_col, prob)
    # contract: EXACTLY the caller's columns plus out_col; re-scoring a
    # frame that already has out_col REPLACES it (no duplicate column)
    return scored.select(
        *[
            F.col(f"__orig_{i}").alias(c)
            for i, c in enumerate(df.columns)
            if c != out_col
        ],
        out_col,
    )


def export_linear_model(model) -> dict:
    """Flatten a fitted quality ``PipelineModel`` (assembler + scaler +
    LR) to plain floats: feature names, scaler means/stds, LR
    coefficients, intercept. The exported dict is everything scoring
    needs — ship it as a broadcast-free literal into
    :func:`score_quality_linear` (or pin it in a test/gate), instead of
    dragging the JVM model object around."""
    scaler, lr = model.stages[1], model.stages[2]
    return {
        "features": list(FEATURE_COLS),
        "means": [float(x) for x in scaler.mean.toArray()],
        "stds": [float(x) for x in scaler.std.toArray()],
        "coefficients": [float(x) for x in lr.coefficients.toArray()],
        "intercept": float(lr.intercept),
    }


def score_quality_linear(
    df: DataFrame,
    text_col: str,
    params: dict,
    out_col: str = "quality_prob",
    logit_col: str | None = None,
    feature_decimals: int | None = None,
) -> DataFrame:
    """Score documents with an EXPORTED linear quality model
    (:func:`export_linear_model`) as pure native expressions — the
    same per-row zero-shuffle projection as :func:`score_quality`, but
    with no MLlib transform in the plan at all: the whole path (feature
    build → standardize → dot product → sigmoid) is one whole-stage-
    codegen projection, which is the shape you want wrapping a 100 TB
    scan.

    ``out_col`` gets P(quality=1) rounded to 6 decimals (parity with
    :func:`score_quality`); ``logit_col``, when set, additionally gets
    the RAW linear score — deterministic +,*,/ arithmetic only (no
    exp), which is what a cross-engine oracle should compare.
    ``feature_decimals`` optionally rounds each feature before scoring
    so two engines consume bit-identical inputs. Term order is the
    ``params['features']`` list order, left to right — keep any SQL
    twin in the same order. A zero scaler std contributes 0 (MLlib
    ``StandardScalerModel`` semantics)."""
    lens = {
        k: len(params[k])
        for k in ("features", "coefficients", "means", "stds")
    }
    if len(set(lens.values())) != 1:
        # zip() would silently truncate to the shortest list, dropping
        # trailing terms from the logit and mis-scoring every document
        # with no error (round-16 review) — a drifted or hand-edited
        # export must fail at call time instead
        raise ValueError(f"model export lists disagree in length: {lens}")
    safe = df.select(
        *[df[c].alias(f"__orig_{i}") for i, c in enumerate(df.columns)]
    )
    feats = _with_features(safe, f"__orig_{df.columns.index(text_col)}")
    z = F.lit(params["intercept"])
    for name, w, m, s in zip(
        params["features"],
        params["coefficients"],
        params["means"],
        params["stds"],
    ):
        if s == 0.0:
            continue  # constant feature: scaled value is 0, term drops
        col = F.col(name).cast("double")
        if feature_decimals is not None:
            col = F.round(col, feature_decimals)
        z = z + F.lit(w) * ((col - F.lit(m)) / F.lit(s))
    scored = feats.withColumn("__z", z)
    keep = [
        F.col(f"__orig_{i}").alias(c)
        for i, c in enumerate(df.columns)
        if c not in (out_col, logit_col)
    ]
    out = [F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))), 6).alias(out_col)]
    if logit_col:
        out.append(F.col("__z").alias(logit_col))
    return scored.select(*keep, *out)


def filter_by_quality(
    df: DataFrame,
    model,
    text_col: str,
    min_prob: float = 0.5,
) -> DataFrame:
    """Corpus gate: keep documents the model scores at or above
    ``min_prob``. The filter sits directly on the scoring projection,
    so Catalyst keeps the whole gate inside one scan stage."""
    scored = score_quality(df, model, text_col)
    return scored.filter(F.col("quality_prob") >= min_prob)
