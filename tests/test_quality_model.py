"""Learned quality classifier: separability on planted data, scoring
schema/scale contract, and the no-Python-in-plan property (feature
build + LR transform are all JVM expressions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.quality_model import (
    FEATURE_COLS,
    filter_by_quality,
    fit_quality_classifier,
    score_quality,
)


def _clean_doc(i: int) -> str:
    return (
        f"The quick study number {i} describes how rivers shape the "
        "landscape over time and why the process matters for the people "
        "who live along the banks of these old waterways."
    )


def _spam_doc(i: int) -> str:
    return (
        f"buy buy buy {i} !!! $$$ 0123456789 " * 6
        + "click click click\n" * 4
    )


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, _clean_doc(i), 1.0) for i in range(40)] + [
        (100 + i, _spam_doc(i), 0.0) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def model(labeled):
    return fit_quality_classifier(labeled, "text", "label")


def test_separates_held_out_docs(spark, model):
    held = spark.createDataFrame(
        [(1, _clean_doc(999)), (2, _spam_doc(999))], "doc_id long, text string"
    )
    got = score_quality(held, model, "text").toPandas().set_index("doc_id")
    assert got.loc[1, "quality_prob"] > 0.9
    assert got.loc[2, "quality_prob"] < 0.1


def test_scoring_schema_and_bounds(spark, labeled, model):
    out = score_quality(labeled.drop("label"), model, "text")
    # original columns + exactly one new column, no helper leakage
    assert set(out.columns) == {"doc_id", "text", "quality_prob"}
    probs = [r.quality_prob for r in out.collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_filter_gate(spark, labeled, model):
    kept = filter_by_quality(labeled, model, "text", min_prob=0.5)
    ids = {r.doc_id for r in kept.collect()}
    assert all(i < 100 for i in ids)  # every survivor is a clean doc
    assert len(ids) == 40


def test_scoring_plan_is_jvm_only(spark, labeled, model):
    """Feature build is native expressions and the LR transform is a
    JVM UDF-free projection: the scoring plan must contain no Python
    evaluation node and no exchange (scan-shaped at any scale)."""
    from clustering_spark.plans.audit import count_shuffles, formatted_plan

    out = score_quality(labeled.drop("label"), model, "text")
    p = formatted_plan(out)
    assert "EvalPython" not in p and "InPandas" not in p
    assert count_shuffles(out) == 0


def test_feature_cols_exist(spark, labeled):
    from clustering_spark.operators.quality_model import _with_features

    cols = set(_with_features(labeled, "text").columns)
    missing = [c for c in FEATURE_COLS if c not in cols]
    assert not missing, f"feature builder lost columns: {missing}"


def test_null_text_scores_as_empty_not_crash(spark, model):
    df = spark.createDataFrame(
        [(1, _clean_doc(5)), (2, None)], "doc_id long, text string"
    )
    out = score_quality(df, model, "text").toPandas().set_index("doc_id")
    assert set(out.columns) == {"text", "quality_prob"}
    assert 0.0 <= out.loc[2, "quality_prob"] <= 1.0
    assert out.loc[1, "quality_prob"] > out.loc[2, "quality_prob"]


def test_rescoring_replaces_column(spark, labeled, model):
    once = score_quality(labeled.drop("label"), model, "text")
    twice = score_quality(once, model, "text")
    assert twice.columns.count("quality_prob") == 1
    # re-scoring with the same model gives the same probabilities
    a = {r.doc_id: r.quality_prob for r in once.collect()}
    b = {r.doc_id: r.quality_prob for r in twice.collect()}
    assert a == b


def test_score_preserves_caller_feature_named_columns(spark, labeled, model):
    """A caller column named like a model feature (n_tokens computed
    over ANOTHER text column) must come back untouched."""
    tagged = labeled.drop("label").withColumn("n_tokens", F.lit(-7))
    out = score_quality(tagged, model, "text").toPandas()
    assert (out.n_tokens == -7).all()
    assert "quality_prob" in out.columns


def test_export_linear_parity_with_mllib_transform(spark, labeled, model):
    """export_linear_model + score_quality_linear must reproduce the
    MLlib PipelineModel's probabilities exactly (same standardization,
    same coefficients, zero-std features dropping out) — the flattened
    scorer is a drop-in for the JVM model object."""
    from clustering_spark.operators.quality_model import (
        export_linear_model,
        score_quality_linear,
    )

    params = export_linear_model(model)
    assert params["features"] == FEATURE_COLS
    assert len(params["coefficients"]) == len(FEATURE_COLS)
    ml = score_quality(labeled.drop("label"), model, "text")
    lin = score_quality_linear(labeled.drop("label"), "text", params)
    a = {r.doc_id: r.quality_prob for r in ml.collect()}
    b = {r.doc_id: r.quality_prob for r in lin.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) <= 1e-9 for k in a)


def test_linear_scoring_plan_is_jvm_only_no_shuffle(spark, labeled, model):
    """The flattened scorer must keep score_quality's plan contract:
    whole-stage-codegen projection, no Python nodes, no exchange."""
    from clustering_spark.plans.audit import count_shuffles, formatted_plan

    from clustering_spark.operators.quality_model import (
        export_linear_model,
        score_quality_linear,
    )

    out = score_quality_linear(
        labeled.drop("label"), "text", export_linear_model(model),
        logit_col="z",
    )
    p = formatted_plan(out)
    assert "EvalPython" not in p and "InPandas" not in p
    assert count_shuffles(out) == 0


def test_pinned_gate_model_logit_vs_prob_consistency(spark):
    """The committed PINNED_QUALITY_MODEL must behave like a real
    classifier on the gate corpus shape: logit sign == (prob >= 0.5),
    both output columns present, caller columns preserved."""
    from clustering_spark.operators.quality_model import (
        score_quality_linear,
    )
    from clustering_spark.queries import PINNED_QUALITY_MODEL

    df = spark.createDataFrame(
        [(i, _clean_doc(i)) for i in range(10)]
        + [(100 + i, _spam_doc(i)) for i in range(10)],
        "doc_id long, text string",
    )
    out = score_quality_linear(
        df, "text", PINNED_QUALITY_MODEL,
        logit_col="z", feature_decimals=6,
    ).toPandas()
    assert set(out.columns) == {"doc_id", "text", "quality_prob", "z"}
    assert ((out.z >= 0) == (out.quality_prob >= 0.5)).all()


def test_exported_model_length_mismatch_raises(spark):
    """Round-16 review: zip() over a drifted export silently dropped
    trailing terms from the logit — mismatched list lengths must fail
    at call time."""
    import pytest

    from clustering_spark.operators.quality_model import (
        score_quality_linear,
    )

    params = {
        "intercept": 0.1,
        "features": ["n_tokens", "mean_token_len"],
        "coefficients": [0.5],  # one short
        "means": [10.0, 4.0],
        "stds": [2.0, 1.0],
    }
    df = spark.createDataFrame([(1, "some text here")], "id long, text string")
    with pytest.raises(ValueError, match="disagree in length"):
        score_quality_linear(df, "text", params)
