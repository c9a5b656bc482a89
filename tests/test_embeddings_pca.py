"""Distributed PCA / whitening (operators/embeddings): exact parity
with a driver-side numpy reference, planted-direction recovery,
whitened covariance ≈ identity, partitioning invariance, and the
NULL-vector degrade contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.embeddings import apply_pca, fit_pca


def _planted(spark, n=400, d=8, seed=3):
    rng = np.random.default_rng(seed)
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    x = rng.normal(size=(n, d)) * 0.1 + np.outer(
        rng.normal(size=n) * 3.0, direction
    )
    rows = [(i, x[i].tolist()) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
        direction,
    )


def test_matches_numpy_reference_and_finds_planted_direction(spark):
    df, x, direction = _planted(spark)
    model = fit_pca(df, "embedding", k=3)
    comps = np.asarray(model["components"])
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # top component is the planted direction (up to sign)
    assert abs(float(comps[0] @ direction)) > 0.99
    # exact parity with the centered-covariance eig of the collected data
    cov = np.cov(x.T, ddof=1)
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(model["explained_variance"], ref, rtol=1e-9)
    assert np.allclose(model["mean"], x.mean(axis=0), rtol=0, atol=1e-9)


def test_whitening_yields_identity_covariance(spark):
    df, x, _ = _planted(spark, seed=11)
    model = fit_pca(df, "embedding", k=4, whiten=True)
    out = apply_pca(df, "embedding", model).select("embedding_pca").collect()
    y = np.asarray([r[0] for r in out])
    cov = np.cov(y.T, ddof=1)
    assert np.allclose(cov, np.eye(4), atol=1e-2)


def test_partitioning_invariance(spark):
    df, _, _ = _planted(spark, seed=7)
    a = fit_pca(df, "embedding", k=2)
    b = fit_pca(df.repartition(17), "embedding", k=2)
    assert np.allclose(a["components"], b["components"], atol=1e-8)
    assert np.allclose(a["explained_variance"], b["explained_variance"], rtol=1e-9)


def test_null_and_malformed_vectors_degrade(spark):
    df, _, _ = _planted(spark, n=50)
    dirty = df.unionByName(
        spark.createDataFrame(
            [(1000, None), (1001, [1.0, 2.0]), (1002, [float("nan")] * 8)],
            "vec_id long, embedding array<double>",
        )
    )
    model = fit_pca(dirty, "embedding", k=2)  # dirty rows excluded
    out = (
        apply_pca(dirty, "embedding", model)
        .filter(F.col("vec_id") >= 1000)
        .collect()
    )
    assert all(r["embedding_pca"] is None for r in out)
    clean = fit_pca(df, "embedding", k=2)
    assert np.allclose(model["components"], clean["components"], atol=1e-9)


def test_validation_errors(spark):
    df, _, _ = _planted(spark, n=20)
    with pytest.raises(ValueError, match="outside"):
        fit_pca(df, "embedding", k=9)
    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no valid embeddings"):
        fit_pca(empty, "embedding", k=2)


def test_full_rank_projection_is_isometric_on_testdata(spark):
    """On the real 64-dim embeddings table: a full-rank (k = d)
    projection is an orthogonal transform of the centered data, so
    every pairwise Euclidean distance is preserved exactly — the
    invariant that makes reduced-space neighbor search meaningful at
    all. (Neighbor RECALL under truncation needs low-rank structure,
    which the planted-direction test covers — the synthetic testdata
    embeddings are isotropic by construction.)"""
    from tests.conftest import SF_DIR

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    model = fit_pca(e, "embedding", k=64)
    red = apply_pca(e, "embedding", model).select("vec_id", "embedding_pca")
    full = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in e.collect()}
    proj = {r.vec_id: np.asarray(r.embedding_pca) for r in red.collect()}
    ids = sorted(full)[:12]
    for i in ids:
        for j in ids:
            if i < j:
                want = np.linalg.norm(full[i] - full[j])
                got = np.linalg.norm(proj[i] - proj[j])
                assert abs(want - got) < 1e-6, (i, j)
