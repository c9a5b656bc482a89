"""Embedding-space preprocessing: distributed PCA fit + projection /
whitening apply (beyond-reference scope — the dimension-reduction
stage semantic dedup / ANN pipelines run before their index).

The learn-tiny / apply-wide decomposition, same doctrine as the BPE
trainer and the quality model: PCA needs only the SUFFICIENT
STATISTICS (n, Σx, Σxxᵀ), so the fit is ONE Arrow-batched partial
aggregation — each task reduces its partition to a single
(n, d, d×d) row with a numpy GEMM (X.T @ X — BLAS, not Python
loops), the driver sums the per-partition rows (bounded: one row per
partition) and eigendecomposes the d×d covariance (d is the embedding
width, e.g. 64-1024 — trivially driver-sized even though n is 100 TB).
Application broadcasts the (k, d) projection into an Arrow kernel:
y = W (x - μ), one GEMM per batch.

NULL-vector contract (shared with the dedup/similarity kernels):
NULL / wrong-length embeddings are excluded from the fit and project
to NULL — never a crash, never a silent zero-vector.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_matrix(series: pd.Series, dim: int | None):
    """Stack the valid embeddings of an Arrow batch into (m, d);
    returns (matrix, valid_row_mask, dim). Rows that are NULL or
    disagree with the batch's dimension are masked out."""
    vecs = []
    mask = []
    for v in series:
        if v is None or (hasattr(v, "__len__") and len(v) == 0):
            mask.append(False)
            continue
        a = np.asarray(v, dtype=np.float64)
        if dim is None:
            dim = a.shape[0]
        if a.shape[0] != dim or not np.isfinite(a).all():
            mask.append(False)
            continue
        vecs.append(a)
        mask.append(True)
    mat = np.vstack(vecs) if vecs else np.zeros((0, dim or 0))
    return mat, np.asarray(mask, dtype=bool), dim


def fit_pca(
    df: DataFrame,
    vec_col: str,
    k: int,
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """Fit PCA over an ``array<float|double>`` column. Returns a plain
    dict — ``{"mean", "components" (k, d), "explained_variance",
    "whiten", "eps"}`` — broadcastable, picklable, and the input to
    :func:`apply_pca`.

    One Spark job: partitions reduce to (n, Σx, Σxxᵀ) rows; the
    driver combines and eigendecomposes. Component SIGNS are
    canonicalized (largest-|coefficient| entry made positive) so the
    model is deterministic across partition layouts up to float
    summation noise."""
    stats_schema = "n long, d int, s array<double>, g array<double>"

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-DIMENSION accumulators: which length is "the" corpus
        # dimension cannot be decided inside one partition (a stray
        # wrong-length row could land first and hijack the partition),
        # so every observed length gets its own (n, Σx, Σxxᵀ) and the
        # driver keeps the majority dimension
        acc: dict[int, list] = {}
        for pdf in it:
            by_dim: dict[int, list[np.ndarray]] = {}
            for v in pdf[vec_col]:
                if v is None or (hasattr(v, "__len__") and len(v) == 0):
                    continue
                a = np.asarray(v, dtype=np.float64)
                if not np.isfinite(a).all():
                    continue
                by_dim.setdefault(a.shape[0], []).append(a)
            for dim, vecs in by_dim.items():
                mat = np.vstack(vecs)
                slot = acc.setdefault(
                    dim, [0, np.zeros(dim), np.zeros((dim, dim))]
                )
                slot[0] += mat.shape[0]
                slot[1] += mat.sum(axis=0)
                slot[2] += mat.T @ mat
        if acc:
            yield pd.DataFrame(
                {
                    "n": [slot[0] for slot in acc.values()],
                    "d": list(acc.keys()),
                    "s": [slot[1].tolist() for slot in acc.values()],
                    "g": [
                        slot[2].reshape(-1).tolist() for slot in acc.values()
                    ],
                }
            )

    rows = df.select(vec_col).mapInPandas(partial, stats_schema).collect()
    if not rows:
        raise ValueError("fit_pca: no valid embeddings to fit on")
    # the corpus dimension = the one carrying the most valid rows
    # (deterministic tiebreak on the larger d); minority lengths are
    # malformed rows, excluded like NULLs
    n_by_dim: dict[int, int] = {}
    for r in rows:
        n_by_dim[r["d"]] = n_by_dim.get(r["d"], 0) + r["n"]
    d = max(n_by_dim, key=lambda dd: (n_by_dim[dd], dd))
    rows = [r for r in rows if r["d"] == d]
    if not (1 <= k <= d):
        raise ValueError(f"fit_pca: k={k} outside [1, {d}]")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    denom = max(n - 1, 1)
    cov = (g - n * np.outer(mean, mean)) / denom
    # symmetrize before eigh: g accumulates tiny asymmetry ulps
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    var = np.maximum(evals[order], 0.0)
    # sign canonicalization: deterministic up to summation noise
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": var.tolist(),
        "whiten": bool(whiten),
        "eps": float(eps),
    }


def apply_pca(
    df: DataFrame,
    vec_col: str,
    model: dict,
    out_col: str = "embedding_pca",
) -> DataFrame:
    """Project every embedding: ``y = W (x - μ)`` (scaled by
    ``1/sqrt(var + eps)`` per component when the model whitens) — one
    numpy GEMM per Arrow batch. NULL / wrong-length / non-finite
    embeddings project to NULL."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    if model.get("whiten"):
        scale = 1.0 / np.sqrt(
            np.asarray(model["explained_variance"]) + model.get("eps", 1e-9)
        )
        comps = comps * scale[:, None]
    d = mean.shape[0]
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + (
        f", `{out_col}` array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mat, mask, _ = _clean_matrix(pdf[vec_col], d)
            proj = (mat - mean) @ comps.T if len(mat) else np.zeros((0, comps.shape[0]))
            out: list = []
            j = 0
            for ok in mask:
                if ok:
                    out.append(proj[j].tolist())
                    j += 1
                else:
                    out.append(None)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(batches, schema)


__all__ = ["fit_pca", "apply_pca"]
