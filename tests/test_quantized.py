"""int8 embedding quantization: value bounds, direction preservation,
approximate-cosine error, and full-recall rerank vs the exact scan on
real testdata embeddings.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import similarity

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return similarity.quantize_embeddings(df, "embedding").cache()


def test_quantized_dtype_and_bounds(spark, emb):
    assert dict(emb.dtypes)["qvec"] == "array<tinyint>"
    row = emb.select(
        F.array_max("qvec").alias("mx"), F.array_min("qvec").alias("mn")
    ).agg(F.max("mx").alias("mx"), F.min("mn").alias("mn")).collect()[0]
    assert row.mx <= 127 and row.mn >= -127


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 4.0, 0.0])],
        "id long, embedding array<double>",
    )
    out = {r.id: r.qvec for r in
           similarity.quantize_embeddings(df, "embedding").collect()}
    assert out[1] == [0, 0, 0]
    assert out[2] == [76, 102, 0]  # round(127*[0.6, 0.8, 0])


def test_approx_cosine_close_to_exact(spark, emb):
    """Quantization error on cosine is bounded: for d=64 dims the
    int8-normalized dot deviates from true cosine by << 0.02."""
    pdf = emb.select("embedding", "qvec").limit(200).toPandas()
    V = np.vstack(pdf.embedding.to_numpy()).astype(np.float64)
    Q = np.vstack(pdf.qvec.to_numpy()).astype(np.float64)
    q = V[0] / np.linalg.norm(V[0])
    qq = np.round(q * 127.0)
    exact = (V / np.linalg.norm(V, axis=1, keepdims=True)) @ q
    approx = (Q @ qq) / (np.linalg.norm(Q, axis=1) * np.linalg.norm(qq))
    assert np.abs(exact - approx).max() < 0.02


def test_rerank_matches_exact_topk(spark, emb):
    """With a healthy rerank factor the two-stage search returns the
    EXACT top-k (ids and cosines) on the real embeddings table."""
    query = [float(np.sin(i * 0.7)) for i in range(64)]
    exact = similarity.cosine_topk(emb, "embedding", query, "vec_id", k=10).collect()
    fast = similarity.topk_quantized_rerank(
        emb, "embedding", "qvec", query, "vec_id", k=10, rerank_factor=4
    ).collect()
    assert [(r.vec_id, r.cosine) for r in exact] == [
        (r.vec_id, r.cosine) for r in fast
    ]


def test_zero_query_raises(spark, emb):
    with pytest.raises(ValueError, match="zero-norm"):
        similarity.topk_quantized_rerank(
            emb, "embedding", "qvec", [0.0] * 64, "vec_id"
        )


def test_ivf_quantized_matches_ivf_exact(spark, emb):
    """IVF + SQ8: same probed cells, quantized scoring + rerank must
    return the same top-k as the exact IVF scan."""
    query = [float(np.sin(i * 0.7)) for i in range(64)]
    idx = similarity.IVFIndex(nlist=8, seed=42).fit(emb, "embedding")
    indexed = idx.transform(emb, "embedding").cache()
    exact = idx.search(indexed, "embedding", "vec_id", query, k=10, nprobe=4)
    fast = idx.search(
        indexed, "embedding", "vec_id", query, k=10, nprobe=4,
        qvec_col="qvec", rerank_factor=4,
    )
    assert [(r.vec_id, r.cosine) for r in exact.collect()] == [
        (r.vec_id, r.cosine) for r in fast.collect()
    ]


def test_query_quantization_half_up_matches_corpus_rule():
    """The query must quantize with the SAME tie rule as the corpus's
    Spark-side F.round (HALF_UP): np.round is banker's half-even and
    diverges on exact .5 components, asymmetrically biasing approx
    scores near the rerank candidate cut."""
    import numpy as np

    from clustering_spark.functions.rounding import np_round_half_up_int

    x = np.array([62.5, 63.5, -62.5, 2.5])
    assert np_round_half_up_int(x).tolist() == [63.0, 64.0, -63.0, 3.0]
    # np.round would give [62, 64, -62, 2] — the divergence under test
    assert np.round(x).tolist() == [62.0, 64.0, -62.0, 2.0]
