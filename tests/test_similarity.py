"""knn_join's partition-local top-k kernel: exactness against a
brute-force reference, including ties, zero-norm vectors, and inputs
split over many partitions (exercising the partial merge)."""

from __future__ import annotations

import numpy as np
import pytest

from clustering_spark.operators.similarity import knn_join


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(200):
        v = rng.uniform(-1, 1, 8)
        rows.append((i, [float(x) for x in v]))
    # duplicate vectors -> exact cosine ties, broken by id
    rows.append((900, list(rows[5][1])))
    rows.append((901, list(rows[5][1])))
    # zero-norm vector -> NULL cosine, ranks last
    rows.append((950, [0.0] * 8))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(16)


def test_knn_matches_bruteforce_with_ties_and_zero(spark, corpus):
    q = corpus.filter("vec_id IN (3, 5)").select(
        (corpus.vec_id + 1000).alias("qid"), corpus.embedding.alias("qvec")
    )
    got = knn_join(corpus, q, "embedding", "vec_id", "qvec", "qid", k=6)
    res = {
        (r.query_id, r.rank): (r.corpus_id, r.cosine) for r in got.collect()
    }

    pdf = corpus.toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.vstack(pdf.embedding.to_numpy())
    vn = np.linalg.norm(V, axis=1)
    for qid_src in (3, 5):
        qv = V[ids == qid_src][0]
        qn = np.linalg.norm(qv)
        cos = np.where(
            vn > 0, (V @ qv) / np.where(vn > 0, vn, 1.0) / qn, np.nan
        )
        cos_r = np.where(
            cos >= 0, np.floor(cos * 1e6 + 0.5), np.ceil(cos * 1e6 - 0.5)
        ) / 1e6
        # NaN (zero-norm) ranks last; ties by id asc
        order = sorted(
            range(len(ids)),
            key=lambda i: (np.isnan(cos_r[i]), -cos_r[i] if not np.isnan(cos_r[i]) else 0, ids[i]),
        )[:6]
        for rank, i in enumerate(order, start=1):
            gid, gcos = res[(qid_src + 1000, rank)]
            assert gid == ids[i], (qid_src, rank, gid, ids[i])
            if np.isnan(cos_r[i]):
                assert gcos is None
            else:
                assert abs(gcos - cos_r[i]) < 1e-12

    # the duplicated vectors of doc 5 must appear for query 5 with
    # cosine 1.0, tie-broken by id: 5 < 900 < 901
    top3 = [res[(1005, r)][0] for r in (1, 2, 3)]
    assert top3 == [5, 900, 901]


def test_knn_no_corpus_shuffle(spark, corpus):
    """The corpus must not cross the wire: no joins at all, and the
    only Exchange is the window over the tiny partials."""
    from clustering_spark.plans.audit import join_strategies, plan_tree

    q = corpus.limit(2).select(
        corpus.vec_id.alias("qid"), corpus.embedding.alias("qvec")
    )
    df = knn_join(corpus, q, "embedding", "vec_id", "qvec", "qid", k=3)
    assert join_strategies(df) == []
    assert plan_tree(df).count("Exchange") <= 2  # partials shuffle (+AQE read)


def test_embedding_contamination_flags_planted_copy(spark):
    from clustering_spark.operators.similarity import embedding_contamination

    rng = np.random.RandomState(11)
    M = rng.randn(50, 8)
    train = spark.createDataFrame(
        [(i, [float(v) for v in M[i]]) for i in range(50)],
        "tid long, v array<double>",
    )
    # eval doc 100 = near-copy of train 7 (tiny perturbation);
    # eval doc 101 = fresh random direction
    e0 = M[7] + 0.001 * rng.randn(8)
    e1 = rng.randn(8) * 5
    ev = spark.createDataFrame(
        [(100, [float(v) for v in e0]), (101, [float(v) for v in e1])],
        "eid long, v array<double>",
    )
    hits = embedding_contamination(
        train, ev, "v", "tid", "v", "eid", threshold=0.99
    ).collect()
    assert [(r.eval_id, r.train_id) for r in hits] == [(100, 7)]
    assert hits[0].cosine >= 0.99
    assert hits[0].rank == 1
