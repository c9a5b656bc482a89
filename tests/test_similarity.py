"""knn_join's partition-local top-k kernel: exactness against a
brute-force reference, including ties, zero-norm vectors, and inputs
split over many partitions (exercising the partial merge)."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


class TestIvfRecall:
    """Answer-quality pins for the approximate path: ivf_topk is
    rows-only at the driver gate forever (centroid fit is iterative,
    not SQL), so a cell-assignment regression could degrade recall
    with every other check still green.

    Two regimes, because recall on IVF is a property of DATA GEOMETRY:
    - the sf0.01 embeddings are structureless uniform-ish synthetic
      vectors, where any cell index's recall is bounded near the
      scanned fraction (nprobe/nlist) — a flat >=0.9 pin there would
      really be pinning "scan most of the corpus". Instead we pin what
      a broken assignment would lose: recall meaningfully ABOVE the
      random-scan baseline, and monotone in nprobe up to 1.0 at a
      full probe.
    - a planted-blob corpus is the regime IVF is FOR (real embedding
      spaces cluster); there we pin recall@10 >= 0.9 at nprobe=4 and
      prove the pin has teeth by corrupting the cell column, which
      must collapse recall."""

    @pytest.fixture(scope="class")
    def sf001(self, spark):
        from clustering_spark.operators.similarity import IVFIndex, cosine_topk
        from clustering_spark.queries import QUERY_VEC, load_spread

        e = load_spread(spark, "/root/testdata/sf0.01", "embeddings")
        exact = [
            r.vec_id
            for r in cosine_topk(e, "embedding", QUERY_VEC, "vec_id", k=10).collect()
        ]
        idx = IVFIndex(nlist=16, seed=42).fit(e, "embedding")
        indexed = idx.transform(e, "embedding").localCheckpoint()
        return exact, idx, indexed

    @staticmethod
    def _recall(idx, indexed, exact, nprobe, query, k=10):
        got = [
            r.vec_id
            for r in idx.search(
                indexed, "embedding", "vec_id", query, k=k, nprobe=nprobe
            ).collect()
        ]
        return len(set(got) & set(exact)) / len(exact)

    def test_sf001_beats_random_scan_and_is_monotone(self, sf001):
        from clustering_spark.queries import QUERY_VEC

        exact, idx, indexed = sf001
        r = {
            n: self._recall(idx, indexed, exact, n, QUERY_VEC)
            for n in (1, 4, 8, 16)
        }
        # nprobe=4 scans ~4/16 of the corpus; a broken (random) cell
        # assignment would land recall at ~that fraction. Current
        # geometry gives 0.4; 0.3 is the regression alarm line.
        assert r[4] >= 0.3, f"recall@10 at nprobe=4 fell to {r[4]}"
        assert r[1] <= r[4] <= r[8] <= r[16], f"recall not monotone: {r}"
        # probing every cell IS the exact scan — anything below 1.0
        # means the assignment DROPPED vectors (the worst regression)
        assert r[16] == 1.0, f"full probe lost vectors: recall {r[16]}"

    @pytest.fixture(scope="class")
    def blobs(self, spark):
        """120 Gaussian blobs (20 points each, sigma=0.05) in 32d —
        the clustered geometry real embedding spaces have. The query
        sits at a blob center, so its true top-10 lie inside that
        blob."""
        from clustering_spark.operators.similarity import IVFIndex, cosine_topk

        rng = np.random.RandomState(7)
        centers = rng.standard_normal((120, 32))
        rows = []
        vid = 0
        for c in centers:
            for _ in range(20):
                v = c + 0.05 * rng.standard_normal(32)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(16)
        query = [float(x) for x in centers[3]]
        exact = [
            r.vec_id
            for r in cosine_topk(df, "embedding", query, "vec_id", k=10).collect()
        ]
        idx = IVFIndex(nlist=16, seed=42).fit(df, "embedding")
        indexed = idx.transform(df, "embedding").localCheckpoint()
        return exact, idx, indexed, query

    def test_blob_recall_at_default_nprobe(self, blobs):
        exact, idx, indexed, query = blobs
        assert self._recall(idx, indexed, exact, 4, query) >= 0.9

    def test_pin_has_teeth_corrupted_assignment_collapses_recall(self, blobs):
        """The regression this pin exists for: if cell assignment ever
        stops following the centroid geometry (a kernel bug), recall
        must crater — simulate by rehashing cells pseudo-randomly."""
        from pyspark.sql import functions as F

        exact, idx, indexed, query = blobs
        corrupted = indexed.withColumn(
            "cell", (F.xxhash64("vec_id") % 16).cast("int")
        )
        baseline = self._recall(idx, indexed, exact, 4, query)
        broken = self._recall(idx, corrupted, exact, 4, query)
        assert broken < baseline, (
            f"corrupting cells did not reduce recall ({broken} vs "
            f"{baseline}) — the pin is not measuring cell pruning"
        )
        assert broken <= 0.6, f"corrupted-assignment recall too high: {broken}"


def test_knn_null_vectors_match_relational_form(spark):
    """NULL corpus/query vectors must behave like the relational form
    (NULL cosine, ranked last by corpus_id) — not crash the kernel."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, None),
            (4, [0.0, 0.0]),
        ],
        "cid long, v array<double>",
    )
    qs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, None)], "qid long, qv array<double>"
    )
    got = (
        knn_join(corpus, qs, "v", "cid", "qv", "qid", k=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.corpus_id, r.cosine))
    # real query: scored rows first, then NULL-cosine rows (3: NULL
    # vec, 4: zero norm) by corpus_id
    assert [c for c, _ in by_q[10]] == [1, 2, 3, 4]
    assert by_q[10][0][1] == 1.0
    assert by_q[10][2][1] is None and by_q[10][3][1] is None
    # NULL query: NULL cosine against everything, ranked by corpus_id
    assert [c for c, _ in by_q[11]] == [1, 2, 3, 4]
    assert all(c is None for _, c in by_q[11])


def test_ivf_fit_sample_is_order_independent(spark):
    """fit() must not depend on scan order: the same corpus in two
    different row orders yields identical centroids."""
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(300)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(rows[::-1], "vec_id long, embedding array<double>")
    from clustering_spark.operators.similarity import IVFIndex

    ca = IVFIndex(nlist=4, seed=9).fit(a, "embedding").centroids
    cb = IVFIndex(nlist=4, seed=9).fit(b, "embedding").centroids
    assert np.allclose(ca, cb)


def test_ivf_transform_null_vector_gets_null_cell(spark):
    from clustering_spark.operators.similarity import IVFIndex

    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None), (4, [1.0, 0.1])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    idx = IVFIndex(nlist=2).fit(df, "vec")
    out = idx.transform(df, "vec").toPandas().set_index("id")
    assert pd.isna(out.loc[3, "cell"])
    assert out.loc[[1, 2, 4], "cell"].notna().all()


def test_knn_join_tie_flood_stays_bounded_and_exact(spark):
    # a corpus of identical vectors: every score ties the kth — the
    # margin alone kept the ENTIRE partition in the per-query buffer;
    # the cap reduces exactly, so the result is still the kk smallest
    # ids at cosine 1.0
    n = 2000
    corpus = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(n)], "cid long, vec array<double>"
    ).repartition(2)
    queries = spark.createDataFrame(
        [(100, [1.0, 2.0, 3.0])], "qid long, qvec array<double>"
    )
    out = (
        knn_join(corpus, queries, "vec", "cid", "qvec", "qid", k=3)
        .toPandas()
        .sort_values("rank")
    )
    assert out.corpus_id.tolist() == [0, 1, 2]
    assert (out.cosine == 1.0).all()


def test_knn_join_nonfinite_corpus_vector_ranks_last(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [float("nan"), 1.0]),
            (3, [0.9, 0.1]),
        ],
        "cid long, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(9, [1.0, 0.0])], "qid long, qvec array<double>"
    )
    out = (
        knn_join(corpus, queries, "vec", "cid", "qvec", "qid", k=3)
        .toPandas()
        .sort_values("rank")
    )
    # finite vectors first (by cosine), NaN vector last with NULL cosine
    assert out.corpus_id.tolist() == [1, 3, 2]
    assert pd.isna(out.cosine.iloc[2])


def test_cosine_topk_nonfinite_corpus_vector_ranks_last(spark):
    """Spark orders NaN GREATEST, so an unguarded desc sort put a
    NaN/inf-component corpus row at rank 1, evicting a true neighbor
    — cosine_topk must score non-finite vectors NULL-and-last, the
    same rule knn_join's kernel applies (IVFIndex.search and
    topk_quantized_rerank delegate here and inherit the guard)."""
    from clustering_spark.operators.similarity import cosine_topk

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [float("nan"), 0.0]),
        (4, [float("inf"), 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(df, "embedding", [1.0, 0.0], "vec_id", k=2).toPandas()
    assert out.vec_id.tolist() == [1, 2]
    # and with k covering everything, the garbage rows trail with NULL
    out4 = cosine_topk(df, "embedding", [1.0, 0.0], "vec_id", k=4).toPandas()
    assert out4.vec_id.tolist()[:2] == [1, 2]
    assert out4.cosine.isna().tolist()[2:] == [True, True]
