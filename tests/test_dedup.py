"""Dedup operator semantics on planted fixtures: exact-key encoding,
MinHash/SimHash near-dup recovery, exact n-gram Jaccard values, and
the no-false-positives property of embedding LSH vs the exact variant.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import dedup
from tests.conftest import SF_DIR

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "the quick brown fox jumps over the lazy cat again and again today"
DOC_C = "completely unrelated text about database query optimization plans"


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, DOC_B), (4, DOC_C)], "id long, text string"
    )


def test_exact_dedup_groups(spark, docs):
    out = dedup.exact_dedup(docs, ["text"], "id").toPandas()
    assert len(out) == 3  # A appears twice -> one group of 2
    assert out.n_copies.sum() == 4
    dup = out[out.n_copies == 2]
    assert len(dup) == 1 and dup.id.iloc[0] == 1  # min-id survivor


def test_exact_dedup_no_concat_ambiguity(spark):
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc"), (3, "a", None), (4, "a", "")],
        "id long, c1 string, c2 string",
    )
    out = dedup.exact_dedup(df, ["c1", "c2"], "id").toPandas()
    # all four rows are distinct contents -> four groups
    assert len(out) == 4


def test_minhash_finds_planted_neardup(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", shingle_words=2, jaccard_threshold=0.5
    ).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (1, 2) in found  # exact dup: jaccard 1.0
    assert (1, 3) in found or (2, 3) in found  # one-word edit
    for a, b in found:
        assert b != 4 and a != 4  # unrelated doc never pairs


def test_minhash_jaccard_exact_for_identical(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, "id", "text", shingle_words=2).toPandas()
    j = pairs.set_index(["id_a", "id_b"]).jaccard
    assert j.loc[(1, 2)] == 1.0


def test_minhash_signature_expr_form_matches_column_form(spark):
    """The single-expr-string signature builder (driver plan-construction
    optimization, round 16) must be arithmetically identical to the
    Column-API form for any in-range hmod input, including empty arrays
    (array_min -> NULL lanes) and the hash-lane count/seed knobs."""
    df = spark.range(200).select(
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 7).cast("int") - 1),
            lambda i: F.pmod(
                F.xxhash64(F.col("id") * 13 + i.cast("long")), F.lit(dedup._P)
            ),
        ).alias("hm")
    )
    for nh, seed in ((64, 42), (16, 7)):
        a = df.select(
            dedup.minhash_signature_from_hashes("hm", nh, seed).alias("s")
        ).collect()
        b = df.select(
            dedup.minhash_signature_from_hashes(F.col("hm"), nh, seed).alias("s")
        ).collect()
        assert [r["s"] for r in a] == [r["s"] for r in b]


def test_simhash_identical_docs_hamming_zero(spark, docs):
    pairs = dedup.simhash_pairs(docs, "id", "text", max_hamming=3).toPandas()
    h = pairs.set_index(["id_a", "id_b"]).hamming
    assert h.loc[(1, 2)] == 0
    assert len(h) == 1  # nothing else within 3 bits on 13-word docs


def test_simhash_near_dup_on_long_doc(spark):
    # a one-word edit on a LONG doc flips few signature bits — the
    # regime the h<=3 pigeonhole join is designed for (short docs are
    # inherently noisy: each shingle carries ~1/n of the vote mass)
    words = [f"w{i % 97}x{i % 31}" for i in range(400)]
    long_a = " ".join(words)
    words[200] = "CHANGED"
    long_b = " ".join(words)
    df = spark.createDataFrame(
        [(1, long_a), (2, long_b), (3, DOC_C)], "id long, text string"
    )
    pairs = dedup.simhash_pairs(df, "id", "text", max_hamming=3).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (1, 2) in found
    assert not any(3 in p for p in found)


def test_simhash_signature_deterministic(spark):
    df = spark.createDataFrame([(1, DOC_A)], "id long, text string")
    s1 = df.select(dedup.simhash64("text").alias("s")).collect()[0].s
    s2 = df.select(dedup.simhash64("text").alias("s")).collect()[0].s
    assert s1 == s2
    assert isinstance(s1, int)


def python_char_jaccard(a: str, b: str, n: int = 5) -> float:
    import re

    na = re.sub(r"\s+", " ", a.strip().lower())
    nb = re.sub(r"\s+", " ", b.strip().lower())
    sa = {na[i : i + n] for i in range(len(na) - n + 1)} or {na}
    sb = {nb[i : i + n] for i in range(len(nb) - n + 1)} or {nb}
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_matches_python(spark, docs):
    # no stop-shingle pruning (max_shingle_df=1.0) -> exact jaccard
    pairs = dedup.ngram_jaccard_pairs(
        docs, "id", "text", n=5, jaccard_threshold=0.3, max_shingle_df=1.0
    ).toPandas()
    j = pairs.set_index(["id_a", "id_b"]).jaccard
    expect_ab = python_char_jaccard(DOC_A, DOC_B)
    assert abs(j.loc[(1, 3)] - round(expect_ab, 6)) < 1e-9
    assert j.loc[(1, 2)] == 1.0


def test_ngram_dense_overflow_falls_through_to_prefix_join(spark, docs):
    """The dense-bitmap kernel is capped at allpairs_max_docs; above
    the cap the operator must fall through to the bucketed prefix
    equi-join and return the SAME pairs (the cap is a plan choice,
    never a result change) — this is the regime a 100 TB corpus hits."""
    kw = dict(n=5, jaccard_threshold=0.3, max_shingle_df=1.0)
    dense = dedup.ngram_jaccard_pairs(docs, "id", "text", **kw).toPandas()
    overflow = dedup.ngram_jaccard_pairs(
        docs, "id", "text", n_docs=4, allpairs_max_docs=2, **kw
    ).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, dense[key].values)) == sorted(
        map(tuple, overflow[key].values)
    )
    ja = dense.sort_values(key).jaccard.values
    jb = overflow.sort_values(key).jaccard.values
    assert (abs(ja - jb) < 1e-9).all()


def test_ngram_dense_fused_pack_multipartition(spark):
    """The fused dense probe+pack builds PARTITION-LOCAL vocabularies
    and remaps them on the driver: with docs spread over several
    partitions (different local index orders), pairs and jaccard must
    be identical to the prefix-join path (dense_vocab_max=1 forces
    it)."""
    pool = [f"word{i:02d}" for i in range(12)]
    rows = [
        (i, " ".join(pool[j % 12] for j in range(i, i + 7)))
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "id long, text string").repartition(8)
    kw = dict(n=5, jaccard_threshold=0.2)
    dense = dedup.ngram_jaccard_pairs(df, "id", "text", **kw).toPandas()
    prefix = dedup.ngram_jaccard_pairs(
        df, "id", "text", dense_vocab_max=1, **kw
    ).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, dense[key].values)) == sorted(
        map(tuple, prefix[key].values)
    )
    assert len(dense) > 0
    ja = dense.sort_values(key).jaccard.values
    jb = prefix.sort_values(key).jaccard.values
    assert (abs(ja - jb) < 1e-9).all()


def test_ngram_dense_union_vocab_overflow_falls_through(spark):
    """Per-partition vocabularies can each fit the cap while their
    UNION overflows it: the fused path must detect that on the driver,
    discard the collected frame, and fall through to the prefix join
    with identical results."""
    rows = [
        (i, " ".join(f"tok{i}x{j}" for j in range(8)) + " shared anchor")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "id long, text string").repartition(6)
    kw = dict(n=5, jaccard_threshold=0.05)
    # each doc alone has ~<40 distinct 5-grams, the union far exceeds it
    capped = dedup.ngram_jaccard_pairs(
        df, "id", "text", dense_vocab_max=40, **kw
    ).toPandas()
    prefix = dedup.ngram_jaccard_pairs(
        df, "id", "text", dense_vocab_max=1, **kw
    ).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, capped[key].values)) == sorted(
        map(tuple, prefix[key].values)
    )
    assert len(capped) > 0


def test_ngram_jaccard_explicit_ndocs_matches_derived(spark, docs):
    # max_shingle_df < 1 activates the df cap; supplying n_docs must
    # give the same threshold as deriving it in-plan
    derived = dedup.ngram_jaccard_pairs(
        docs, "id", "text", jaccard_threshold=0.3, max_shingle_df=0.9
    ).toPandas()
    explicit = dedup.ngram_jaccard_pairs(
        docs, "id", "text", jaccard_threshold=0.3, max_shingle_df=0.9, n_docs=4
    ).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, derived[key].values)) == sorted(
        map(tuple, explicit[key].values)
    )


@pytest.fixture
def vectors(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(20, 16)
    rows = [(i, [float(v) for v in base[i]]) for i in range(20)]
    # plant near-dups: 100+i is a tiny perturbation of i
    for i in range(3):
        rows.append((100 + i, [float(v) for v in base[i] + rng.randn(16) * 0.01]))
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_embedding_exact_finds_planted(spark, vectors):
    out = dedup.embedding_neardup_pairs(
        vectors, "id", "vec", threshold=0.99, lsh_planes=0
    ).toPandas()
    found = set(map(tuple, out[["id_a", "id_b"]].values))
    assert {(0, 100), (1, 101), (2, 102)} <= found


def test_embedding_lsh_subset_of_exact_with_high_recall(spark, vectors):
    exact = dedup.embedding_neardup_pairs(
        vectors, "id", "vec", threshold=0.99, lsh_planes=0
    ).toPandas()
    lsh = dedup.embedding_neardup_pairs(
        vectors, "id", "vec", threshold=0.99, lsh_planes=16, lsh_bands=8, dim=16
    ).toPandas()
    exact_pairs = set(map(tuple, exact[["id_a", "id_b"]].values))
    lsh_pairs = set(map(tuple, lsh[["id_a", "id_b"]].values))
    # verification step guarantees no false positives
    assert lsh_pairs <= exact_pairs
    # near-identical vectors collide in every band -> full recall here
    assert {(0, 100), (1, 101), (2, 102)} <= lsh_pairs


def test_embedding_lsh_requires_dim(spark, vectors):
    with pytest.raises(ValueError, match="dim"):
        dedup.embedding_neardup_pairs(vectors, "id", "vec")


def test_embedding_exact_empty_input(spark):
    empty = spark.createDataFrame([], "id long, vec array<double>")
    out = dedup.embedding_neardup_pairs(
        empty, "id", "vec", threshold=0.9, lsh_planes=0
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_embedding_exact_duplicate_ids_no_self_pairs(spark):
    # two rows sharing one id: min/max normalization must never emit
    # an id_a == id_b pair (the cross-join form's id_a < id_b excluded
    # those by construction)
    v = [1.0] * 8
    rows = [(7, v), (7, v), (9, v)]
    out = dedup.embedding_neardup_pairs(
        spark.createDataFrame(rows, "id long, vec array<double>"),
        "id",
        "vec",
        threshold=0.5,
        lsh_planes=0,
    ).toPandas()
    assert (out.id_a != out.id_b).all()
    assert set(map(tuple, out[["id_a", "id_b"]].values)) == {(7, 9)}


class TestConnectedComponents:
    def _cc(self, spark, edges):
        from clustering_spark.operators.graph import connected_components

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        out = connected_components(df, "id_a", "id_b")
        return {r.node: r.comp for r in out.collect()}

    def test_chain_pair_and_direction(self, spark):
        # chain 1-2-3-4 (multi-round propagation), pair 10-11,
        # reversed edge 21->20
        got = self._cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    def test_long_path_converges(self, spark):
        # path of 12 nodes: needs ~11 propagation rounds — exercises
        # the iteration/convergence machinery well past round 1
        edges = [(i, i + 1) for i in range(100, 111)]
        got = self._cc(spark, edges)
        assert set(got.values()) == {100}
        assert len(got) == 12

    def test_path_10k_converges_in_log_rounds(self, spark):
        # 10k-node path graph: diameter 10k, so hash-min label
        # propagation would need ~10k rounds; large-star/small-star
        # must finish within ~log2(n) rounds — max_iter=15 enforces it
        from clustering_spark.operators.graph import connected_components

        edges = spark.range(10_000).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        out = connected_components(edges, "id_a", "id_b", max_iter=15)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("comp").alias("ncomp"),
            F.min("comp").alias("mincomp"),
        ).collect()[0]
        assert (agg.n, agg.ncomp, agg.mincomp) == (10_001, 1, 0)

    def test_empty_and_self_loop_edges(self, spark):
        from clustering_spark.operators.graph import connected_components

        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(empty, "id_a", "id_b").count() == 0
        # self-loop-only node labels itself; no linkage created
        got = self._cc(spark, [(5, 5), (1, 2)])
        assert got == {5: 5, 1: 1, 2: 1}

    def test_assign_and_dedup(self, spark):
        from clustering_spark.operators.graph import (
            assign_components,
            connected_components,
            dedup_by_component,
        )

        docs = spark.createDataFrame(
            [(i, f"doc{i}") for i in [1, 2, 3, 7, 9]], "doc_id long, text string"
        )
        comp = connected_components(
            spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long"),
            "id_a",
            "id_b",
        )
        labelled = assign_components(docs, "doc_id", comp)
        lab = {r.doc_id: r.component for r in labelled.collect()}
        # 7 and 9 are singletons: component = own id
        assert lab == {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}
        kept = sorted(r.doc_id for r in dedup_by_component(docs, "doc_id", comp).collect())
        assert kept == [1, 7, 9]


class TestContamination:
    def _docs(self, spark):
        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated training content here now"),
            ],
            "doc_id long, text string",
        )
        test = spark.createDataFrame(
            # doc 10 shares a long run with train doc 1 (many 3-grams);
            # doc 11 shares nothing
            [
                (10, "quick brown fox jumps over the lazy cat"),
                (11, "totally different evaluation text sample words"),
            ],
            "doc_id long, text string",
        )
        return train, test

    def test_flags_overlapping_pair_only(self, spark):
        from clustering_spark.operators.dedup import contamination_pairs

        train, test = self._docs(spark)
        out = contamination_pairs(
            train, test, "doc_id", "text", shingle_words=3, min_shared=3
        ).toPandas()
        assert set(zip(out.test_id, out.train_id)) == {(10, 1)}
        # "quick brown fox jumps over the lazy" = 7 shared tokens
        # -> 5 shared 3-grams
        assert int(out.n_shared.iloc[0]) == 5

    def test_min_shared_threshold_excludes(self, spark):
        from clustering_spark.operators.dedup import contamination_pairs

        train, test = self._docs(spark)
        out = contamination_pairs(
            train, test, "doc_id", "text", shingle_words=3, min_shared=6
        ).toPandas()
        assert out.empty

    def test_shuffle_join_path_matches_broadcast(self, spark):
        from clustering_spark.operators.dedup import contamination_pairs

        train, test = self._docs(spark)
        a = contamination_pairs(
            train, test, "doc_id", "text", broadcast_test=True
        ).toPandas()
        b = contamination_pairs(
            train, test, "doc_id", "text", broadcast_test=False
        ).toPandas()
        key = ["test_id", "train_id"]
        assert a.sort_values(key).values.tolist() == b.sort_values(key).values.tolist()


class TestPassageDupStats:
    def _docs(self, spark):
        # 200-char shared boilerplate passage planted at chunk-aligned
        # offsets in docs 1 and 2; doc 3 is unique text
        shared = ("All rights reserved. Subscribe to our newsletter. " * 4)[:200]
        uniq = lambda c: (c * 300)[:300]
        rows = [
            (1, shared + uniq("a")),
            (2, shared + uniq("b")),
            (3, uniq("c") + uniq("d")),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shared_passage_flagged_per_doc(self, spark):
        from clustering_spark.operators.dedup import passage_dup_stats

        out = {
            r.doc_id: r
            for r in passage_dup_stats(
                self._docs(spark), size=200, stride=200
            ).collect()
        }
        assert len(out) == 3
        # docs 1 and 2 share exactly their first chunk (chunk-aligned)
        assert out[1].n_shared_chunks >= 1
        assert out[2].n_shared_chunks >= 1
        assert out[3].n_shared_chunks == 0
        for r in out.values():
            assert 0.0 <= r.shared_chunk_frac <= 1.0
            assert r.n_shared_chunks <= r.n_chunks

    def test_duplicate_free_corpus_all_zero(self, spark):
        from clustering_spark.operators.dedup import passage_dup_stats

        df = spark.createDataFrame(
            [(i, f"{'x' * i} unique document number {i} " * 20) for i in range(1, 6)],
            "doc_id long, text string",
        )
        out = passage_dup_stats(df).collect()
        assert all(r.n_shared_chunks == 0 for r in out)

    def test_self_repetition_not_cross_doc(self, spark):
        """A doc repeating ITS OWN passage is not cross-doc shared
        (countDistinct doc guard)."""
        from clustering_spark.operators.dedup import passage_dup_stats

        block = ("repeat me " * 30)[:200]
        df = spark.createDataFrame(
            [(1, block + block), (2, "totally unrelated text " * 20)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in passage_dup_stats(df, size=200, stride=200).collect()
        }
        assert out[1].n_shared_chunks == 0


def test_passage_dup_stats_empty_input(spark):
    from clustering_spark.operators.dedup import passage_dup_stats

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert passage_dup_stats(empty).count() == 0


def test_passage_dup_stats_matches_duckdb_on_real_docs(spark):
    """Independent DuckDB replay of the chunk-hash pipeline on the
    real documents table (md5 + substring agree byte-for-byte across
    engines, so the whole stat is cross-checkable)."""
    import duckdb

    from clustering_spark.operators.dedup import passage_dup_stats

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = (
        passage_dup_stats(d, size=200, stride=150)
        .orderBy("doc_id")
        .toPandas()
    )
    want = duckdb.sql(f"""
        WITH docs AS (
          SELECT doc_id, text
          FROM read_parquet('{SF_DIR}/documents.parquet')
          WHERE length(text) > 0),
        chunks AS (
          SELECT doc_id,
                 md5(substring(text, (u.i - 1) * 150 + 1, 200)) AS h
          FROM docs,
               UNNEST(range(1,
                 CAST(floor((length(text) - 1) / 150) + 2 AS BIGINT))) AS u(i)),
        shared AS (
          SELECT h FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
        SELECT c.doc_id,
               count(*) AS n_chunks,
               sum(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END) AS n_shared_chunks,
               round(sum(CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS shared_chunk_frac
        FROM chunks c LEFT JOIN shared s ON c.h = s.h
        GROUP BY c.doc_id ORDER BY c.doc_id
    """).fetchdf()
    assert len(got) == len(want)
    assert (got.doc_id.values == want.doc_id.values).all()
    assert (got.n_chunks.values == want.n_chunks.values).all()
    assert (got.n_shared_chunks.values == want.n_shared_chunks.values).all()
    assert int(want.n_shared_chunks.sum()) > 0  # the check has teeth


class TestSemanticDedup:
    """SemDeDup-style within-cell semantic dedup: exactness of emitted
    pairs (subset of brute-force all-pairs with identical cosines),
    planted-duplicate recovery, survivor rule, and the cell-size
    guard."""

    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.RandomState(3)
        rows = []
        for i in range(120):
            v = rng.standard_normal(16)
            rows.append((i, [float(x) for x in v]))
        # planted near-dup cluster {200, 201, 202}: tiny perturbations
        base = rng.standard_normal(16)
        for j, vid in enumerate((200, 201, 202)):
            v = base + 1e-3 * j * np.ones(16)
            rows.append((vid, [float(x) for x in v]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(8)

    def test_pairs_are_exact_subset_of_bruteforce(self, spark, emb):
        sem = dedup.semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.9, nlist=8, seed=1
        ).toPandas()
        exact = dedup.embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.9, lsh_planes=0
        ).toPandas()
        ex = {
            (int(r.id_a), int(r.id_b)): r.cosine for _, r in exact.iterrows()
        }
        assert len(sem) > 0
        for _, r in sem.iterrows():
            key = (int(r.id_a), int(r.id_b))
            assert key in ex, f"false positive {key}"
            assert abs(r.cosine - ex[key]) < 1e-9
            assert r.cosine >= 0.9

    def test_planted_cluster_found(self, spark, emb):
        sem = dedup.semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.99, nlist=8, seed=1
        ).toPandas()
        got = {
            (int(r.id_a), int(r.id_b)) for _, r in sem.iterrows()
        }
        # identical-direction vectors land in one cell: all 3 pairs
        assert {(200, 201), (200, 202), (201, 202)} <= got

    @pytest.fixture(scope="class")
    def planted_many(self, spark):
        """40 planted 3-member near-dup clusters (within-cluster cosine
        >= 0.95 by construction) + 200 background noise vectors —
        ground truth for the recall pin is the capped exact GEMM."""
        rng = np.random.RandomState(11)
        rows = []
        vid = 0
        for _ in range(40):
            base = rng.standard_normal(16)
            base /= np.linalg.norm(base)
            for _ in range(3):
                v = base + 0.01 * rng.standard_normal(16)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        for _ in range(200):
            rows.append((vid, [float(x) for x in rng.standard_normal(16)]))
            vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(8)

    def test_recall_vs_exact_gemm(self, spark, planted_many):
        """The IVF-recall pin the verdicts prescribed (same treatment
        tests/test_similarity.py gives IVF-ANN): at nlist=16 the
        cell-bucketed pairs must recover >= 95% of the pairs the exact
        all-pairs GEMM finds on the planted-cluster fixture. Near-dup
        members are near-identical vectors, so k-means cells keep them
        together — boundary straddle, the operator's documented
        approximation, must stay a rare event, not the common case."""
        exact = dedup.embedding_neardup_pairs(
            planted_many, "vec_id", "embedding", threshold=0.95, lsh_planes=0
        ).toPandas()
        sem = dedup.semantic_dedup_pairs(
            planted_many, "vec_id", "embedding",
            threshold=0.95, nlist=16, seed=1,
        ).toPandas()
        ex_pairs = {(int(r.id_a), int(r.id_b)) for _, r in exact.iterrows()}
        sem_pairs = {(int(r.id_a), int(r.id_b)) for _, r in sem.iterrows()}
        # the fixture has teeth: all 40*3 within-cluster pairs qualify
        assert len(ex_pairs) >= 120
        # no false positives (exactness), then the recall pin
        assert sem_pairs <= ex_pairs
        recall = len(sem_pairs & ex_pairs) / len(ex_pairs)
        assert recall >= 0.95, f"semantic dedup recall {recall:.3f} < 0.95"

    def test_recall_pin_has_teeth_under_cell_corruption(
        self, spark, planted_many, monkeypatch
    ):
        """Sanity check that the >=0.95 pin actually measures cell
        quality: corrupt the cell assignment (hash-scatter instead of
        nearest-centroid) and recall must collapse well below the pin
        — if this ever PASSES the 0.95 bar, the pin is vacuous."""
        from clustering_spark.operators.similarity import IVFIndex

        monkeypatch.setattr(
            IVFIndex,
            "_cell_expr",
            lambda self, vec_col: F.pmod(
                F.xxhash64(F.col(vec_col).cast("array<double>")), F.lit(16)
            ),
        )
        exact = dedup.embedding_neardup_pairs(
            planted_many, "vec_id", "embedding", threshold=0.95, lsh_planes=0
        ).toPandas()
        corrupted = dedup.semantic_dedup_pairs(
            planted_many, "vec_id", "embedding",
            threshold=0.95, nlist=16, seed=1,
        ).toPandas()
        ex_pairs = {(int(r.id_a), int(r.id_b)) for _, r in exact.iterrows()}
        got = {(int(r.id_a), int(r.id_b)) for _, r in corrupted.iterrows()}
        recall = len(got & ex_pairs) / len(ex_pairs)
        assert recall < 0.5, (
            f"corrupted cells still reach recall {recall:.3f} — "
            "the >=0.95 pin would not detect broken cell assignment"
        )

    def test_null_id_rows_never_edge_and_always_survive(self, spark):
        """Round-10 review batch: a NULL id with a VALID vector (a) must
        not poison pair generation — Arrow hands the id to the cell
        kernel as NaN, which used to turn min/max id ordering into
        (None, None, 1.0) junk pairs — and (b) must survive dedup
        unconditionally (graph.dedup_by_component contract: a NULL id
        can never appear in an edge). Before this fix, keep() silently
        DROPPED the NULL-id row (NULL == NULL is NULL under SQL)."""
        rng = np.random.RandomState(0)
        base = rng.standard_normal(8)
        rows = [
            (1, [float(x) for x in base]),
            (2, [float(x) for x in base + 1e-4]),
            (None, [float(x) for x in base + 2e-4]),
        ]
        rows += [
            (i, [float(x) for x in rng.standard_normal(8)])
            for i in range(10, 30)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = dedup.semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=0.99, nlist=2, seed=1
        ).toPandas()
        assert not pairs.id_a.isna().any() and not pairs.id_b.isna().any()
        assert {(1, 2)} == set(map(tuple, pairs[["id_a", "id_b"]].values))
        kept = [
            r.vec_id
            for r in dedup.semantic_dedup_keep(
                df, "vec_id", "embedding", threshold=0.99, nlist=2, seed=1
            ).collect()
        ]
        assert None in kept, "NULL-id row must survive dedup"
        assert 1 in kept and 2 not in kept

    def test_exact_gemm_null_id_does_not_crash(self, spark):
        """embedding_neardup_pairs (the ORACLE-GATED exact path) used to
        raise TypeError ('<=' between int and NoneType) in np.minimum
        the moment a NULL id carried a valid vector."""
        rng = np.random.RandomState(0)
        base = rng.standard_normal(8)
        df = spark.createDataFrame(
            [
                (1, [float(x) for x in base]),
                (2, [float(x) for x in base + 1e-5]),
                (None, [float(x) for x in base + 2e-5]),
            ],
            "vec_id long, embedding array<double>",
        )
        out = dedup.embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.9, lsh_planes=0
        ).toPandas()
        assert set(map(tuple, out[["id_a", "id_b"]].values)) == {(1, 2)}
        lsh = dedup.embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.9, lsh_planes=16,
            lsh_bands=2, dim=8,
        ).toPandas()
        assert not lsh.id_a.isna().any()

    def test_keep_collapses_planted_cluster_to_min_id(self, spark, emb):
        kept = {
            int(r.vec_id)
            for r in dedup.semantic_dedup_keep(
                emb, "vec_id", "embedding", threshold=0.99, nlist=8, seed=1
            ).collect()
        }
        assert 200 in kept
        assert 201 not in kept and 202 not in kept
        # untouched singletons all survive
        assert sum(1 for i in range(120) if i in kept) >= 100

    def test_cell_cap_raises(self, spark, emb):
        with pytest.raises(Exception) as exc:
            dedup.semantic_dedup_pairs(
                emb,
                "vec_id",
                "embedding",
                threshold=0.9,
                nlist=1,
                max_cell_rows=10,
            ).collect()
        assert "max_cell_rows" in str(exc.value)


def test_decontaminate_drops_flagged_and_keeps_schema(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about cooking pasta sauces"),
            (3, "another unrelated note on mountain weather patterns"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(900, "quick brown fox jumps over the lazy")],
        "doc_id long, text string",
    )
    out = dedup.decontaminate(train, test, "doc_id", "text", min_shared=3)
    assert out.columns == train.columns
    assert {r.doc_id for r in out.collect()} == {2, 3}


def test_semantic_dedup_subset_property_random(spark):
    """Hypothesis-flavored randomized sweep (seeded): for random
    corpora and several nlist values, every semantic pair must appear
    in the brute-force pair set with an identical cosine — cell
    pruning may lose pairs, never invent or mis-score them."""
    rng = np.random.RandomState(99)
    for trial, nlist in [(0, 2), (1, 5), (2, 16)]:
        n = 60 + trial * 17
        rows = [
            (i, [float(x) for x in rng.standard_normal(8)]) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        sem = dedup.semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=0.5, nlist=nlist, seed=trial
        ).toPandas()
        exact = dedup.embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.5, lsh_planes=0
        ).toPandas()
        ex = {(int(r.id_a), int(r.id_b)): r.cosine for _, r in exact.iterrows()}
        for _, r in sem.iterrows():
            key = (int(r.id_a), int(r.id_b))
            assert key in ex and abs(r.cosine - ex[key]) < 1e-9


def test_semantic_dedup_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.semantic_dedup_pairs(df, "vec_id", "embedding").count() == 0
    assert dedup.semantic_dedup_keep(df, "vec_id", "embedding").count() == 0


def test_simhash_wide_radius_pigeonhole_complete(spark):
    """The adaptive chunking contract directly: h differing bits over
    h+1 chunks always leave a shared chunk. For every radius, chunk
    widths cover exactly 64 bits; and a planted worst-case pair (one
    flipped bit per 16-bit quadrant = hamming 4) that the old fixed
    4x16 split lost must be found at max_hamming=4."""
    for h in (0, 1, 3, 8, 31):
        ch = dedup._hamming_chunks(h)
        assert len(ch) == h + 1
        assert sum(w for _, _, w in ch) == 64
        assert all(w >= 1 for _, _, w in ch)
    import pytest as _pt

    with _pt.raises(ValueError):
        dedup._hamming_chunks(32)


def test_dedup_by_component_survives_missing_min_id(spark):
    """If the component-min doc was filtered out between pair
    generation and dedup, the next-smallest PRESENT member must
    survive — not the whole component vanish."""
    from clustering_spark.operators.graph import (
        connected_components,
        dedup_by_component,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = connected_components(edges)
    # doc 1 (the min of component {1,2,3}) is ABSENT from df
    df = spark.createDataFrame([(2,), (3,), (10,), (11,), (99,)], "doc_id long")
    kept = sorted(r.doc_id for r in dedup_by_component(df, "doc_id", comp).collect())
    assert kept == [2, 10, 99]


# ------------------------------------------- round-7 review-fix pins


def test_null_text_docs_never_pair_in_minhash_and_simhash(spark):
    # NULL docs shingle to [NULL]; xxhash64 hash-skips the null, so
    # without the up-front filter every NULL doc got the SAME constant
    # signature and (1, 2) surfaced as a perfect near-dup in both ops
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, DOC_A), (4, DOC_A)],
        "id long, text string",
    )
    mh = dedup.minhash_lsh_pairs(df, "id", "text", shingle_words=2).toPandas()
    sh = dedup.simhash_pairs(df, "id", "text").toPandas()
    assert set(map(tuple, mh[["id_a", "id_b"]].values)) == {(3, 4)}
    assert set(map(tuple, sh[["id_a", "id_b"]].values)) == {(3, 4)}


def test_novel_minhash_null_rows_survive_null_corpus(spark):
    # a missing document is no evidence of similarity: the NULL-text
    # new row must NOT be deduped against a NULL-text corpus doc
    new = spark.createDataFrame([(1, None), (2, DOC_A)], "id long, text string")
    corpus = spark.createDataFrame(
        [(10, None), (11, DOC_A)], "id long, text string"
    )
    out = dedup.novel_minhash(new, corpus, "id", "text", shingle_words=2).toPandas()
    assert set(out.id) == {1}


def test_novel_exact_null_semantics_consistent(spark):
    # ONE NULL-equality rule everywhere (exact_dedup's sentinel):
    # NULL contents are equal in-batch AND against the corpus
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, DOC_A)], "id long, text string"
    )
    empty_corpus = spark.createDataFrame([], "id long, text string")
    out = dedup.novel_exact(new, empty_corpus, "id", "text").toPandas()
    assert set(out.id) == {1, 3}  # in-batch NULLs collapse to min-id
    null_corpus = spark.createDataFrame([(9, None)], "id long, text string")
    out2 = dedup.novel_exact(new, null_corpus, "id", "text").toPandas()
    assert set(out2.id) == {3}  # corpus already holds a NULL doc


def test_dense_bitmap_duplicate_ids_no_self_pairs(spark):
    # duplicate __id at distinct sorted indices: the dense bitmap
    # regime must apply the same self-pair guard as the prefix join
    # (id_a < id_b) and the DuckDB oracle
    t = "some identical text for ngram dedup checks"
    df = spark.createDataFrame(
        [(7, t), (7, t), (9, t)], "doc_id long, text string"
    )
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", jaccard_threshold=0.5
    ).toPandas()
    assert (out.id_a != out.id_b).all()
    assert set(map(tuple, out[["id_a", "id_b"]].values)) == {(7, 9)}


def test_round6_half_up_matches_spark_on_ties():
    # dyadic tie: 0.4140625 * 1e6 = 414062.5 exactly; np.round
    # (half-even) gives ...062 while Spark/DuckDB HALF_UP gives ...063
    x = np.array([0.4140625, -0.4140625, 0.25])
    out = dedup._round6_half_up(x)
    assert out[0] == 0.414063
    assert out[1] == -0.414063
    assert out[2] == 0.25


def test_embedding_paths_ignore_null_vectors(spark):
    v = [1.0] * 8
    df = spark.createDataFrame(
        [(1, v), (2, v), (3, None)], "id long, vec array<double>"
    )
    exact = dedup.embedding_neardup_pairs(
        df, "id", "vec", threshold=0.5, lsh_planes=0
    ).toPandas()
    assert set(map(tuple, exact[["id_a", "id_b"]].values)) == {(1, 2)}
    lsh = dedup.embedding_neardup_pairs(
        df, "id", "vec", threshold=0.5, lsh_planes=16, lsh_bands=8, dim=8
    ).toPandas()
    assert set(map(tuple, lsh[["id_a", "id_b"]].values)) == {(1, 2)}
    sem = dedup.semantic_dedup_pairs(df, "id", "vec", threshold=0.5, nlist=2).toPandas()
    assert set(map(tuple, sem[["id_a", "id_b"]].values)) == {(1, 2)}
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "id long, vec array<double>"
    )
    assert dedup.semantic_dedup_pairs(all_null, "id", "vec", nlist=2).count() == 0


def test_band_divisibility_raises_value_error(spark, docs):
    with pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(docs, "id", "text", num_hashes=64, bands=15)
    with pytest.raises(ValueError, match="divide"):
        dedup.embedding_neardup_pairs(
            spark.createDataFrame([(1, [1.0])], "id long, vec array<double>"),
            "id",
            "vec",
            lsh_planes=16,
            lsh_bands=5,
            dim=1,
        )


def test_component_helpers_tolerate_label_collisions(spark):
    from clustering_spark.operators.graph import (
        assign_components,
        connected_components,
        dedup_by_component,
    )

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    comp = connected_components(edges, "id_a", "id_b")
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    labelled = assign_components(docs, "doc_id", comp)
    # feeding the labelled frame back through dedup must work (it used
    # to build a SECOND 'component' column -> AMBIGUOUS_REFERENCE)
    kept = sorted(
        r.doc_id for r in dedup_by_component(labelled, "doc_id", comp).collect()
    )
    assert kept == [1, 3]
    # explicit re-labelling is a loud error, not a duplicate column
    with pytest.raises(ValueError, match="component"):
        assign_components(labelled, "doc_id", comp)


def test_dedup_by_component_keeps_null_id_rows(spark):
    """NULL-id rows can never appear in an edge, so they are provably
    not duplicates of anything — dedup must pass them through, not
    silently drop them (NULL label + NULL min + SQL NULL-equality did
    exactly that before the isNull branch)."""
    from clustering_spark.operators.graph import (
        connected_components,
        dedup_by_component,
    )

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    comp = connected_components(edges)
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,), (7,)], "doc_id long"
    )
    kept = [r.doc_id for r in dedup_by_component(df, "doc_id", comp).collect()]
    # survivor of {1,2}, singleton 7, and BOTH NULL-id rows
    assert sorted(x for x in kept if x is not None) == [1, 7]
    assert sum(1 for x in kept if x is None) == 2


# ----------------------------------------- round-7 batch-14 review pins


def test_ngram_prefix_filters_lossless_at_float_boundary(spark):
    """ceil(t*n) computed in FLOAT overshoots the true rational
    ceiling when the product is mathematically integral (0.55*100 ->
    55.000000000000007 -> ceil 56), so the size filter demanded
    |s| >= 56 and silently dropped a qualifying J = 55/100 = 0.55
    pair — violating the documented lossless contract. Construct the
    exact boundary: 104 distinct chars -> 100 distinct 5-grams; its
    59-char prefix -> 55 distinct 5-grams, all contained."""
    big = "".join(chr(0x4E00 + i) for i in range(104))
    small = big[:59]
    df = spark.createDataFrame([(1, big), (2, small)], "id long, text string")
    # dense_vocab_max=1 forces the PPJoin prefix path (the dense
    # bitmap regime doesn't use the prefix/size filters)
    pairs = dedup.ngram_jaccard_pairs(
        df, "id", "text", n=5, jaccard_threshold=0.55, dense_vocab_max=1
    ).toPandas()
    assert len(pairs) == 1
    assert (pairs.id_a[0], pairs.id_b[0]) == (1, 2)
    assert abs(pairs.jaccard[0] - 0.55) < 1e-9


def test_ceil_ratio_exact_and_tight(spark):
    """The PPJoin bounds now use exact integer ceilings: for the
    threshold fraction p/q, the in-plan _ceil_ratio formula must equal
    the exact rational ceiling for every n — TIGHT (no +1 epsilon
    slack at integral products) and never below it (lossless). Grid
    over the thresholds that historically misbehaved in float."""
    from fractions import Fraction

    from clustering_spark.operators.dedup import _ceil_ratio, _threshold_fraction

    ns = list(range(0, 401))
    df = spark.createDataFrame([(n,) for n in ns], "n int")
    for t in (0.55, 0.7, 0.29, 1 / 3, 0.5, 0.999999, 1.0):
        p, q = _threshold_fraction(t)
        # the fraction never exceeds the float the verify compares with
        assert Fraction(p, q) <= Fraction(t)
        got = {
            r["n"]: r["c"]
            for r in df.select(
                "n", _ceil_ratio(F.col("n"), p, q).alias("c")
            ).collect()
        }
        for n in ns:
            exact = -((-p * n) // q)  # ceil(p*n/q) in exact ints
            assert got[n] == exact, (t, n, got[n], exact)


def test_hamming_pair_search_max_hamming_zero(spark):
    """max_hamming=0 (exact-signature duplicate search) uses ONE
    64-bit chunk: the chunk mask must be skipped — F.lit((1<<64)-1)
    overflows the JVM long and crashed the call before any job."""
    df = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, DOC_B)], "id long, text string"
    )
    pairs = dedup.simhash_pairs(df, "id", "text", max_hamming=0).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (1, 2) in found
    assert all(h == 0 for h in pairs.hamming)


def test_exact_dedup_injective_encoding(spark):
    """Content containing the old 0x1f separator / 0x00 NULL sentinel
    must NOT collide: ('x\\x1f','y') vs ('x','\\x1fy') encoded
    identically under the delimiter scheme (silently dropping one),
    and a literal '\\x00' string merged with NULL text."""
    df = spark.createDataFrame(
        [(1, "x\x1f", "y"), (2, "x", "\x1fy")], "id long, a string, b string"
    )
    out = dedup.exact_dedup(df, ["a", "b"], "id").toPandas()
    assert len(out) == 2 and set(out.n_copies) == {1}

    df2 = spark.createDataFrame(
        [(1, "\x00"), (2, None), (3, None)], "id long, text string"
    )
    out2 = dedup.exact_dedup(df2, ["text"], "id").toPandas()
    # the two NULLs group together; the literal '\x00' stays separate
    assert sorted(out2.n_copies) == [1, 2]
    assert len(out2) == 2


def test_simhash64_matches_arrow_packer(spark):
    """The zip_with signature packing (single evaluation of the vote
    aggregate) must stay bit-identical to the Arrow kernel that
    simhash_pairs uses."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, "one two"), (4, "")],
        "id long, text string",
    )
    expr_sigs = {
        r.id: r.s
        for r in df.select("id", dedup.simhash64("text").alias("s")).collect()
    }
    pack = dedup._simhash_from_hashes_udf()
    kernel_sigs = {
        r.id: r.s
        for r in df.select(
            "id",
            pack(
                F.transform(
                    dedup.word_shingles("text", 2), lambda s: F.xxhash64(s)
                )
            ).alias("s"),
        ).collect()
    }
    assert expr_sigs == kernel_sigs


def test_dedup_by_component_collapses_duplicate_ids(spark):
    # the same doc ingested twice (duplicate id, no exact-dedup
    # upstream): 'keep ONE row per component' must hold — a min-id
    # FILTER kept every row tied at the minimum
    from clustering_spark.operators.graph import dedup_by_component

    df = spark.createDataFrame(
        [(1, "a"), (1, "a-again"), (2, "b"), (5, "solo"), (None, "n1"), (None, "n2")],
        "doc_id long, text string",
    )
    comp = spark.createDataFrame([(1, 1), (2, 1)], "node long, comp long")
    kept = dedup_by_component(df, "doc_id", comp).collect()
    ids = sorted((r.doc_id is None, r.doc_id or 0) for r in kept)
    # component {1,2}: exactly ONE survivor (id 1, one of the two rows);
    # singleton 5 survives; both NULL-id rows survive by contract
    assert len([r for r in kept if r.doc_id == 1]) == 1
    assert len([r for r in kept if r.doc_id == 5]) == 1
    assert len([r for r in kept if r.doc_id is None]) == 2
    assert len(kept) == 4


def test_null_id_contract_text_pair_generators(spark):
    """Repo-wide pair-generator contract (graph.dedup_by_component): a
    NULL id never appears in an edge. Pin it for the text generators —
    minhash, simhash, ngram — with a NULL-id row whose text is an
    exact duplicate of two real rows: the real pair must surface, the
    NULL-id row must neither crash the kernel nor emit junk pairs."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, txt), (2, txt), (None, txt)], "doc_id long, text string"
    )
    mh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=0.5
    ).toPandas()
    sh = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3).toPandas()
    ng = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=5, jaccard_threshold=0.5, dense_vocab_max=1
    ).toPandas()
    for name, pairs in (("minhash", mh), ("simhash", sh), ("ngram", ng)):
        assert not pairs.id_a.isna().any(), name
        assert not pairs.id_b.isna().any(), name
        assert (pairs.id_a < pairs.id_b).all(), name
        assert {(1, 2)} == set(map(tuple, pairs[["id_a", "id_b"]].values)), name


def test_ngram_jaccard_threshold_validation(spark):
    """t <= 0 would silently break completeness (J=0 pairs share no
    shingle and are never generated); t > 1 is vacuous — both must be
    loud ValueErrors, not quietly-wrong results."""
    df = spark.createDataFrame([(1, DOC_A), (2, DOC_B)], "id long, text string")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="jaccard_threshold"):
            dedup.ngram_jaccard_pairs(df, "id", "text", jaccard_threshold=bad)


def test_threshold_fraction_near_fraction_fallback():
    """A float sitting just BELOW a simple fraction (limit_denominator
    would round up past it) must take the floor-quantized fallback:
    p/q <= t always, relaxed by < 1e-6."""
    from fractions import Fraction

    from clustering_spark.operators.dedup import _threshold_fraction

    for t in (0.5 - 1e-12, 1 / 3, 2 / 3, 0.7 - 1e-13, 1.0, 0.999999):
        p, q = _threshold_fraction(t)
        assert Fraction(p, q) <= Fraction(t), t
        assert float(t) - p / q < 1e-6, t


def test_dedup_by_component_keep_label_matches_assign(spark):
    """Round-16 review: keep_label returns survivors WITH their
    component in ONE labelling join — must equal the old
    dedup-then-assign_components composition, and refuse a colliding
    column name."""
    import pytest

    from clustering_spark.operators.graph import (
        assign_components,
        dedup_by_component,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, v string"
    )
    comp = spark.createDataFrame(
        [(2, 1), (1, 1)], "node long, comp long"
    )
    got = dedup_by_component(df, "doc_id", comp, keep_label="component")
    want = assign_components(
        dedup_by_component(df, "doc_id", comp), "doc_id", comp
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.columns == ["doc_id", "v", "component"]
    with pytest.raises(ValueError, match="'v'"):
        dedup_by_component(df, "doc_id", comp, keep_label="v")


def test_ngram_dense_doc_cap_honored_with_empty_partitions(spark):
    """The fused dense frame's completeness check must bound the
    DRIVER-COLLECTED DOC ROWS at allpairs_max_docs directly: the limit
    K budgets one vocab row per partition, but EMPTY partitions emit
    no vocab row, so a frame with up to n_parts doc rows beyond the
    cap used to read as 'complete' and overshoot the documented
    collect budget (round-17 ADVICE item). With many empty partitions
    and doc count just above the cap, the operator must fall through
    to the prefix join — and return the same pairs either way."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": range(6),
            "text": [f"abcdefgh{i % 2}" * 3 for i in range(6)],
        }
    )
    # 6 docs over 16 partitions -> >= 10 empty partitions; cap of 4
    # is exceeded by doc rows (6) but NOT by len(raw) = 6 + <=6 vocab
    # rows < K = 4 + 1 + 16
    docs = spark.createDataFrame(pdf).repartition(16)
    kw = dict(n=5, jaccard_threshold=0.3)
    # n_docs is deliberately UNKNOWN (None): a caller-declared count
    # above the cap skips the dense attempt upfront — the guard under
    # test is the fused FRAME's own completeness check
    capped_df = dedup.ngram_jaccard_pairs(
        docs, "id", "text", allpairs_max_docs=4, **kw
    )
    # results are exact on BOTH paths, so pin the PATH: over-cap must
    # fall through to the prefix join (a driver-kernel task frame scans
    # an ExistingRDD; the prefix join never does)
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, "dense driver kernel ran over the doc cap"
    capped = capped_df.toPandas()
    dense = dedup.ngram_jaccard_pairs(docs, "id", "text", **kw).toPandas()
    key = ["id_a", "id_b"]
    assert sorted(map(tuple, capped[key].values)) == sorted(
        map(tuple, dense[key].values)
    )
