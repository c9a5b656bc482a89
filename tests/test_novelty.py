"""Incremental (novelty) dedup semantics: exact fingerprint anti-join
against a corpus, minhash near-dup anti-join, in-batch survivor rule,
and refactor parity (minhash_lsh_pairs unchanged by the shared staged
helpers).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import dedup

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "the quick brown fox jumps over the lazy cat again and again today"
DOC_C = "completely unrelated text about database query optimization plans"
DOC_D = "a genuinely fresh document discussing streaming watermarks in depth"


@pytest.fixture
def corpus(spark):
    return spark.createDataFrame(
        [(100, DOC_A), (101, DOC_C)], "id long, text string"
    )


def test_novel_exact_drops_verbatim_and_normalized(spark, corpus):
    new = spark.createDataFrame(
        [
            (1, DOC_A),                     # verbatim corpus dup
            (2, "  " + DOC_A.upper() + " "),  # same modulo case/space
            (3, DOC_D),                     # novel
        ],
        "id long, text string",
    )
    out = dedup.novel_exact(new, corpus, "id", "text").toPandas()
    assert sorted(out.id) == [3]


def test_novel_exact_in_batch_min_id_survivor(spark, corpus):
    new = spark.createDataFrame(
        [(7, DOC_D), (5, DOC_D), (9, DOC_B)], "id long, text string"
    )
    out = dedup.novel_exact(new, corpus, "id", "text").toPandas()
    assert sorted(out.id) == [5, 9]  # 7 collapses into 5


def test_novel_exact_empty_corpus(spark):
    new = spark.createDataFrame([(1, DOC_A)], "id long, text string")
    empty = spark.createDataFrame([], "id long, text string")
    out = dedup.novel_exact(new, empty, "id", "text").toPandas()
    assert sorted(out.id) == [1]


def test_novel_minhash_drops_near_dup_keeps_novel(spark, corpus):
    new = spark.createDataFrame(
        [
            (1, DOC_B),  # one-word edit of corpus DOC_A -> near-dup
            (2, DOC_D),  # novel
        ],
        "id long, text string",
    )
    out = dedup.novel_minhash(
        new, corpus, "id", "text", shingle_words=2, jaccard_threshold=0.5
    ).toPandas()
    assert sorted(out.id) == [2]


def test_novel_minhash_does_not_collapse_in_batch(spark, corpus):
    # two copies of a novel doc: near-dup of each other but of nothing
    # in the corpus -> both survive (in-batch dedup is a separate stage)
    new = spark.createDataFrame(
        [(1, DOC_D), (2, DOC_D)], "id long, text string"
    )
    out = dedup.novel_minhash(
        new, corpus, "id", "text", shingle_words=2, jaccard_threshold=0.5
    ).toPandas()
    assert sorted(out.id) == [1, 2]


def test_refactor_parity_minhash_pairs(spark):
    """minhash_lsh_pairs through the extracted _staged_minhash/_banded
    helpers still finds the planted pairs with the same jaccard."""
    docs = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, DOC_B), (4, DOC_C)], "id long, text string"
    )
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", shingle_words=2, jaccard_threshold=0.5
    ).toPandas()
    j = pairs.set_index(["id_a", "id_b"]).jaccard
    assert j.loc[(1, 2)] == 1.0
