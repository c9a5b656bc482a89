"""Char-trigram LM scorer: fluent-vs-gibberish separation, smoothing
math on a hand-computed corpus, and a DuckDB cross-check.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import lm

from tests.conftest import SF_DIR

ENGLISH = [
    "the quick brown fox jumps over the lazy dog",
    "a stream processor bounds its state with watermarks",
    "the cat sat on the mat and watched the rain",
    "partitions shuffle data between the stages of a query",
]


def test_fluent_scores_above_gibberish(spark):
    corpus = spark.createDataFrame([(t,) for t in ENGLISH], "text string")
    model = lm.fit_trigram_lm(corpus, "text")
    docs = spark.createDataFrame(
        [
            (1, "the dog sat on the mat in the rain"),
            (2, "zxq jkw vvq pzx qqj wxz kqv jjx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lm_logp for r in
           lm.score_lm(docs, model, "doc_id", "text").collect()}
    # clear separation (margin sized for the tiny fixture model: with
    # 4 reference sentences the unseen-gram floor compresses scores)
    assert out[1] > out[2] + 0.5


def test_smoothing_hand_computed(spark):
    corpus = spark.createDataFrame([("aaaa",)], "text string")
    model = lm.fit_trigram_lm(corpus, "text")  # {'aaa': 2}
    docs = spark.createDataFrame([(1, "aaa"), (2, "bbb")], "id long, text string")
    out = {r.id: r.lm_logp for r in
           lm.score_lm(docs, model, "id", "text").collect()}
    # total=2, V=1 -> seen: ln(3/3)=0; unseen: ln(1/3)
    assert abs(out[1] - 0.0) < 1e-6
    assert abs(out[2] - round(math.log(1 / 3), 6)) < 1e-6


def test_short_and_empty_docs_null(spark):
    corpus = spark.createDataFrame([("hello world",)], "text string")
    model = lm.fit_trigram_lm(corpus, "text")
    docs = spark.createDataFrame([(1, ""), (2, "ab"), (3, "abc")],
                                 "id long, text string")
    out = {r.id: r.lm_logp for r in
           lm.score_lm(docs, model, "id", "text").collect()}
    assert out[1] is None and out[2] is None
    assert out[3] is not None


def test_lm_matches_duckdb(spark):
    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    model = lm.fit_trigram_lm(docs_df, "text")
    sp = (
        lm.score_lm(docs_df, model, "doc_id", "text")
        .select("doc_id", "lm_logp")
        .orderBy("doc_id")
        .toPandas()
    )
    dk = duckdb.connect().execute(
        rf"""
        WITH norm AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS t
          FROM read_parquet('{SF_DIR}/documents.parquet')),
        grams AS (
          SELECT doc_id, substr(t, i::INT, 3) AS gram
          FROM norm, unnest(range(1, len(t) - 1)) AS u(i)
          WHERE len(t) >= 3),
        model AS (SELECT gram, count(*) AS n FROM grams GROUP BY 1),
        tot AS (SELECT sum(n) AS total, count(*) AS v FROM model)
        SELECT g.doc_id,
               round(avg(ln((coalesce(m.n, 0) + 1.0) / (tot.total + tot.v))), 6)
                 AS lm_logp
        FROM grams g LEFT JOIN model m USING (gram), tot
        GROUP BY g.doc_id ORDER BY g.doc_id
        """
    ).df()
    merged = sp.merge(dk, on="doc_id", how="outer", suffixes=("_s", "_d"))
    both = merged.dropna()
    assert len(both) > 0
    assert (both.lm_logp_s - both.lm_logp_d).abs().max() < 1e-6


def test_null_id_docs_score_null_without_merging(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], "id long, text string"
    )
    model = lm.fit_trigram_lm(corpus, "text")
    docs = spark.createDataFrame(
        [(1, "the quick brown"), (None, "the quick brown"), (None, "zzzqqqxxx")],
        "id long, text string",
    )
    out = lm.score_lm(docs, model, "id", "text").collect()
    by_null = [r for r in out if r.id is None]
    assert len(by_null) == 2
    assert all(r.lm_logp is None for r in by_null)  # documented: unscoreable
    scored = next(r for r in out if r.id == 1)
    assert scored.lm_logp is not None
