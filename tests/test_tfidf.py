"""Relational TF-IDF semantics: hand-computed values, min_df pruning,
per-doc top-k, a DuckDB cross-check on real testdata, and cap_per_group
determinism.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import sampling, textops

from tests.conftest import SF_DIR


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_hand_computed(spark, docs):
    out = {
        (r.doc_id, r.term): r
        for r in textops.tfidf_terms(docs, "doc_id", "text").collect()
    }
    # apple: tf=2 in doc 1, df=1, N=3 -> idf = ln(4/2)+1
    r = out[(1, "apple")]
    assert r.tf == 2 and r.df == 1
    assert abs(r.tfidf - round(2 * (math.log(4 / 2) + 1), 6)) < 1e-9
    # banana: df=2 -> idf = ln(4/3)+1; tf=1 in both docs
    for d in (1, 2):
        r = out[(d, "banana")]
        assert r.tf == 1 and r.df == 2
        assert abs(r.tfidf - round(math.log(4 / 3) + 1, 6)) < 1e-9
    # cherry tf=3 in doc 3
    assert out[(3, "cherry")].tf == 3


def test_tfidf_min_df_prunes(spark, docs):
    out = textops.tfidf_terms(docs, "doc_id", "text", min_df=2)
    terms = {r.term for r in out.collect()}
    assert terms == {"banana", "cherry"}  # apple/durian are df=1


def test_tfidf_top_terms_per_doc(spark, docs):
    out = textops.tfidf_terms(docs, "doc_id", "text", top_terms_per_doc=1)
    rows = {r.doc_id: r.term for r in out.collect()}
    assert rows[1] == "apple"   # tf=2, rare
    assert rows[3] == "cherry"  # tf=3
    assert out.count() == 3     # exactly one term per doc


def test_tfidf_matches_duckdb_on_documents(spark):
    sp = (
        textops.tfidf_terms(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id", "text"
        )
        .orderBy("doc_id", "term")
        .toPandas()
    )
    dk = duckdb.connect().execute(
        rf"""
        WITH toks AS (
          SELECT doc_id, lower(u.t) AS term
          FROM read_parquet('{SF_DIR}/documents.parquet'),
               unnest(CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                           ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END) AS u(t)),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS nd
              FROM read_parquet('{SF_DIR}/documents.parquet'))
        SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
               round(tf.tf * (ln((n.nd + 1.0)/(dfq.df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN dfq USING (term), n
        ORDER BY doc_id, term
        """
    ).df()
    assert len(sp) == len(dk)
    assert (sp.tf.to_numpy() == dk.tf.to_numpy()).all()
    assert (sp.df.to_numpy() == dk.df.to_numpy()).all()
    assert (abs(sp.tfidf.to_numpy() - dk.tfidf.to_numpy()) < 1e-9).all()


def test_cap_per_group(spark):
    df = spark.range(1000).withColumn("grp", (F.col("id") % 4).cast("int"))
    out = sampling.cap_per_group(df, "grp", "id", 10)
    counts = {r.grp: r.n for r in
              out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    # deterministic under repartitioning
    out2 = sampling.cap_per_group(df.repartition(13), "grp", "id", 10)
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in out2.collect()
    )
    # small groups survive whole
    tiny = spark.createDataFrame([(1, "a"), (2, "a")], "id long, grp string")
    assert sampling.cap_per_group(tiny, "grp", "id", 10).count() == 2
