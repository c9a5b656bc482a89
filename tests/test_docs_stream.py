"""Streaming novelty dedup: availableNow replay over a staged
documents directory — in-stream duplicate collapse, corpus anti-join,
and parity with the batch novel_exact survivor set.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import dedup
from clustering_spark.streaming import docs_stream
from clustering_spark.streaming.events_stream import run_stream_to_memory

DOC_A = "The quick brown fox jumps over the lazy dog in the morning."
DOC_B = "Streaming watermarks bound aggregation state for late events."
DOC_C = "A fresh document that appears nowhere else in this test set."


@pytest.fixture()
def staged(spark, tmp_path):
    new = spark.createDataFrame(
        [
            (1, DOC_A),
            (2, "  " + DOC_A.upper()),  # normalized dup of 1
            (3, DOC_B),                 # already in corpus
            (4, DOC_C),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_src")
    new.coalesce(1).write.parquet(src)
    corpus = spark.createDataFrame([(100, DOC_B)], "doc_id long, text string")
    return src, new.schema, corpus


def test_stream_novelty_matches_batch(spark, staged, tmp_path):
    src, schema, corpus = staged
    stream = docs_stream.read_documents_stream(spark, src, schema)
    novel = docs_stream.novel_documents_stream(
        stream, docs_stream.corpus_fingerprint_table(corpus, "text")
    )
    run_stream_to_memory(
        novel.select("doc_id", "fingerprint"),
        "novel_docs_t",
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM novel_docs_t").collect()
    }
    # one of {1,2} survives the in-stream fingerprint dedup (whichever
    # the state store saw first), 3 dies on the corpus anti-join, 4 is
    # novel
    assert 4 in got and 3 not in got
    assert len(got & {1, 2}) == 1
    # batch parity: same survivor COUNT as novel_exact (batch picks
    # min-id deterministically; stream picks first-seen)
    batch = dedup.novel_exact(
        spark.read.parquet(src), corpus, "doc_id", "text"
    )
    assert batch.count() == len(got)


def test_stream_novelty_without_corpus(spark, staged, tmp_path):
    src, schema, _ = staged
    stream = docs_stream.read_documents_stream(spark, src, schema)
    novel = docs_stream.novel_documents_stream(stream, None)
    run_stream_to_memory(
        novel.select("doc_id"),
        "novel_docs_nc_t",
        str(tmp_path / "ckpt2"),
        output_mode="append",
    )
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM novel_docs_nc_t").collect()
    }
    assert 3 in got and 4 in got and len(got) == 3


def test_stream_prep_gates_and_redacts(spark, tmp_path):
    good = (
        "Contact jane.doe@example.com about the dataset and cite the "
        "archive when publishing any results derived from these files."
    )
    junk = "spam spam spam spam spam spam spam spam spam spam"
    df = spark.createDataFrame(
        [(1, good), (2, junk), (3, good)],  # 3 dups 1 after normalize
        "doc_id long, text string",
    )
    src = str(tmp_path / "prep_src")
    df.coalesce(1).write.parquet(src)
    stream = docs_stream.read_documents_stream(spark, src, df.schema)
    prepped = docs_stream.prep_documents_stream(
        stream, "text", min_quality_score=0.0, max_top_token_ratio=0.5
    )
    run_stream_to_memory(
        prepped.select("doc_id", "text"),
        "prep_docs_t",
        str(tmp_path / "ckpt3"),
        output_mode="append",
    )
    rows = spark.sql("SELECT doc_id, text FROM prep_docs_t").collect()
    ids = {r.doc_id for r in rows}
    assert 2 not in ids              # repetition gate
    assert len(ids & {1, 3}) == 1    # fingerprint dedup collapses dup
    assert all("<EMAIL>" in r.text for r in rows)  # redacted at ingest
    assert all("jane.doe@example.com" not in r.text for r in rows)


def test_watermarked_novelty_bounded_state(spark, tmp_path):
    """With a watermark, in-window duplicates still collapse and the
    query plans dropDuplicatesWithinWatermark (evictable state)."""
    from datetime import datetime

    rows = [
        (1, DOC_A, datetime(2026, 1, 1, 10, 0, 0)),
        (2, DOC_A, datetime(2026, 1, 1, 10, 5, 0)),   # dup inside window
        (3, DOC_C, datetime(2026, 1, 1, 11, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "wm_src")
    df.coalesce(1).write.parquet(src)
    stream = docs_stream.read_documents_stream(spark, src, df.schema)
    novel = docs_stream.novel_documents_stream(
        stream, None, watermark_col="ts", watermark_delay="30 minutes"
    )
    run_stream_to_memory(
        novel.select("doc_id"),
        "novel_docs_wm_t",
        str(tmp_path / "ckpt_wm"),
        output_mode="append",
    )
    got = {
        r.doc_id for r in spark.sql("SELECT doc_id FROM novel_docs_wm_t").collect()
    }
    assert 3 in got
    assert len(got & {1, 2}) == 1  # in-window dup collapsed


def test_corpus_fingerprints_match_prepped_stream_text(spark):
    """The matching-transform contract: a RAW corpus doc containing
    PII must still block its streaming duplicate when the digest table
    applies the same normalize+redact transforms."""
    corpus = spark.createDataFrame(
        [(1, "Contact jane.doe@example.com  for the   report")],
        "doc_id long, text string",
    )
    raw_fp = docs_stream.corpus_fingerprint_table(corpus, "text").collect()
    prepped_fp = docs_stream.corpus_fingerprint_table(
        corpus, "text", normalize=True, redact=True
    ).collect()
    assert raw_fp[0].fingerprint != prepped_fp[0].fingerprint

    # the prepped digest equals what prep_documents_stream computes
    from clustering_spark.operators import textnorm, textops

    streamed = corpus.withColumn("text", textnorm.normalize_text("text"))
    streamed = textnorm.redact_pii(streamed, "text", out_col="text")
    stream_fp = streamed.select(
        textops.fingerprint_expr("text").alias("fingerprint")
    ).collect()
    assert stream_fp[0].fingerprint == prepped_fp[0].fingerprint


def test_stream_null_text_matches_batch_sentinel(spark, tmp_path):
    """Stream/batch parity for NULL-content docs: the corpus digest and
    the stream fingerprint both coalesce NULL to the 0x00 sentinel, so
    a NULL-text doc already in the corpus is NOT re-admitted as novel
    (batch novel_exact semantics)."""
    from clustering_spark.operators import textops

    corpus = spark.createDataFrame(
        [(100, None), (101, "known doc text")], "doc_id long, text string"
    )
    corp_fp = docs_stream.corpus_fingerprint_table(corpus, "text")
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(1, None), (2, "brand new text")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(src)
    schema = "doc_id long, text string"
    stream = docs_stream.read_documents_stream(spark, src, schema)
    novel = docs_stream.novel_documents_stream(stream, corp_fp)
    from clustering_spark.streaming.events_stream import run_stream_to_memory

    run_stream_to_memory(
        novel, "nullfp_novel", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = {r.doc_id for r in spark.table("nullfp_novel").collect()}
    assert got == {2}  # NULL-text doc matched the corpus NULL doc


def test_novelty_rejects_ambiguous_corpus_frame(spark, tmp_path):
    """A multi-column corpus frame without a 'fingerprint' column must
    raise — columns[0] silently disabled the novelty filter."""
    import pytest as _pytest

    src = str(tmp_path / "docs_in2")
    spark.createDataFrame(
        [(1, "text one")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(src)
    stream = docs_stream.read_documents_stream(
        spark, src, "doc_id long, text string"
    )
    bad_corpus = spark.createDataFrame(
        [(9, "text one", "deadbeef")],
        "doc_id long, text string, something string",
    )
    with _pytest.raises(ValueError, match="fingerprint"):
        docs_stream.novel_documents_stream(stream, bad_corpus)


def test_prepped_stream_drops_gate_scratch_columns(spark, tmp_path):
    src = str(tmp_path / "docs_in3")
    spark.createDataFrame(
        [(1, "a perfectly ordinary document with plenty of words here")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    stream = docs_stream.read_documents_stream(
        spark, src, "doc_id long, text string"
    )
    prepped = docs_stream.prep_documents_stream(stream, "text", min_quality_score=0.0)
    assert set(prepped.columns) == {"doc_id", "text", "fingerprint"}


def test_bpe_ids_compose_onto_stream(spark, staged, tmp_path):
    """Round 15: the trainer-input id layer composes onto a document
    STREAM — bpe_encode_ids is a stateless mapInPandas, so the same
    pinned model that gates the batch entry tokenizes an availableNow
    replay with batch-identical ids (the streaming form of the
    learn-tiny/apply-wide contract: train offline, apply on the
    ingest stream)."""
    from clustering_spark.operators.bpe import (
        EOS,
        PAD,
        UNK,
        bpe_encode_ids,
    )
    from clustering_spark.pinned import bpe_model

    src, schema, _ = staged
    model = bpe_model()
    stream = (
        spark.readStream.schema(schema).parquet(src)
    )
    enc = bpe_encode_ids(stream, "text", model, specials=(UNK, PAD, EOS))
    assert enc.isStreaming
    name = f"bpe_stream_{os.getpid()}"
    run_stream_to_memory(
        enc.select("doc_id", "bpe_ids"),
        name,
        str(tmp_path / "ckpt_bpe"),
        output_mode="append",
    )
    got = {
        r.doc_id: list(r.bpe_ids)
        for r in spark.sql(f"select * from {name}").collect()
    }
    batch = bpe_encode_ids(
        spark.read.parquet(src), "text", model, specials=(UNK, PAD, EOS)
    ).collect()
    want = {r.doc_id: list(r.bpe_ids) for r in batch}
    assert got == want and len(got) == 4


def test_novelty_rejects_unnamed_single_column_frame(spark, tmp_path):
    """Round-16 review: the single-column fallback accepted
    corpus.select('doc_id') — numeric-id strings never equal md5
    digests, so the anti-join filtered nothing and every duplicate
    re-entered as 'novel'. The column must now be NAMED fingerprint."""
    import pytest as _pytest

    src = str(tmp_path / "docs_in3")
    spark.createDataFrame(
        [(1, "text one")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(src)
    stream = docs_stream.read_documents_stream(
        spark, src, "doc_id long, text string"
    )
    ids_only = spark.createDataFrame([(9,)], "doc_id long")
    with _pytest.raises(ValueError, match="fingerprint"):
        docs_stream.novel_documents_stream(stream, ids_only)
