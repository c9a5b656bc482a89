"""Streaming document ingestion with novelty dedup — the streaming
face of the batch trainprep chain: as document files land, keep only
texts that are new both within the stream (state-backed fingerprint
dedup) and against a static reference corpus (stream-static anti-join).

Scale/state design:
- the dedup key is the 32-char content fingerprint, NOT the text, so
  the state store holds ~50 B/doc;
- ``dropDuplicates`` state is unbounded by design here (exact novelty
  has no time horizon); callers that can tolerate a horizon should
  pass ``watermark_col``/``delay`` to bound state with
  dropDuplicatesWithinWatermark semantics instead;
- the corpus side of the anti-join is a STATIC DataFrame of
  fingerprints (16-byte digests, typically broadcast) — Spark
  re-plans the static side per micro-batch, so a corpus refresh is a
  re-read away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(text_col: str) -> F.Column:
    """Delegates to textops.fingerprint_expr — ONE definition of the
    dedup key shared by batch, stream, and the corpus digest table
    (there is no import cycle: this module already imports the batch
    operators in prep_documents_stream).

    NULL text coalesces to the same 0x00 sentinel batch novel_exact
    uses, so NULL-content docs compare EQUAL everywhere: without it
    the stream's left_anti never matched a corpus NULL doc (NULL !=
    NULL) while dropDuplicates treated stream NULLs as equal — the
    stream/batch divergence this shared helper exists to prevent."""
    from clustering_spark.operators.textops import fingerprint_expr

    return F.coalesce(fingerprint_expr(text_col), F.lit("\x00"))


def read_documents_stream(
    spark, src_dir: str, schema, text_col: str = "text"
) -> DataFrame:
    """File-source stream of documents with the fingerprint column
    appended at ingest (scan-speed, before any stateful operator)."""
    raw = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    return raw.withColumn("fingerprint", _fingerprint(text_col))


def novel_documents_stream(
    docs: DataFrame,
    corpus_fingerprints: DataFrame | None = None,
    watermark_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stream-side novelty: state-backed exact dedup on the
    fingerprint, then (optionally) a stream-static left_anti join
    against the corpus fingerprint table. Returns a streaming frame of
    first-seen novel documents; sink it with run_stream_to_memory /
    run_stream_to_parquet (append mode).

    State bound: without ``watermark_col`` the dedup state grows with
    the distinct-fingerprint count (exact novelty has no horizon —
    size it as ~50 B x distinct docs). With ``watermark_col`` (an
    event-time column) + ``watermark_delay``, state switches to
    dropDuplicatesWithinWatermark: fingerprints older than the
    watermark are evicted, so state holds only the delay window — the
    right mode when the standing corpus anti-join (refreshed
    periodically) already covers older history."""
    if watermark_col is not None:
        deduped = docs.withWatermark(
            watermark_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["fingerprint"])
    else:
        deduped = docs.dropDuplicates(["fingerprint"])
    if corpus_fingerprints is None:
        return deduped
    # select the fingerprint column BY NAME: blindly taking columns[0]
    # silently disabled the novelty filter when a caller passed a full
    # document frame (columns[0] = doc_id — md5 strings never match
    # numeric ids, every duplicate re-admitted as 'novel')
    # the column must be NAMED 'fingerprint' — no single-column
    # fallback (round-16 review: corpus.select('doc_id') is a
    # single-column frame too, and numeric-id strings never equal md5
    # digests, so the left_anti filtered NOTHING and every corpus
    # duplicate re-entered as 'novel'; the name requirement makes the
    # caller state what the values are)
    if "fingerprint" not in corpus_fingerprints.columns:
        raise ValueError(
            "corpus_fingerprints needs a 'fingerprint' column; got "
            f"{corpus_fingerprints.columns} — pass "
            "corpus_fingerprint_table(...)'s output (or alias your "
            "fingerprint column to 'fingerprint')"
        )
    corp = corpus_fingerprints.select("fingerprint").distinct()
    return deduped.join(corp, on="fingerprint", how="left_anti")


def corpus_fingerprint_table(
    corpus: DataFrame,
    text_col: str,
    normalize: bool = False,
    redact: bool = False,
) -> DataFrame:
    """Static-side digest table for novel_documents_stream — compute
    once, persist, broadcast-join per micro-batch.

    MATCHING-TRANSFORM CONTRACT: fingerprints only match when both
    sides hash the SAME text shape. prep_documents_stream fingerprints
    AFTER normalize_text (+ redact_pii), so feed this function either
    the prepped corpus (the stream's own sunk output — the normal
    lambda loop, already transformed) with the defaults, or a RAW
    corpus with ``normalize=True``/``redact=True`` to apply the same
    transforms here; otherwise every PII- or control-char-bearing
    duplicate slips the anti-join as 'novel'."""
    from clustering_spark.operators import textnorm

    t = corpus
    if normalize:
        t = t.withColumn(text_col, textnorm.normalize_text(text_col))
    if redact:
        t = textnorm.redact_pii(t, text_col, out_col=text_col)
    return t.select(_fingerprint(text_col).alias("fingerprint")).distinct()


def prep_documents_stream(
    docs: DataFrame,
    text_col: str = "text",
    corpus_fingerprints: DataFrame | None = None,
    min_quality_score: float = 0.25,
    max_top_token_ratio: float = 0.5,
    redact: bool = True,
    watermark_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming face of trainprep's scan stages: normalize + redact +
    quality/repetition gate, then the novelty stage. Every gate
    expression is a stateless per-row projection (textnorm/textops are
    pure column functions), so they ride the stream with NO extra
    state — the only stateful operator remains the fingerprint
    dropDuplicates inside novel_documents_stream.

    Near-dup collapse and packing are deliberately absent: both need
    cross-document state proportional to the corpus (LSH band tables,
    open packs) and belong in a periodic batch compaction over the
    sunk output, not in the ingest stream. This split — stateless
    hygiene at ingest, heavy dedup in batch behind it — is the
    standard lambda shape for corpus pipelines."""
    from clustering_spark.operators import textnorm, textops

    cleaned = docs.withColumn(text_col, textnorm.normalize_text(text_col))
    if redact:
        cleaned = textnorm.redact_pii(cleaned, text_col, out_col=text_col)
    gated = (
        textnorm.repetition_signals(
            textops.quality_features(cleaned, text_col), text_col
        )
        .filter(
            (F.col("quality_score") >= min_quality_score)
            & (F.col("top_token_ratio") <= max_top_token_ratio)
        )
    )
    # drop the gate's scratch columns after the filter: sinking ~10
    # scoring intermediates with every document bloats the persisted
    # corpus and couples its schema to the gate internals
    gated = gated.select(*docs.columns)
    # fingerprint AFTER normalization/redaction so the dedup key meets
    # the same text the sink stores; corpus_fingerprint_table documents
    # the matching-transform contract for the static side
    gated = gated.withColumn("fingerprint", _fingerprint(text_col))
    return novel_documents_stream(
        gated,
        corpus_fingerprints,
        watermark_col=watermark_col,
        watermark_delay=watermark_delay,
    )
