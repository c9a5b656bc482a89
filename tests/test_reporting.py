"""Corpus data-card report: overall totals, duplication estimate, PII
fraction, and per-stratum shares against hand-computable fixtures.
"""

from __future__ import annotations

from clustering_spark.operators.reporting import corpus_report


def _corpus(spark):
    doc = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, doc, "en", "web"),
        (2, doc, "en", "web"),              # exact dup of 1
        (3, doc.upper(), "en", "books"),    # dup after case-normalization
        (4, "completely different content with plenty of words here", "en", "books"),
        (5, "mail me at a.b@example.com about the dataset license", "de", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_overall_summary(spark):
    rep = corpus_report(_corpus(spark), strata_cols=("lang", "source"))
    o = rep["overall"].collect()[0]
    assert o.n_docs == 5
    assert o.total_tokens > 0 and o.total_chars > 0
    # 3 distinct fingerprints among 5 docs (1,2,3 collapse)
    assert o.approx_distinct_fingerprints == 3
    assert abs(o.est_dup_frac - (1 - 3 / 5)) < 0.05
    assert o.docs_with_pii == 1
    assert abs(o.pii_doc_frac - 0.2) < 1e-6
    assert 0.0 <= o.quality_p10 <= o.quality_p50 <= o.quality_p90 <= 1.0


def test_per_stratum_shares(spark):
    rep = corpus_report(_corpus(spark), strata_cols=("lang",))
    by_lang = {r.lang: r for r in rep["by_lang"].collect()}
    assert by_lang["en"].n_docs == 4 and by_lang["de"].n_docs == 1
    assert abs(sum(r.token_share for r in by_lang.values()) - 1.0) < 1e-4


def test_features_frame_carries_gate_columns(spark):
    cols = set(corpus_report(_corpus(spark))["features"].columns)
    assert {"quality_score", "fingerprint", "n_pii_total", "n_tokens"} <= cols


def test_corpus_report_empty_corpus(spark):
    """An empty corpus still yields a 1-row overall summary with
    zeroed counts (report jobs run on empty partitions too)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    rep = corpus_report(empty, strata_cols=("doc_id",))
    o = rep["overall"].collect()[0]
    assert o.n_docs == 0
    assert rep["by_doc_id"].count() == 0


def test_null_text_docs_are_one_dup_class_not_all_dups(spark):
    """NULL-text docs must count as ONE distinct fingerprint class:
    before the sentinel, a unique corpus with 40% NULL texts reported
    est_dup_frac ~= 0.4."""
    from clustering_spark.operators.reporting import corpus_report

    rows = [(i, f"unique document number {i} about topic {i}") for i in range(60)]
    rows += [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    o = corpus_report(df)["overall"].collect()[0]
    assert o.n_docs == 100
    # dedup_exact semantics: the 40 NULL docs are ONE content class,
    # i.e. 39 true duplicates -> 61 distinct / 100 docs, frac ~ 0.39
    # (the pre-fix bug EXCLUDED NULLs from distinct while counting
    # them in n, which is the same number for this corpus but 0.40 for
    # a corpus of 100% unique NULL-free docs plus NULL rows — the
    # clean-corpus assertion below is the discriminating check)
    assert 0.3 <= o.est_dup_frac <= 0.45
    # and a fully-unique corpus reports ~0
    clean = spark.createDataFrame(rows[:60], "doc_id long, text string")
    o2 = corpus_report(clean)["overall"].collect()[0]
    assert o2.est_dup_frac <= 0.05


def test_corpus_report_empty_corpus_all_zero(spark):
    """Empty corpus: every overall count is 0, never a NULL/0 mix."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    rep = corpus_report(empty, "text")
    row = rep["overall"].collect()[0]
    assert row.n_docs == 0
    assert row.total_tokens == 0
    assert row.total_chars == 0
    assert row.docs_with_pii == 0
    assert row.est_dup_frac == 0.0 and row.pii_doc_frac == 0.0


def test_est_dup_frac_never_negative(spark):
    """HLL overestimation on a unique corpus must clamp at 0, not
    report negative duplication."""
    rows = [(i, f"unique document number {i} with its own words") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = corpus_report(df, "text")["overall"].collect()[0]
    assert row.est_dup_frac >= 0.0


def test_empty_corpus_reports_zero_quality_percentiles(spark):
    # contract: an empty corpus reports 0 everywhere, never a NULL/0
    # mix that trips float() in a card renderer
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = corpus_report(empty)["overall"].collect()[0]
    assert row.n_docs == 0 and row.total_tokens == 0
    assert row.quality_p10 == 0.0 and row.quality_p50 == 0.0 and row.quality_p90 == 0.0
