"""Text-analysis operator semantics: token counting edge cases,
quality features on a hand-computed doc, language ID, fingerprints.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import textops


def one(df, col):
    return df.select(col).collect()[0][0]


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",), ("  padded   out  ",)],
        "t string",
    )
    out = df.select(textops.token_count("t").alias("n")).toPandas().n.tolist()
    assert out == [0, 0, 1, 2, 2]


def test_bpe_ish_count(spark):
    df = spark.createDataFrame([("ab12 cd!",)], "t string")
    # pieces: 'ab', '12', 'cd', '!' -> 4
    assert one(df, textops.bpe_ish_token_count("t").alias("n")) == 4


def test_quality_features_hand_computed(spark):
    text = "the cat sat"  # 11 chars, 3 tokens, 1 stopword, no punct/digits
    df = textops.quality_features(
        spark.createDataFrame([(text,)], "text string"), "text"
    )
    row = df.collect()[0]
    assert row.n_tokens == 3
    assert abs(row.avg_token_len - 11 / 3) < 1e-6
    assert row.punct_ratio == 0.0
    assert row.digit_ratio == 0.0
    assert abs(row.stopword_ratio - 1 / 3) < 1e-6
    # score: tok_len_ok=1, punct=1, digit=1, stop=min(5/3,1)=1 -> 1.0
    assert row.quality_score == 1.0


def test_quality_empty_text(spark):
    df = textops.quality_features(
        spark.createDataFrame([("",)], "text string"), "text"
    )
    row = df.collect()[0]
    assert row.n_tokens == 0
    assert row.avg_token_len == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is happy"),
            (2, "der Hund ist mit einem Ball und die Katze"),
            (3, "xyzzy plugh qwerty"),
        ],
        "id long, text string",
    )
    out = textops.lang_id(df, "text").toPandas().set_index("id")
    assert out.loc[1, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "de"
    assert out.loc[3, "lang_pred"] == "und"
    assert out.loc[3, "lang_score"] == 0.0


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "goodbye world")],
        "id long, text string",
    )
    out = textops.fingerprint(df, "text").toPandas().set_index("id").fingerprint
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_rolling_hash_fingerprint_stable(spark):
    df = spark.createDataFrame([(1, "some document text here")], "id long, text string")
    a = one(textops.rolling_hash_fingerprint(df, "text"), "winnow_fp")
    b = one(textops.rolling_hash_fingerprint(df, "text"), "winnow_fp")
    assert a == b and isinstance(a, int)


def test_chunk_documents_shapes(spark):
    import hashlib

    from clustering_spark.operators.textops import chunk_documents

    short = "x" * 80          # < size: one chunk, full length
    exact = "y" * 150         # == stride: exactly one chunk
    two = "z" * 151           # stride+1: second chunk of length 1
    empty = ""                # no chunks
    df = spark.createDataFrame(
        [(1, short), (2, exact), (3, two), (4, empty)],
        "doc_id long, text string",
    )
    out = (
        chunk_documents(df, "doc_id", "text", size=200, stride=150)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert out[out.doc_id == 4].empty
    assert list(out[out.doc_id == 1].chunk_len) == [80]
    assert list(out[out.doc_id == 2].chunk_len) == [150]
    assert list(out[out.doc_id == 3].chunk_len) == [151, 1]
    assert list(out[out.doc_id == 3].chunk_start) == [0, 150]
    assert (
        out[out.doc_id == 1].chunk_md5.iloc[0]
        == hashlib.md5(short.encode()).hexdigest()
    )


def test_chunk_documents_covers_text_with_overlap(spark):
    from clustering_spark.operators.textops import chunk_documents

    text = "".join(chr(97 + i % 26) for i in range(520))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = (
        chunk_documents(df, "doc_id", "text", size=200, stride=150)
        .toPandas()
        .sort_values("chunk_idx")
    )
    # starts advance by stride; chunks jointly cover every character
    assert list(out.chunk_start) == [0, 150, 300, 450]
    assert int(out.chunk_start.iloc[-1] + out.chunk_len.iloc[-1]) == len(text)


def test_chunk_documents_matches_python_chunker_property(spark):
    """Property (hypothesis): for arbitrary ASCII texts, the Spark
    chunker's (start, len, md5) triples equal a trivially-correct
    Python slicer."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from clustering_spark.operators.textops import chunk_documents

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        max_size=700,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(ascii_text, min_size=1, max_size=8), st.data())
    def prop(texts, data):
        size = data.draw(st.integers(min_value=1, max_value=300))
        stride = data.draw(st.integers(min_value=1, max_value=size))
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = (
            chunk_documents(df, "doc_id", "text", size=size, stride=stride)
            .toPandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        exp = []
        for i, t in enumerate(texts):
            for ci, s in enumerate(range(0, len(t), stride)):
                piece = t[s : s + size]
                exp.append(
                    (i, ci, s, len(piece), hashlib.md5(piece.encode()).hexdigest())
                )
        assert [tuple(r) for r in got.itertuples(index=False)] == sorted(exp)

    prop()


def test_quality_lang_aware_stopwords(spark):
    fr = "le chat est dans la maison et il dort"
    df = spark.createDataFrame([(fr, "fr"), (fr, "en"), (fr, "xx")],
                               "text string, lang string")
    out = textops.quality_features(df, "text", lang_col="lang").collect()
    by_lang = {r.lang: r.stopword_ratio for r in out}
    assert by_lang["fr"] > by_lang["en"]       # French stops now count
    assert by_lang["xx"] == by_lang["en"]      # unknown falls back to en
    # default (no lang_col) unchanged
    base = textops.quality_features(
        spark.createDataFrame([(fr,)], "text string"), "text"
    ).collect()[0]
    assert base.stopword_ratio == by_lang["en"]


def test_fingerprint_ignores_boundary_whitespace(spark):
    # collapse-then-trim: a trailing newline (ubiquitous in crawled
    # text) must not change the dedup key — the old trim-first order
    # left a boundary space ('hello' vs 'hello ') and the docs never
    # exact-deduped
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world\n"), (3, "\thello world "),
         (4, "hello world!")],
        "id long, text string",
    )
    out = textops.fingerprint(df, "text").toPandas().set_index("id").fingerprint
    assert out[1] == out[2] == out[3]
    assert out[1] != out[4]


def test_vertical_tab_whitespace_parity_with_duckdb(spark):
    """Java \\s includes \\x0B, RE2 \\s does not — the oracles spell
    whitespace as an explicit class. Pin that a vertical-tab document
    tokenizes and fingerprints identically in both engines."""
    import duckdb

    text = "A\x0bB  c\n"
    row = (
        spark.createDataFrame([(text,)], "t string")
        .select(
            F.size(textops.tokens("t")).alias("n"),
            textops.fingerprint_expr("t").alias("fp"),
        )
        .collect()[0]
    )
    ws = "[ \\t\\n\\x0b\\f\\r]"
    duck = duckdb.connect().execute(
        f"""
        SELECT len(string_split_regex(
                 regexp_replace(?, '^{ws}+|{ws}+$', '', 'g'), '{ws}+')) AS n,
               md5(trim(regexp_replace(lower(?), '{ws}+', ' ', 'g'))) AS fp
        """,
        [text, text],
    ).fetchone()
    assert row.n == duck[0] == 3
    assert row.fp == duck[1]


def test_quality_score_zero_for_empty_whitespace_null(spark):
    """Zero-token text must score 0.0, not 0.5: the per-signal 0.0
    fallbacks averaged to 0.5, ABOVE the default 0.25 gate, so empty
    and NULL documents passed every downstream quality filter."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n\t "), (3, None), (4, "the cat sat on the mat")],
        "id long, text string",
    )
    out = {r.id: r.quality_score for r in textops.quality_features(df, "text").collect()}
    assert out[1] == 0.0
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] > 0.25
