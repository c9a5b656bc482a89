"""Normalization / PII / repetition-signal semantics: hand-computed
docs plus a DuckDB cross-check of every signal that rides the oracle
gate (the same SQL shapes used in queries.SQL_TEXT_QUALITY).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import textnorm

from tests.conftest import SF_DIR


def one(df, col="v"):
    return df.collect()[0][col]


def test_normalize_text(spark):
    df = spark.createDataFrame([("  a\t\tb\x00c\n  d  ",)], "t string")
    out = one(df.select(textnorm.normalize_text("t").alias("v")))
    assert out == "a bc d"


def test_normalize_lowercase_matches_fingerprint_norm(spark):
    df = spark.createDataFrame([("  Mixed   CASE\ttext ",)], "t string")
    out = one(df.select(textnorm.normalize_text("t", lowercase=True).alias("v")))
    assert out == "mixed case text"


def test_pii_counts_and_redaction(spark):
    text = (
        "mail a@b.com or x.y-z@sub.example.org, call 555-123-4567, "
        "ssn 123-45-6789, host 10.0.0.1"
    )
    df = spark.createDataFrame([(text,)], "t string")
    row = textnorm.pii_counts(df, "t").collect()[0]
    assert row.n_pii_email == 2
    assert row.n_pii_phone == 1
    assert row.n_pii_ssn == 1
    assert row.n_pii_ipv4 == 1
    assert row.n_pii_total == 5

    red = one(textnorm.redact_pii(df, "t").select(F.col("text_redacted").alias("v")))
    assert "<EMAIL>" in red and "<PHONE>" in red and "<SSN>" in red and "<IP>" in red
    assert "a@b.com" not in red and "123-45-6789" not in red and "10.0.0.1" not in red


def test_redaction_order_ssn_not_eaten_by_phone(spark):
    # 123-45-6789 must become <SSN>, not a partial phone redaction
    df = spark.createDataFrame([("id 123-45-6789 end",)], "t string")
    red = one(textnorm.redact_pii(df, "t").select(F.col("text_redacted").alias("v")))
    assert red == "id <SSN> end"


def test_repetition_signals_hand_computed(spark):
    # 4 non-empty lines, 2 distinct -> dup_line_ratio 0.5
    # tokens: a b a b a b -> 2-grams: ab ba ab ba ab (5 total, 2 distinct)
    text = "a b a b\na b a b\nx\nx"
    df = spark.createDataFrame([(text.replace("\\n", "\n"),)], "t string")
    row = textnorm.repetition_signals(df, "t").collect()[0]
    assert abs(row.dup_line_ratio - 0.5) < 1e-6
    # tokens across lines: a b a b a b a b x x (split on \s+ incl \n)
    # 2-grams: 9 total -> [ab,ba]*... distinct = {ab, ba, bx, xx} = 4
    assert abs(row.rep_2gram_ratio - (1 - 4 / 9)) < 1e-6
    # top token: a or b, 4/10 occurrences
    assert abs(row.top_token_ratio - 0.4) < 1e-6


def test_repetition_signals_empty_and_single(spark):
    df = spark.createDataFrame([("",), ("word",)], "t string")
    rows = textnorm.repetition_signals(df, "t").collect()
    for r in rows[:1]:
        assert r.dup_line_ratio == 0.0
        assert r.rep_2gram_ratio == 0.0
        assert r.top_token_ratio == 0.0
    assert rows[1].top_token_ratio == 1.0
    assert rows[1].rep_2gram_ratio == 0.0


def test_top_token_case_insensitive(spark):
    df = spark.createDataFrame([("The the THE word",)], "t string")
    row = textnorm.repetition_signals(df, "t").collect()[0]
    assert abs(row.top_token_ratio - 0.75) < 1e-6


def test_signals_match_duckdb_on_documents(spark):
    """Cross-check the oracle SQL shapes on real testdata."""
    sp = (
        textnorm.pii_counts(
            textnorm.repetition_signals(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"), "text"
            ),
            "text",
        )
        .select(
            "doc_id", "dup_line_ratio", "rep_2gram_ratio", "top_token_ratio",
            "n_pii_email", "n_pii_total",
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    dk = con.execute(
        rf"""
        WITH base AS (
          SELECT doc_id, text,
                 list_filter(string_split(text, chr(10)),
                             x -> len(trim(x)) > 0) AS lines,
                 CASE WHEN len(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END AS tk
          FROM read_parquet('{SF_DIR}/documents.parquet')),
        g AS (
          SELECT doc_id, text, lines, tk,
                 CASE WHEN len(tk) >= 2 THEN
                   list_transform(range(1, len(tk)),
                     i -> tk[i] || chr(31) || tk[i+1])
                 ELSE CAST([] AS VARCHAR[]) END AS grams,
                 list_sort(list_transform(tk, x -> lower(x))) AS st
          FROM base)
        SELECT doc_id,
          round(CASE WHEN len(lines) > 0
            THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
            ELSE 0.0 END, 6) AS dup_line_ratio,
          round(CASE WHEN len(grams) > 0
            THEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
            ELSE 0.0 END, 6) AS rep_2gram_ratio,
          round(CASE WHEN len(tk) > 0 THEN
            (SELECT max(cnt) FROM (
               SELECT count(*) AS cnt FROM unnest(st) AS u(w) GROUP BY w))::DOUBLE
            / len(tk) ELSE 0.0 END, 6) AS top_token_ratio,
          len(regexp_extract_all(text,
            '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{{2,}}')) AS n_pii_email
        FROM g ORDER BY doc_id
        """
    ).df()
    assert len(sp) == len(dk)
    for col in ["dup_line_ratio", "rep_2gram_ratio", "top_token_ratio"]:
        assert (sp[col] - dk[col]).abs().max() < 1e-6, col
    assert (sp["n_pii_email"].astype("int64") == dk["n_pii_email"].astype("int64")).all()


def test_extract_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://Example.COM/page and http://sub.test.org?q=1 twice "
                "https://example.com/other"),
            (2, "no urls here"),
        ],
        "id long, t string",
    )
    out = {r.id: sorted(r.domains) for r in
           textnorm.extract_domains(df, "t").collect()}
    assert out[1] == ["example.com", "sub.test.org"]
    assert out[2] == []


def test_domain_blocklist_subdomains_and_survivors(spark):
    df = spark.createDataFrame(
        [
            (1, "link https://ads.example.com/x"),   # subdomain of blocked
            (2, "link https://example.com/y"),        # exact blocked
            (3, "link https://examples.com/z"),       # NOT a subdomain match
            (4, "link https://good.org/a"),
            (5, "plain text, no urls"),
        ],
        "id long, t string",
    )
    blocked = spark.createDataFrame([("Example.com",)], "domain string")
    out = sorted(
        r.id
        for r in textnorm.filter_domain_blocklist(df, "id", "t", blocked).collect()
    )
    assert out == [3, 4, 5]


def test_domain_blocklist_empty_blocklist_keeps_all(spark):
    df = spark.createDataFrame([(1, "x https://a.com")], "id long, t string")
    blocked = spark.createDataFrame([], "domain string")
    assert textnorm.filter_domain_blocklist(df, "id", "t", blocked).count() == 1


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "id long, src string, text string")


def test_strip_boilerplate_removes_frequent_lines(spark):
    footer = "(c) example inc - all rights reserved"
    rows = [
        (i, "siteA", f"unique content {i}\n{footer}") for i in range(10)
    ] + [(100, "siteA", "no footer here")]
    out = {
        r.id: r.text_clean
        for r in textnorm.strip_boilerplate(
            _mk_docs(spark, rows), "id", "text", "src", min_docs=5,
            max_doc_frac=0.5,
        ).collect()
    }
    for i in range(10):
        assert out[i] == f"unique content {i}"  # footer stripped
    assert out[100] == "no footer here"


def test_strip_boilerplate_group_scoped(spark):
    # the same line is boilerplate on siteA but unique on siteB
    shared = "subscribe to our newsletter"
    rows = [(i, "siteA", f"a{i}\n{shared}") for i in range(6)] + [
        (50, "siteB", f"b-doc\n{shared}")
    ] + [(51 + i, "siteB", f"other {i}") for i in range(6)]
    out = {
        r.id: r.text_clean
        for r in textnorm.strip_boilerplate(
            _mk_docs(spark, rows), "id", "text", "src", min_docs=5,
            max_doc_frac=0.5,
        ).collect()
    }
    assert all(shared not in out[i] for i in range(6))
    assert shared in out[50]  # siteB: 1/7 docs -> kept


def test_strip_boilerplate_small_groups_untouched(spark):
    rows = [(1, "tiny", "x\ny"), (2, "tiny", "x\nz")]
    out = {
        r.id: r.text_clean
        for r in textnorm.strip_boilerplate(
            _mk_docs(spark, rows), "id", "text", "src", min_docs=5
        ).collect()
    }
    assert out[1] == "x\ny" and out[2] == "x\nz"


def test_strip_boilerplate_preserves_order_and_duplicate_lines(spark):
    # a NON-boilerplate line repeated within one doc stays repeated,
    # in order
    rows = [(i, "s", f"u{i}\ncommon") for i in range(6)] + [
        (99, "s", "keep\nkeep\nunique1")
    ]
    out = {
        r.id: r.text_clean
        for r in textnorm.strip_boilerplate(
            _mk_docs(spark, rows), "id", "text", "src", min_docs=5,
            max_doc_frac=0.6,
        ).collect()
    }
    assert out[99] == "keep\nkeep\nunique1"
    assert out[0] == "u0"


def test_repetition_signals_property_vs_python(spark):
    """Hypothesis sweep: the native column expressions agree with a
    direct Python computation on arbitrary small texts (batched into
    ONE Spark job — a job per example would take minutes)."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    texts_strategy = st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab x\n.")), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=40,
    )

    def py_signals(text):
        lines = [x for x in text.split("\n") if x.strip()]
        dup_line = 1 - len(set(lines)) / len(lines) if lines else 0.0
        toks = _re.split(r"\s+", text.strip()) if text.strip() else []
        grams = [
            toks[i] + "\x1f" + toks[i + 1] for i in range(len(toks) - 1)
        ]
        rep2 = 1 - len(set(grams)) / len(grams) if grams else 0.0
        low = [t.lower() for t in toks]
        top = max((low.count(w) for w in set(low)), default=0)
        topr = top / len(toks) if toks else 0.0
        return round(dup_line, 6), round(rep2, 6), round(topr, 6)

    @settings(max_examples=30, deadline=None)
    @given(texts=texts_strategy)
    def check(texts):
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "i long, t string")
        got = {
            r.i: (r.dup_line_ratio, r.rep_2gram_ratio, r.top_token_ratio)
            for r in textnorm.repetition_signals(df, "t").collect()
        }
        for i, t in enumerate(texts):
            exp = py_signals(t)
            for g, e in zip(got[i], exp):
                assert abs(g - e) < 1e-6, (t, got[i], exp)

    check()


def test_normalize_unicode_nfc(spark):
    decomposed = "cafe\u0301"  # e + combining acute
    precomposed = "caf\u00e9"  # precomposed e-acute
    assert decomposed != precomposed  # the two encodings really differ
    df = spark.createDataFrame(
        [(1, decomposed), (2, precomposed), (3, None)], "id long, t string"
    )
    out = {r.id: r.t for r in
           textnorm.normalize_unicode(df, "t", "NFC").collect()}
    assert out[1] == precomposed == out[2]
    assert out[3] is None
    # fingerprint now agrees across the two encodings
    fp = textnorm.normalize_unicode(df.filter("t IS NOT NULL"), "t", "NFC")
    fps = {
        r.id: r.fp
        for r in fp.select(
            "id", F.md5(F.lower(F.col("t"))).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2]


def test_normalize_unicode_bad_form(spark):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    with pytest.raises(ValueError, match="unknown normalization form"):
        textnorm.normalize_unicode(df, "t", "NFX")


class TestCanonicalizeUrl:
    def _canon(self, spark, urls):
        from clustering_spark.operators.textnorm import canonicalize_url

        df = spark.createDataFrame([(u,) for u in urls], "u string")
        return [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]

    def test_tracking_fragment_port_case(self, spark):
        got = self._canon(
            spark,
            [
                "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag",
                "http://example.com:80/a/b/",
                "https://example.com/a?fbclid=abc&gclid=def",
            ],
        )
        assert got[0] == "https://example.com/Path?q=1"
        assert got[1] == "http://example.com/a/b"
        assert got[2] == "https://example.com/a"

    def test_port_strip_is_scheme_conditional(self, spark):
        # :80 on https (and :443 on http) is a NON-default port — a
        # distinct resource that must keep its port in the dedup key
        got = self._canon(
            spark,
            [
                "https://example.com:80/x",
                "http://example.com:443/x",
                "https://example.com:443/x",
                "http://example.com:80/x",
                "https://example.com:8443/x",
            ],
        )
        assert got[0] == "https://example.com:80/x"
        assert got[1] == "http://example.com:443/x"
        assert got[2] == "https://example.com/x"
        assert got[3] == "http://example.com/x"
        assert got[4] == "https://example.com:8443/x"

    def test_param_order_collapses(self, spark):
        a, b = self._canon(
            spark,
            [
                "https://example.com/s?b=2&a=1",
                "https://example.com/s?a=1&b=2",
            ],
        )
        assert a == b == "https://example.com/s?a=1&b=2"

    def test_non_url_passthrough(self, spark):
        got = self._canon(spark, ["not a url", "ftp://example.com/x"])
        assert got == ["not a url", "ftp://example.com/x"]

    def test_dedup_key_collapses_variants(self, spark):
        from clustering_spark.operators.textnorm import url_dedup_key

        df = spark.createDataFrame(
            [
                (1, "https://Example.com/page?utm_campaign=z&id=7#top"),
                (2, "https://example.com:443/page/?id=7"),
                (3, "https://example.com/other"),
            ],
            "doc_id long, url string",
        )
        keys = {r.doc_id: r.url_key for r in url_dedup_key(df, "url").collect()}
        assert keys[1] == keys[2]
        assert keys[3] != keys[1]

    def test_canonicalization_is_idempotent(self, spark):
        """canon(canon(u)) == canon(u) — keys derived from already-
        canonical URLs must not drift (re-canonicalization happens
        whenever two pipelines hand each other URL columns)."""
        from clustering_spark.operators.textnorm import canonicalize_url

        urls = [
            "HTTPS://Example.COM:443/Path/?utm_source=x&q=1&a=2#frag",
            "http://example.com:80/a/b/",
            "https://example.com/s?b=2&a=1",
            "https://example.com",
            "not a url",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        once = df.select(canonicalize_url("u").alias("c1"))
        twice = once.select(
            F.col("c1"), canonicalize_url(F.col("c1")).alias("c2")
        ).collect()
        for r in twice:
            assert r.c2 == r.c1


class TestStripHtml:
    def _strip(self, spark, docs):
        from clustering_spark.operators.textnorm import strip_html

        df = spark.createDataFrame([(d,) for d in docs], "h string")
        return [r.t for r in df.select(strip_html("h").alias("t")).collect()]

    def test_basic_page(self, spark):
        html = (
            "<html><head><title>T</title>"
            "<style>body { color: red }</style>"
            "<script>var x = '<p>not text</p>';</script></head>"
            "<body><h1>Header</h1>"
            "<p>First paragraph with <b>bold</b> &amp; <i>italics</i>.</p>"
            "<p>Second&nbsp;paragraph &lt;tagged&gt;.</p>"
            "<!-- a comment --><div>Footer</div></body></html>"
        )
        (got,) = self._strip(spark, [html])
        assert "color: red" not in got
        assert "var x" not in got and "not text" not in got
        assert "a comment" not in got
        lines = got.split("\n")
        assert "Header" in lines
        assert any(l == "First paragraph with bold & italics." for l in lines)
        assert any(l == "Second paragraph <tagged>." for l in lines)
        assert "Footer" in lines

    def test_double_encoded_ampersand_not_double_decoded(self, spark):
        (got,) = self._strip(spark, ["a &amp;lt; b"])
        # the author WROTE "&lt;": decoding &amp; last keeps it literal
        assert got == "a &lt; b"

    def test_smart_quotes_and_unknown_numeric(self, spark):
        (got,) = self._strip(
            spark, ["&#8220;hi&#8221; &#8212; ok &#8455; end"]
        )
        assert got == "“hi” — ok end"

    def test_unclosed_script_drops_to_end(self, spark):
        (got,) = self._strip(
            spark, ["<p>keep</p><script>alert(1); trailing junk"]
        )
        assert got == "keep"

    def test_block_structure_preserved_for_line_stages(self, spark):
        (got,) = self._strip(
            spark, ["<ul><li>one</li><li>two</li></ul><p>three</p>"]
        )
        # every list item / paragraph is its own line, in order
        nonempty = [l for l in got.split("\n") if l]
        assert nonempty == ["one", "two", "three"]

    def test_plain_text_passthrough_and_null(self, spark):
        from clustering_spark.operators.textnorm import strip_html
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("just text",), (None,)], "h string")
        got = [r.t for r in df.select(strip_html("h").alias("t")).collect()]
        assert got[0] == "just text"
        assert got[1] is None

    def test_plan_is_native(self, spark):
        from clustering_spark.operators.textnorm import extract_html_text
        from clustering_spark.plans.audit import count_shuffles, formatted_plan

        df = spark.createDataFrame([("<p>x</p>",)], "h string")
        out = extract_html_text(df, "h")
        p = formatted_plan(out)
        assert "EvalPython" not in p and "InPandas" not in p
        assert count_shuffles(out) == 0


def test_pii_counts_match_redaction_no_double_count(spark):
    """Sequential counting: an IPv4-looking run inside an email must
    not count twice — n_pii_total equals the redacted token count."""
    df = spark.createDataFrame([("mail x@mail.1.2.3.4.com now",)], "t string")
    row = textnorm.pii_counts(df, "t").collect()[0]
    assert row.n_pii_email == 1
    assert row.n_pii_ipv4 == 0  # consumed by the email redaction
    assert row.n_pii_total == 1
    red = textnorm.redact_pii(df, "t").collect()[0].text_redacted
    assert red.count("<") == row.n_pii_total


def test_url_pattern_userinfo_and_case(spark):
    df = spark.createDataFrame(
        [
            (1, "link https://user@blocked.com/x"),
            (2, "link HTTP://Blocked.COM/y"),
        ],
        "id long, t string",
    )
    out = {r.id: sorted(r.domains) for r in textnorm.extract_domains(df, "t").collect()}
    assert out[1] == ["blocked.com"]
    assert out[2] == ["blocked.com"]
    blocked = spark.createDataFrame([("blocked.com",)], "domain string")
    assert textnorm.filter_domain_blocklist(df, "id", "t", blocked).count() == 0


class TestCanonicalizeUrlPassthrough:
    def test_non_url_with_fragment_char_unchanged(self, spark):
        from clustering_spark.operators.textnorm import canonicalize_url

        df = spark.createDataFrame(
            [("doc#1",), ("doc#2",), ("Issue #42 notes",)], "u string"
        )
        got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
        # pass-through means UNCHANGED — the old code stripped '#...'
        # first and collapsed doc#1/doc#2 to one dedup key
        assert got == ["doc#1", "doc#2", "Issue #42 notes"]


class TestStripHtmlRound7Fixes:
    def _strip(self, spark, docs):
        from clustering_spark.operators.textnorm import strip_html

        df = spark.createDataFrame([(d,) for d in docs], "h string")
        return [r.t for r in df.select(strip_html("h").alias("t")).collect()]

    def test_numeric_ampersand_decodes(self, spark):
        # &#38; / zero-padded / hex spellings decode to '&' in the
        # deferred pass — the catch-all must not eat them to a space
        got = self._strip(
            spark, ["AT&#38;T", "AT&#038;T", "AT&#x26;T", "AT&#X26;T"]
        )
        assert got == ["AT&T"] * 4

    def test_commented_out_script_does_not_swallow_document(self, spark):
        # comments strip BEFORE script blocks: an unclosed <script>
        # inside a comment must not drop-to-end-of-document
        (got,) = self._strip(
            spark,
            ["<!-- add <script src=x> later --> <p>Article text</p>"],
        )
        assert got == "Article text"

    def test_live_script_with_unmatched_comment_open_keeps_prose(self, spark):
        # the mirror case: a LIVE script whose body contains an
        # unmatched "<!--" (document.write / legacy hiding idiom) with
        # a real comment later in the document — the tempered comment
        # pass must not pair them, eat </script>, and turn the script
        # pass into a drop-to-end that swallows the prose between
        (got,) = self._strip(
            spark,
            [
                '<script>document.write("<!--")</script>'
                "<p>keep me</p><!-- real comment --><p>and me</p>"
            ],
        )
        lines = [l for l in got.split("\n") if l]
        assert lines == ["keep me", "and me"]

    def test_comment_wrapping_complete_script_fully_dropped(self, spark):
        # a comment containing a complete <script>...</script>: the
        # tempered pass refuses it (it would cross the close tag), the
        # script pass removes the payload, and the second plain comment
        # pass must drop the remaining shell including commented prose
        (got,) = self._strip(
            spark,
            [
                "<p>before</p><!-- old version: "
                "<script>var a = 1 > 0;</script> disabled -->"
                "<p>after</p>"
            ],
        )
        lines = [l for l in got.split("\n") if l]
        assert lines == ["before", "after"]

    def test_legacy_script_hiding_idiom(self, spark):
        # <script><!-- code //--></script>: both markers INSIDE the
        # script; the script (and its comment-wrapped body) must vanish
        (got,) = self._strip(
            spark,
            ["<script><!-- alert(1) //--></script><p>prose</p>"],
        )
        assert got == "prose"


def test_domain_blocklist_trailing_dot_no_escape(spark):
    # 'ads.evil.com.' is the same FQDN as 'ads.evil.com' in DNS — a
    # trailing-dot URL must not escape the blocklist
    from clustering_spark.operators.textnorm import filter_domain_blocklist

    docs = spark.createDataFrame(
        [
            (1, "see http://ads.evil.com./track now"),
            (2, "see http://good.org/x now"),
            (3, "see http://evil.com. now"),
        ],
        "id long, text string",
    )
    blocked = spark.createDataFrame([("evil.com",)], "domain string")
    kept = filter_domain_blocklist(docs, "id", "text", blocked)
    assert {r.id for r in kept.collect()} == {2}


# ----------------------------------------- round-7 batch-15 review pins


def test_extract_domains_last_at_and_underscore_hosts(spark):
    """WHATWG: everything before the LAST '@' is userinfo — a second
    '@' must not truncate the host ('http://x@y@evil.com/' extracted
    host 'y' before, a blocklist escape). Underscored hostnames are
    common in the wild; excluding '_' from the host class truncated
    'foo_bar.example.com' to 'foo'."""
    df = spark.createDataFrame(
        [
            (1, "see http://x@y@evil.com/page now"),
            (2, "and http://foo_bar.example.com/x too"),
        ],
        "id long, t string",
    )
    got = {
        r.id: sorted(r.domains)
        for r in textnorm.extract_domains(df, "t").collect()
    }
    assert got[1] == ["evil.com"]
    assert got[2] == ["foo_bar.example.com"]


def test_domain_blocklist_leading_dot_entry(spark):
    """'.evil.com' (cookie/adblock suffix notation) must block the
    domain family — before the leading-dot strip the entry matched
    NOTHING (endswith('..evil.com') never fires): silently inert."""
    docs = spark.createDataFrame(
        [
            (1, "x http://ads.evil.com/a y"),
            (2, "x http://evil.com/b y"),
            (3, "x http://good.com/c y"),
        ],
        "id long, t string",
    )
    blocked = spark.createDataFrame([(".evil.com",)], "domain string")
    kept = sorted(
        r.id
        for r in textnorm.filter_domain_blocklist(
            docs, "id", "t", blocked
        ).collect()
    )
    assert kept == [3]


class TestStripHtmlBatch15:
    def _strip(self, spark, docs):
        from clustering_spark.operators.textnorm import strip_html

        df = spark.createDataFrame([(d,) for d in docs], "h string")
        return [r.t for r in df.select(strip_html("h").alias("t")).collect()]

    def test_prose_comparisons_survive(self, spark):
        # literal '<'/'>' comparisons are NOT markup (browser rule:
        # '<' opens a tag only before a name/close/decl/PI) — the old
        # catch-all <[^>]*> deleted ' 10 and y ' from the sentence
        (got,) = self._strip(spark, ["<p>if x < 10 and y > 3 then stop</p>"])
        assert got == "if x < 10 and y > 3 then stop"

    def test_quoted_attribute_gt_does_not_leak(self, spark):
        # '>' inside a quoted attribute value is legal HTML — the old
        # [^>]* tag interior stopped there and leaked 'b)x()">' junk
        (got,) = self._strip(
            spark, ['<div onclick="if(a>b)x()">text</div>']
        )
        assert got == "text"

    def test_malformed_unbalanced_quote_degrades_like_before(self, spark):
        # unbalanced quote: the quote-aware pass refuses the tag, the
        # plain fallback consumes to the first '>' (the old behavior)
        (got,) = self._strip(spark, ['<div class="x>after</div>'])
        lines = [l for l in got.split("\n") if l]
        assert lines == ["after"]


def test_strip_html_gate_roundtrip_property(spark):
    """Property sweep for the q_strip_html GATE construction (round
    10): for ARBITRARY text — entities, markup-shaped spans, control
    whitespace — entity-escaping into the gate's HTML template and
    stripping back must equal the whitespace-normalized template
    skeleton around the ORIGINAL text (the invariant the DuckDB oracle
    relies on). Catches latent oracle drift before future driver
    testdata does. One batched Spark job over all examples."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from clustering_spark.queries import ROUND  # noqa: F401 (import check)

    # build each text from CHUNKS: hostile single chars plus whole
    # entity/markup-shaped tokens (sampled_from in st.text only takes
    # single characters, so multi-char tokens ride a lists+join)
    chunk = st.sampled_from(
        list("a& <>;#xb\n\t\x0b\r.")
        + ["&amp;", "&lt;", "<script>", "&#38;", "&#x26;", "-->", "<!--"]
    )
    texts_strategy = st.lists(
        st.lists(chunk, min_size=0, max_size=25).map("".join),
        min_size=1,
        max_size=30,
    )

    def py_expected(text):
        # the oracle's skeleton + whitespace passes, mirrored in Python
        s = " " * 8 + "\nTitle\n\n" + text + "\n  "
        s = _re.sub(r"[ \t\x0b\f\r]+", " ", s)
        s = _re.sub(r" ?\n ?", "\n", s)
        s = _re.sub(r"\n{3,}", "\n\n", s)
        return _re.sub(r"^[ \n]+|[ \n]+$", "", s)

    @settings(max_examples=25, deadline=None)
    @given(texts=texts_strategy)
    def check(texts):
        from pyspark.sql import functions as F

        from clustering_spark.operators.textnorm import extract_html_text

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        esc = F.replace(
            F.replace(
                F.replace(F.col("t"), F.lit("&"), F.lit("&amp;")),
                F.lit("<"),
                F.lit("&lt;"),
            ),
            F.lit(">"),
            F.lit("&gt;"),
        )
        html = F.concat(
            F.lit(
                "<!DOCTYPE html><html><head><style>p{color:red}</style></head>"
                '<body><!-- nav --><script type="text/javascript">var x = 1 < 2;'
                "</script><h1>Ti<b>tle</b></h1><p>"
            ),
            esc,
            F.lit("</p></body></html>"),
        )
        got = {
            r["i"]: r["text"]
            for r in extract_html_text(
                df.select("i", html.alias("html")), "html", "text"
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == py_expected(t), (repr(t), repr(got[i]))

    check()


class TestRound16TextReview:
    def test_vt_ff_separate_words_not_fuse(self, spark):
        """Round-16 review: \\x0b/\\x0c are Java \\s whitespace (token
        separators everywhere else), so normalize_text must turn them
        into spaces — deleting them fused 'page one\\x0cStart' into
        'oneStart', corrupting tokenization and dedup downstream."""
        from clustering_spark.operators.textnorm import normalize_text

        df = spark.createDataFrame(
            [("end of page one\x0cStart of page two\x0bmore",)],
            "t string",
        )
        got = df.select(normalize_text("t").alias("n")).collect()[0].n
        assert got == "end of page one Start of page two more"
        # non-whitespace controls still strip outright (no space)
        df2 = spark.createDataFrame([("a\x01b",)], "t string")
        assert df2.select(
            normalize_text("t").alias("n")
        ).collect()[0].n == "ab"

    def test_canonicalize_url_userinfo_and_fqdn_dot(self, spark):
        """Round-16 review: servers ignore URL credentials and the
        trailing-dot FQDN names the same host, so both collapse in
        the dedup key — previously two crawls of the same page under
        these forms survived URL-level dedup as distinct."""
        from clustering_spark.operators.textnorm import canonicalize_url

        cases = {
            "https://user:pw@example.com/page": "https://example.com/page",
            "https://example.com/page": "https://example.com/page",
            "http://Example.COM./x": "http://example.com/x",
            "http://h.:80/a": "http://h/a",
            "http://a%40b@H.example/p": "http://h.example/p",
            "not a url": "not a url",
        }
        df = spark.createDataFrame([(k,) for k in cases], "u string")
        got = [
            r.c for r in df.select(canonicalize_url("u").alias("c")).collect()
        ]
        for (u, want), g in zip(cases.items(), got):
            assert g == want, (u, g, want)

    def test_strip_html_unterminated_quote_matches_browser(self, spark):
        """Round-16 review verdict: an unterminated attribute quote
        eats prose up to the next quote + '>' — exactly what the
        HTML5 tokenizer does (the prose is inside the attribute value
        / attribute names; a browser renders none of it). Pinned as
        deliberate browser parity. With NO later quote, the tag fails
        to match and text survives (keep-the-text divergence)."""
        from clustering_spark.operators.textnorm import extract_html_text

        df = spark.createDataFrame(
            [
                (1, "<div class='intro>Hello world, don't panic.<p>"
                    "Next para</p>"),
                (2, "<div class='never closed and no later quote at all"),
            ],
            "doc_id long, html string",
        )
        got = {
            r.doc_id: r.text
            for r in extract_html_text(df, "html", out_col="text").collect()
        }
        assert got[1] == "Next para"          # what a browser shows
        assert "never closed" in got[2]       # unmatched: text kept
