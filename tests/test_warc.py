"""WARC source (sources/warc_source): record split, gzip-member
layout, HTTP response projection, per-file corrupt degrade, and the
composition into the text stack (strip_html over crawled bodies)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from clustering_spark.sources.warc_source import (
    make_http_response,
    make_warc,
    read_warc,
    warc_responses,
)


@pytest.fixture
def warc_dir(tmp_path):
    html = b"<html><body><p>Hello &amp; welcome</p></body></html>"
    plain = make_warc(
        [
            ("warcinfo", "", b"software: test\r\n"),
            ("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"),
            ("response", "http://a.example/", make_http_response(html)),
            (
                "response",
                "http://b.example/x",
                make_http_response("café ☃".encode()),
            ),
        ]
    )
    gz = make_warc(
        [("response", "http://c.example/", make_http_response(b"gz body"))],
        gzip_members=True,
    )
    (tmp_path / "seg-00000.warc").write_bytes(plain)
    (tmp_path / "seg-00001.warc.gz").write_bytes(gz)
    (tmp_path / "seg-00002.warc").write_bytes(b"NOT A WARC AT ALL")
    (tmp_path / "seg-00003.warc.gz").write_bytes(
        gzip.compress(b"WARC/1.0\r\nContent-Length: notanint\r\n\r\n")
    )
    return str(tmp_path)


def test_record_split_and_types(spark, warc_dir):
    df = read_warc(spark, warc_dir)
    pdf = df.toPandas()
    by_type = pdf.groupby("warc_type").size().to_dict()
    assert by_type["response"] == 3
    assert by_type["warcinfo"] == 1
    assert by_type["request"] == 1
    # per-FILE degrade: the two broken segments each yield exactly one
    # observable corrupt row, and the good files are unaffected
    assert by_type["corrupt"] == 2
    corrupt = pdf[pdf.warc_type == "corrupt"]
    assert corrupt.error.notna().all()
    assert (corrupt.record_idx == -1).all()
    good = pdf[pdf.warc_type == "response"]
    assert set(good.url) == {
        "http://a.example/",
        "http://b.example/x",
        "http://c.example/",
    }
    assert (good.error.isna()).all()


def test_http_projection_and_unicode(spark, warc_dir):
    resp = warc_responses(read_warc(spark, warc_dir)).toPandas().set_index("url")
    assert (resp.http_status == 200).all()
    assert resp.loc["http://a.example/", "http_content_type"].startswith(
        "text/html"
    )
    assert resp.loc["http://b.example/x", "text"] == "café ☃"
    assert bytes(resp.loc["http://c.example/", "body"]) == b"gz body"


def test_non_http_payload_degrades(spark, tmp_path):
    raw = make_warc([("response", "http://raw.example/", b"\x00\x01binary")])
    (tmp_path / "r.warc").write_bytes(raw)
    resp = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
    assert resp.http_status is None
    assert bytes(resp.body) == b"\x00\x01binary"


def test_composes_with_strip_html(spark, warc_dir):
    """The intended pipeline: crawl → responses → strip_html →
    text stack. The whole chain is two Python stages + native
    expressions, no extra shuffle."""
    from clustering_spark.operators.textnorm import extract_html_text

    resp = warc_responses(read_warc(spark, warc_dir))
    html_rows = resp.filter(F.col("http_content_type").startswith("text/html"))
    out = extract_html_text(html_rows, "text", out_col="text_plain").select(
        "url", "text_plain"
    )
    got = {r.url: r.text_plain for r in out.collect()}
    assert got["http://a.example/"].strip() == "Hello & welcome"


def test_truncated_payload_is_corrupt_not_partial(spark, tmp_path):
    rec = make_warc([("response", "http://t.example/", b"x" * 100)])
    (tmp_path / "t.warc").write_bytes(rec[: len(rec) - 60])  # cut payload
    pdf = read_warc(spark, str(tmp_path)).toPandas()
    assert list(pdf.warc_type) == ["corrupt"]
    assert "overruns" in pdf.error[0]

def test_negative_content_length_rejected_not_infinite(spark, tmp_path):
    """A crafted negative Content-Length must not move the parse
    position backwards (which would re-yield the same record forever
    and OOM the task) — the file degrades to one corrupt row."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"Content-Length: -26\r\n"
        b"\r\n"
    )
    (tmp_path / "evil.warc").write_bytes(rec)
    pdf = read_warc(spark, str(tmp_path)).toPandas()
    assert list(pdf.warc_type) == ["corrupt"]
    assert "negative Content-Length" in pdf.error[0]


def test_negative_content_length_driverside_parse_terminates():
    """Same guard at the parser level: the generator raises instead of
    looping, even when -clen exactly re-points at the record start."""
    from clustering_spark.sources.warc_source import _parse_warc_bytes

    rec = b"WARC/1.0\r\nContent-Length: -50\r\n\r\n" + b"x" * 100
    with pytest.raises(ValueError, match="negative Content-Length"):
        list(_parse_warc_bytes(rec))

def test_midfile_corruption_salvages_prefix_records(spark, tmp_path):
    """The degrade contract, stated precisely: records parsed before
    the failure point are KEPT (a 1 GB segment with one bad tail
    record must not lose its good records) and the failure itself is
    one observable corrupt row — so readers can both salvage and flag
    per file."""
    good = make_warc(
        [("response", "http://ok.example/", make_http_response(b"fine"))]
    )
    (tmp_path / "mixed.warc").write_bytes(good + b"GARBAGE TAIL BYTES")
    pdf = (
        read_warc(spark, str(tmp_path))
        .toPandas()
        .sort_values("record_idx")
        .reset_index(drop=True)
    )
    assert list(pdf.warc_type) == ["corrupt", "response"]
    assert pdf.error[0].startswith("ValueError: expected WARC version")
    assert pdf.url[1] == "http://ok.example/"


def test_lying_content_length_across_member_boundary_degrades(spark, tmp_path):
    """A record whose Content-Length overruns its own gzip member
    steals bytes from the next member after decompress-concatenation;
    the parser must fail the file observably at the desync point, not
    loop or emit fabricated records past it."""
    import gzip as _gz

    rec1 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 60\r\n\r\n" + b"x" * 20  # lies: 60 > 20
    )
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: 4\r\n\r\ngood\r\n\r\n"
    )
    blob = _gz.compress(rec1) + _gz.compress(rec2)
    (tmp_path / "liar.warc.gz").write_bytes(blob)
    pdf = read_warc(spark, str(tmp_path)).toPandas()
    # record 1 swallows rec2's head; the parse then desyncs and the
    # file flags corrupt — crucially rec2 is NOT emitted as valid
    kinds = sorted(pdf.warc_type)
    assert "corrupt" in kinds
    assert len(pdf[pdf.url == "http://"]) == 0
    assert (pdf.warc_type == "response").sum() <= 1


class TestCrawlDocuments:
    """crawl_documents: the ONE-pass multi-modality extraction over
    warc_responses — dispatch on body magic, HTML in the JVM strip,
    per-row corrupt degrade, no extra source scans."""

    def _mixed_dir(self, tmp_path):
        from clustering_spark.operators.office import make_docx
        from clustering_spark.operators.pdf import make_pdf
        from clustering_spark.sources.warc_source import (
            make_http_response,
            make_warc,
        )

        records = [
            (
                "response",
                "http://h/1",
                make_http_response(
                    b"<html><body><p>web prose</p></body></html>"
                ),
            ),
            (
                "response",
                "http://p/1",
                make_http_response(
                    make_pdf(["pdf prose"]),
                    # LYING Content-Type: dispatch must follow magic
                    content_type="text/html; charset=utf-8",
                ),
            ),
            (
                "response",
                "http://o/1",
                make_http_response(
                    make_docx(["docx prose"]),
                    content_type="application/octet-stream",
                ),
            ),
            (
                "response",
                "http://r/1",
                make_http_response(b"{\\rtf1 rtf prose\\par}"),
            ),
            (
                "response",
                "http://bad/1",
                # ZIP magic + garbage: office extraction raises ->
                # per-row corrupt degrade
                make_http_response(b"PK\x03\x04 not really a zip"),
            ),
        ]
        (tmp_path / "m.warc").write_bytes(make_warc(records))
        return str(tmp_path)

    def test_magic_dispatch_and_degrade(self, spark, tmp_path):
        from clustering_spark.sources.warc_source import (
            crawl_documents,
            read_warc,
            warc_responses,
        )

        out = (
            crawl_documents(
                warc_responses(read_warc(spark, self._mixed_dir(tmp_path)))
            )
            .toPandas()
            .set_index("url")
        )
        assert out.loc["http://h/1", "doc_kind"] == "text"
        assert out.loc["http://h/1", "text_plain"] == "web prose"
        # servers lie: the PDF behind a text/html Content-Type still
        # extracts as PDF because dispatch follows the bytes
        assert out.loc["http://p/1", "doc_kind"] == "pdf"
        assert out.loc["http://p/1", "text_plain"] == "pdf prose"
        assert out.loc["http://o/1", "doc_kind"] == "docx"
        assert out.loc["http://o/1", "text_plain"] == "docx prose"
        assert out.loc["http://r/1", "doc_kind"] == "rtf"
        assert out.loc["http://r/1", "text_plain"] == "rtf prose"
        assert out.loc["http://bad/1", "doc_kind"] == "corrupt"
        assert out.loc["http://bad/1", "text_plain"] is None

    def test_single_pass_plan(self, spark, tmp_path):
        from clustering_spark.plans import count_shuffles, plan_tree
        from clustering_spark.sources.warc_source import (
            crawl_documents,
            read_warc,
            warc_responses,
        )

        df = crawl_documents(
            warc_responses(read_warc(spark, self._mixed_dir(tmp_path)))
        )
        tree = plan_tree(df)
        # one linear chain: exactly the three Arrow stages (record
        # split, HTTP projection, document extraction), ONE source
        # scan, zero exchanges
        assert count_shuffles(df) == 0
        assert tree.count("MapInPandas") == 3
        assert tree.count("Scan binaryFile") == 1


def test_midstream_deflate_corruption_degrades_not_fails(spark, tmp_path):
    """zlib.error subclasses Exception, NOT OSError: a gzip member
    whose deflate stream is corrupted mid-body ('invalid code',
    'distance too far back') escaped read_warc's per-file degrade
    contract and failed the whole batch. Found by the round-12
    extended fuzz campaign; pinned here with a deterministic
    mid-stream bit flip."""
    from clustering_spark.sources.warc_source import (
        make_http_response,
        make_warc,
        read_warc,
    )

    blob = bytearray(
        make_warc(
            [("response", "http://x/", make_http_response(b"<p>hi</p>"))],
            gzip_members=True,
        )
    )
    # flip bits in the deflate body (past the 10-byte gzip header,
    # before the 8-byte trailer) until parsing raises SOMETHING,
    # then assert the Spark stage degrades instead of failing
    import gzip as _gzip

    for at in range(12, len(blob) - 9):
        cand = bytearray(blob)
        cand[at] ^= 0x55
        try:
            _gzip.decompress(bytes(cand))
        except Exception:
            break
    (tmp_path / "bad.warc.gz").write_bytes(bytes(cand))
    rows = read_warc(spark, str(tmp_path)).collect()
    assert len(rows) >= 1
    assert any(r["warc_type"] == "corrupt" for r in rows)


class TestContentEncoding:
    """Round 13: crawls that store RAW responses carry
    Content-Encoding bodies — warc_responses must undo gzip and both
    deflate framings (budget-bounded), and keep the raw body when
    the encoding lies."""

    def _resp(self, body, cenc, ctype="text/html; charset=utf-8"):
        return (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Encoding: {cenc}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    def test_gzip_deflate_and_raw_deflate_bodies(self, spark, tmp_path):
        import gzip as _gzip
        import zlib as _z

        html = b"<html><body><p>compressed prose here</p></body></html>"
        records = [
            ("response", "http://e.example/gz",
             self._resp(_gzip.compress(html), "gzip")),
            ("response", "http://e.example/zlib",
             self._resp(_z.compress(html), "deflate")),
            ("response", "http://e.example/raw",
             self._resp(_z.compressobj(wbits=-15).compress(html)
                        + _z.compressobj(wbits=-15).flush(), "deflate")),
            ("response", "http://e.example/lying",
             self._resp(b"not actually gzip", "gzip")),
            ("response", "http://e.example/plain",
             self._resp(html, "identity")),
        ]
        # raw-deflate needs one compressor object
        c = _z.compressobj(wbits=-15)
        raw_deflate = c.compress(html) + c.flush()
        records[2] = (
            "response", "http://e.example/raw",
            self._resp(raw_deflate, "deflate"),
        )
        (tmp_path / "ce-0.warc").write_bytes(make_warc(records))
        out = warc_responses(read_warc(spark, str(tmp_path))).toPandas()
        byurl = out.set_index("url")
        for u in ("gz", "zlib", "raw", "plain"):
            assert bytes(byurl.loc[f"http://e.example/{u}", "body"]) == html, u
        # a lying header degrades to the raw bytes, never a batch error
        assert bytes(byurl.loc["http://e.example/lying", "body"]) == (
            b"not actually gzip"
        )

    def test_encoded_body_flows_into_crawl_documents(self, spark, tmp_path):
        import gzip as _gzip

        from clustering_spark.sources.warc_source import crawl_documents

        html = (b"<html><body><p>the gzip page extracts like any "
                b"other</p></body></html>")
        (tmp_path / "ce-1.warc").write_bytes(
            make_warc([
                ("response", "http://e.example/page",
                 self._resp(_gzip.compress(html), "gzip")),
            ])
        )
        out = crawl_documents(
            warc_responses(read_warc(spark, str(tmp_path)))
        ).collect()
        assert len(out) == 1
        assert out[0].doc_kind == "text"
        assert "gzip page extracts" in out[0].text_plain

    def test_bomb_body_degrades_to_raw(self, spark, tmp_path):
        import zlib as _z

        bomb = _z.compress(b"\x00" * (80 * 1024 * 1024), 9)
        (tmp_path / "ce-2.warc").write_bytes(
            make_warc([
                ("response", "http://e.example/bomb",
                 self._resp(bomb, "deflate",
                            ctype="application/octet-stream")),
            ])
        )
        out = warc_responses(read_warc(spark, str(tmp_path))).collect()
        # budget exceeded -> raw bytes kept; the task survives
        assert bytes(out[0].body) == bomb


class TestWireRealities:
    """Round 13 continuation: chunked transfer encoding and non-UTF-8
    charsets — the other two wire layouts raw-stored crawls carry."""

    def test_chunked_body_dechunks(self, spark, tmp_path):
        html = b"<html><body><p>chunked prose</p></body></html>"
        chunked = (
            b"1a\r\n" + html[:26] + b"\r\n"
            + format(len(html) - 26, "x").encode() + b"\r\n"
            + html[26:] + b"\r\n0\r\n\r\n"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
        )
        (tmp_path / "ch-0.warc").write_bytes(
            make_warc([("response", "http://c.example/x", payload)])
        )
        row = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
        assert bytes(row.body) == html
        assert "chunked prose" in row.text

    def test_malformed_chunked_keeps_raw(self, spark, tmp_path):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\nZZZ not chunk sizes"
        )
        (tmp_path / "ch-1.warc").write_bytes(
            make_warc([("response", "http://c.example/bad", payload)])
        )
        row = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
        assert bytes(row.body) == b"ZZZ not chunk sizes"

    def test_charset_header_and_meta_sniff(self, spark, tmp_path):
        latin = "café touché".encode("latin-1")
        body_hdr = b"<html><body>" + latin + b"</body></html>"
        body_meta = (
            b'<html><head><meta charset="windows-1251"></head><body>'
            + "привет мир".encode("windows-1251") + b"</body></html>"
        )
        records = [
            ("response", "http://c.example/latin",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              b"charset=ISO-8859-1\r\n\r\n" + body_hdr)),
            ("response", "http://c.example/meta",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              + body_meta)),
            ("response", "http://c.example/bogus",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              b"charset=no-such-charset\r\n\r\n<p>plain ascii</p>")),
        ]
        (tmp_path / "cs-0.warc").write_bytes(make_warc(records))
        out = warc_responses(read_warc(spark, str(tmp_path))).toPandas()
        t = out.set_index("url").text
        assert "café touché" in t["http://c.example/latin"]
        assert "привет мир" in t["http://c.example/meta"]
        assert "plain ascii" in t["http://c.example/bogus"]  # fallback

    def test_bom_outranks_content_type(self, spark, tmp_path):
        """WHATWG encoding sniffing: a byte-order mark wins over the
        Content-Type charset. UTF-16 pages previously decoded as
        NUL-riddled mojibake (the utf-8 fallback sees \\x00 between
        every ASCII char); a UTF-8 BOM page with a WRONG declared
        charset must follow the BOM."""
        u16 = "<html><body>utf sixteen páge</body></html>".encode(
            "utf-16"  # emits the LE BOM
        )
        u16be = ("\ufeff" + "<html><body>big endian</body></html>").encode(
            "utf-16-be"
        )  # explicit BOM codepoint -> leading \xfe\xff
        u8bom = (
            b"\xef\xbb\xbf<html><body>"
            + "naïve text".encode("utf-8")
            + b"</body></html>"
        )
        records = [
            ("response", "http://b.example/le",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              + u16)),
            ("response", "http://b.example/be",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              + u16be)),
            ("response", "http://b.example/u8",
             (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              b"charset=windows-1251\r\n\r\n" + u8bom)),
        ]
        (tmp_path / "bom-0.warc").write_bytes(make_warc(records))
        out = warc_responses(read_warc(spark, str(tmp_path))).toPandas()
        t = out.set_index("url").text
        assert "utf sixteen páge" in t["http://b.example/le"]
        assert "\x00" not in t["http://b.example/le"]
        assert "big endian" in t["http://b.example/be"]
        assert "naïve text" in t["http://b.example/u8"]

    def test_negative_chunk_size_keeps_raw(self, spark, tmp_path):
        """int(b'-5', 16) parses: a crafted negative chunk size must
        degrade to the raw body, never slice-with-negative-stop or
        walk pos backwards (the loop/OOM class)."""
        body = b"-5\r\nABCDEFGH\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + body
        )
        (tmp_path / "ch-2.warc").write_bytes(
            make_warc([("response", "http://c.example/neg", payload)])
        )
        row = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
        assert bytes(row.body) == body

    def test_nonstrict_hex_chunk_tokens_keep_raw(self, spark, tmp_path):
        """Round-14 review batch 1: Python's int() also accepts '+5'
        and '1_0' (digit separators) — neither is a legal HTTP chunk
        size, and tolerating them would let a crafted token silently
        re-slice the body. Both must degrade to the raw bytes."""
        cases = [
            b"+5\r\nABCDE\r\n0\r\n\r\n",
            b"1_0\r\n0123456789abcdef\r\n0\r\n\r\n",
        ]
        for i, body in enumerate(cases):
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + body
            )
            (tmp_path / f"ch-tok{i}.warc").write_bytes(
                make_warc(
                    [("response", f"http://c.example/t{i}", payload)]
                )
            )
        rows = {
            r.url: bytes(r.body)
            for r in warc_responses(
                read_warc(spark, str(tmp_path))
            ).collect()
        }
        for i, body in enumerate(cases):
            assert rows[f"http://c.example/t{i}"] == body

    def test_uppercase_hex_and_extension_still_dechunk(
        self, spark, tmp_path
    ):
        # the strict-token hardening must NOT reject legal forms:
        # uppercase hex digits and ;ext chunk extensions
        body = b"A;name=val\r\n0123456789\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + body
        )
        (tmp_path / "ch-up.warc").write_bytes(
            make_warc([("response", "http://c.example/up", payload)])
        )
        row = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
        assert bytes(row.body) == b"0123456789"


class TestCharsetAnchoringReview:
    """Round-15 review batch 2: the charset sniff must be anchored —
    a data-charset attribute or a URL query parameter inside an
    earlier meta tag must not hijack the page encoding."""

    def _roundtrip(self, spark, tmp_path, payload, name):
        from clustering_spark.sources.warc_source import (
            make_warc,
            read_warc,
            warc_responses,
        )

        (tmp_path / f"{name}.warc").write_bytes(
            make_warc([("response", f"http://cs.example/{name}", payload)])
        )
        return warc_responses(read_warc(spark, str(tmp_path))).collect()[0]

    def test_url_query_charset_does_not_hijack(self, spark, tmp_path):
        # the page IS utf-8; an og:url meta carries ?charset=koi8-r.
        # Unanchored sniffing decoded the whole page as koi8-r.
        text = "naïve café"
        body = (
            b'<html><head><meta property="og:url"'
            b' content="http://x.example/a?charset=koi8-r"></head>'
            b"<body>" + text.encode("utf-8") + b"</body></html>"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        row = self._roundtrip(spark, tmp_path, payload, "q")
        assert text in row.text

    def test_data_charset_attribute_ignored(self, spark, tmp_path):
        text = "règle sûre"
        body = (
            b'<html><head><meta data-charset="koi8-r"></head><body>'
            + text.encode("utf-8") + b"</body></html>"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        row = self._roundtrip(spark, tmp_path, payload, "d")
        assert text in row.text

    def test_url_path_charset_does_not_hijack(self, spark, tmp_path):
        # round-16 advisor: with '/' in the GENERAL anchor class, a
        # URL *path* segment (no '?') inside an earlier attribute
        # value re-opened the hijack — the solidus form must be
        # admitted only as <meta/charset=..., tied to the tag name.
        text = "naïve café"
        body = (
            b'<html><head><meta property="og:url"'
            b' content="http://x.example/charset=koi8-r"></head>'
            b"<body>" + text.encode("utf-8") + b"</body></html>"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        row = self._roundtrip(spark, tmp_path, payload, "p")
        assert text in row.text

    def test_header_path_charset_does_not_hijack(self, spark, tmp_path):
        # same class on the Content-Type HEADER side: a hostile
        # parameter value containing /charset= must not anchor.
        text = "naïve café"
        body = b"<html><body>" + text.encode("utf-8") + b"</body></html>"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html;"
            b' profile="http://x/charset=koi8-r"\r\n\r\n' + body
        )
        row = self._roundtrip(spark, tmp_path, payload, "hp")
        assert text in row.text

    def test_quoted_value_then_solidus_charset_sniffs(
        self, spark, tmp_path
    ):
        # round-16 review follow-up: after a QUOTED attribute value
        # the HTML5 tokenizer treats '/' as re-entering
        # before-attribute-name state, so
        # <meta http-equiv="..."/charset=latin-1> is browser-honored
        # and must sniff; same for <meta//charset=...>.
        text = "café touché"
        for i, head in enumerate([
            b'<meta http-equiv="Content-Type"/charset=latin-1>',
            b"<meta//charset=latin-1>",
            b"<meta name='x'//charset=latin-1>",
        ]):
            body = (b"<html><head>" + head + b"</head><body>"
                    + text.encode("latin-1") + b"</body></html>")
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body
            )
            row = self._roundtrip(spark, tmp_path, payload, f"qs{i}")
            assert text in row.text, head

    def test_unquoted_value_solidus_does_not_hijack(
        self, spark, tmp_path
    ):
        # the tokenizer keeps '/' INSIDE an unquoted attribute value
        # (foo=bar/charset=x is ONE value named foo), so it must not
        # anchor — same boundary rule that excludes the URL-path form.
        text = "naïve café"
        body = (
            b'<html><head><meta data-url=http://x/charset=koi8-r>'
            b"</head><body>" + text.encode("utf-8") + b"</body></html>"
        )
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        row = self._roundtrip(spark, tmp_path, payload, "uq")
        assert text in row.text

    def test_anchored_forms_still_sniff(self, spark, tmp_path):
        # the three legitimate shapes keep working: bare attribute,
        # no-space http-equiv param, single-quoted
        text = "café touché"
        for i, head in enumerate([
            b'<meta charset="latin-1">',
            b'<meta http-equiv="Content-Type"'
            b' content="text/html;charset=latin-1">',
            b"<meta charset='latin-1'>",
        ]):
            body = (b"<html><head>" + head + b"</head><body>"
                    + text.encode("latin-1") + b"</body></html>")
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body
            )
            row = self._roundtrip(spark, tmp_path, payload, f"ok{i}")
            assert text in row.text, head


def test_slash_separated_meta_charset_sniffs(spark, tmp_path):
    """Round-15 review follow-up: HTML parsers treat '/' as
    whitespace before attribute names, so <meta/charset=...> is a
    browser-honored declaration the anchor class must admit."""
    from clustering_spark.sources.warc_source import (
        make_warc,
        read_warc,
        warc_responses,
    )

    text = "café touché"
    body = (b"<html><head><meta/charset=latin-1></head><body>"
            + text.encode("latin-1") + b"</body></html>")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    (tmp_path / "sl.warc").write_bytes(
        make_warc([("response", "http://sl.example/x", payload)])
    )
    row = warc_responses(read_warc(spark, str(tmp_path))).collect()[0]
    assert text in row.text


class TestWetWat:
    """Round 15: Common Crawl WET (conversion) / WAT (metadata)
    refiners — the segments most LLM text pipelines actually start
    from."""

    def _fixture(self, spark, tmp_path):
        from clustering_spark.sources.warc_source import (
            make_warc,
            read_warc,
        )

        records = [
            ("warcinfo", "", b"software: test-crawler/1.0\r\n"),
            ("conversion", "http://a.example/page",
             "Extracted prose about harbors.\nSecond line.".encode()),
            # invalid UTF-8 byte mid-text: must degrade to U+FFFD,
            # never throw (ANSI mode is on in this engine)
            ("conversion", "http://b.example/page",
             b"bad \xff byte"),
            ("metadata", "http://a.example/page",
             b'{"Envelope":{"WARC-Header-Metadata":'
             b'{"WARC-Type":"response"},"Payload-Metadata":'
             b'{"HTTP-Response-Metadata":{"HTML-Metadata":'
             b'{"Head":{"Title":"Harbors"}}}}}}'),
            ("response", "http://c.example/x",
             b"HTTP/1.1 200 OK\r\n\r\nnot a conversion"),
        ]
        (tmp_path / "seg.warc").write_bytes(make_warc(records))
        return read_warc(spark, str(tmp_path))

    def test_wet_conversions(self, spark, tmp_path):
        from clustering_spark.sources.warc_source import wet_conversions

        recs = self._fixture(spark, tmp_path)
        wet = wet_conversions(recs).toPandas().set_index("url")
        assert len(wet) == 2
        assert wet.loc["http://a.example/page", "text"].startswith(
            "Extracted prose"
        )
        assert "�" in wet.loc["http://b.example/page", "text"]

    def test_wat_metadata_json_pruning(self, spark, tmp_path):
        from clustering_spark.sources.warc_source import wat_metadata

        recs = self._fixture(spark, tmp_path)
        wat = wat_metadata(recs)
        got = wat.select(
            "url",
            F.get_json_object(
                "json",
                "$.Envelope.Payload-Metadata.HTTP-Response-Metadata"
                ".HTML-Metadata.Head.Title",
            ).alias("title"),
        ).collect()
        assert len(got) == 1
        assert got[0].title == "Harbors"

    def test_wet_feeds_text_pipeline(self, spark, tmp_path):
        """Composition smoke: WET text flows into the text stack the
        same as warc_responses text (dedup-ready schema)."""
        from clustering_spark.operators.textops import token_count
        from clustering_spark.sources.warc_source import wet_conversions

        recs = self._fixture(spark, tmp_path)
        out = (
            wet_conversions(recs)
            .select(token_count(F.col("text")).alias("n_tokens"))
            .toPandas()
        )
        assert (out.n_tokens > 0).all()


def test_truncated_wet_segment_salvages_prior_conversions(
    spark, tmp_path
):
    """Round-16 review: a WET segment whose final conversion record
    is TRUNCATED (Content-Length overruns the file — the real-world
    partial-download shape) must salvage every earlier conversion
    and surface one corrupt row, so wet_conversions loses nothing
    it already parsed."""
    from clustering_spark.sources.warc_source import (
        make_warc,
        read_warc,
        wet_conversions,
    )

    good = make_warc([
        ("warcinfo", "", b"software: wet-test\r\n"),
        ("conversion", "http://a.example/1", b"first extracted text"),
        ("conversion", "http://a.example/2", b"second extracted text"),
    ])
    truncated = make_warc([
        ("conversion", "http://a.example/3", b"payload that will be cut")
    ])
    # cut mid-payload: header declares more bytes than remain
    (tmp_path / "seg.warc").write_bytes(good + truncated[:-20])
    recs = read_warc(spark, str(tmp_path))
    wet = wet_conversions(recs).toPandas().sort_values("url")
    assert list(wet.url) == ["http://a.example/1", "http://a.example/2"]
    assert list(wet.text) == [
        "first extracted text", "second extracted text",
    ]
    corrupt = recs.filter(F.col("warc_type") == "corrupt").collect()
    assert len(corrupt) == 1
    assert "overruns" in corrupt[0].error
