"""PDF structural pass (operators/pdf.py): object lexer, classic and
stream xref resolution, ObjStm indirection, text extraction, honest
degrade on encrypted/corrupt inputs, mutation fuzz, and the Spark
stages + router integration.
"""

from __future__ import annotations

import zlib

import pytest

from clustering_spark.operators.pdf import (
    PdfDocument,
    _content_text,
    _Lexer,
    extract_pdf_text,
    make_pdf,
    pdf_header_meta,
    pdf_meta,
    pdf_text,
)

PAGES = [
    "Hello world.\nSecond line here.",
    "Page two text, with (parens) and \\ backslash.",
]


class TestLexer:
    def test_scalars_and_containers(self):
        lex = _Lexer(
            b"<< /A 1 /B [ -2.5 (str) /Nm true null ] /C 3 0 R >>"
        )
        d = lex.parse()
        assert d["/A"] == 1
        assert d["/B"][0] == -2.5
        assert d["/B"][1] == b"str"
        assert d["/B"][2] == "/Nm"
        assert d["/B"][3] is True
        assert d["/B"][4] is None
        assert d["/C"].num == 3

    def test_string_escapes(self):
        assert _Lexer(rb"(a\(b\)c\\d\n\101)").parse() == b"a(b)c\\d\nA"
        assert _Lexer(b"(nested (parens) ok)").parse() == (
            b"nested (parens) ok"
        )

    def test_hex_string_and_name_escape(self):
        assert _Lexer(b"<48 65 6C6C6F>").parse() == b"Hello"
        assert _Lexer(b"<486>").parse() == b"H`"  # odd digit padded
        assert _Lexer(b"/A#20B").parse() == "/A B"

    def test_number_vs_reference_disambiguation(self):
        lex = _Lexer(b"[ 1 2 3 ]")  # NOT a reference: inside array
        assert lex.parse() == [1, 2, 3]
        lex = _Lexer(b"[ 1 0 R 2 ]")
        arr = lex.parse()
        assert arr[0].num == 1 and arr[1] == 2


class TestLayouts:
    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"flate": False},
            {"xref_stream": True},
            {"xref_stream": True, "use_objstm": True},
        ],
    )
    def test_meta_and_text(self, kw):
        b = make_pdf(PAGES, **kw)
        ver, n_pages, enc, n_obj = pdf_meta(b)
        assert (ver, n_pages, enc) == ("1.7", 2, False)
        text, good, bad = extract_pdf_text(b)
        assert (good, bad) == (2, 0)
        assert "Hello world.\nSecond line here." in text
        assert "Page two text, with (parens) and \\ backslash." in text

    def test_encrypted_meta_yes_text_refuses(self):
        b = make_pdf(PAGES, encrypted=True)
        assert pdf_meta(b)[2] is True
        with pytest.raises(ValueError, match="encrypted"):
            extract_pdf_text(b)

    def test_broken_startxref_salvaged_by_brute_scan(self):
        bb = bytearray(make_pdf(PAGES))
        i = bb.rfind(b"startxref")
        bb[i : i + 9] = b"stortxref"
        assert pdf_meta(bytes(bb))[1] == 2
        text, good, bad = extract_pdf_text(bytes(bb))
        assert good == 2 and "Hello world." in text

    def test_incremental_update_latest_wins(self):
        # an appended update re-defining page 1's content: the brute
        # scan takes the LAST definition, like a real reader applying
        # the newest xref section
        b = bytearray(make_pdf(["old text"]))
        i = b.rfind(b"startxref")
        b[i : i + 9] = b"stortxref"  # force the scan path
        new = b"BT (new text) Tj ET"
        b += (
            b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new)
            + new + b"\nendstream\nendobj\n"
        )
        text, good, bad = extract_pdf_text(bytes(b))
        assert "new text" in text and "old text" not in text

    def test_not_pdf_raises(self):
        with pytest.raises(ValueError):
            pdf_meta(b"hello world this is not a pdf")

    def test_unsupported_filter_counts_failed_page(self):
        b = make_pdf(["visible"])
        b = b.replace(b"/Filter /FlateDecode", b"/Filter /JBIG2Decode")
        text, good, bad = extract_pdf_text(b)
        assert bad == 1 and good == 0 and text == ""


class TestContentText:
    def test_tj_array_kerning_space(self):
        c = b"BT [ (Hel) -50 (lo) -300 (world) ] TJ ET"
        assert _content_text(c) == "Hello world"

    def test_quote_ops_break_lines(self):
        c = b"BT (a) Tj T* (b) Tj ET BT (c) ' ET"
        t = _content_text(c)
        assert "a\nb" in t and "c" in t

    def test_hex_show(self):
        c = b"BT <48656C6C6F> Tj ET"
        assert _content_text(c) == "Hello"


class TestFuzz:
    def test_mutation_fuzz_degrade_contract(self):
        import random
        import struct as st

        rng = random.Random(0x9DF)
        fixtures = [
            make_pdf(PAGES),
            make_pdf(PAGES, xref_stream=True, use_objstm=True),
            make_pdf(["x"], flate=False),
        ]
        for _ in range(400):
            base = bytearray(rng.choice(fixtures))
            op = rng.randrange(3)
            if op == 0 and len(base) > 2:
                base = base[: rng.randrange(1, len(base))]
            elif op == 1:
                for _ in range(rng.randrange(1, 10)):
                    base[rng.randrange(len(base))] = rng.randrange(256)
            else:
                i = rng.randrange(len(base))
                del base[i : i + rng.randrange(1, 40)]
            blob = bytes(base)
            try:
                pdf_meta(blob)
                extract_pdf_text(blob)
            except (ValueError, NotImplementedError, st.error):
                # NOT RecursionError: the lexer's MAX_NESTING guard
                # turns crafted deep nesting into the ValueError the
                # Spark stages' degrade contract catches
                pass


class TestSparkStages:
    def test_pdf_header_meta_mixed(self, spark):
        rows = [
            (1, make_pdf(PAGES)),
            (2, make_pdf(["x"], encrypted=True)),
            (3, b"%PDF-1.4 then nothing sensible"),
            (4, b"not a pdf"),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = pdf_header_meta(df, "blob", "id").toPandas().set_index("id")
        assert out.loc[1, "format"] == "pdf"
        assert out.loc[1, "n_pages"] == 2
        assert bool(out.loc[1, "encrypted"]) is False
        assert bool(out.loc[2, "encrypted"]) is True
        # headerless tail: brute scan finds no objects -> still pdf,
        # 0/None pages, never a batch failure
        assert out.loc[3, "format"] in ("pdf", "corrupt")
        assert out.loc[4, "format"] == "unknown"
        assert out.loc[5, "format"] == "unknown"

    def test_pdf_text_statuses(self, spark):
        rows = [
            (1, make_pdf(PAGES, xref_stream=True, use_objstm=True)),
            (2, make_pdf(["x"], encrypted=True)),
            (3, b"junk"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = pdf_text(df, "blob", "id").toPandas().set_index("id")
        assert out.loc[1, "status"] == "ok"
        assert "Hello world." in out.loc[1, "text"]
        assert out.loc[1, "n_pages_ok"] == 2
        assert out.loc[2, "status"] == "encrypted"
        assert out.loc[3, "status"] == "unknown"
        assert out.loc[4, "status"] == "unknown"

    def test_router_labels_documents(self, spark):
        from clustering_spark.operators import multimodal as mm

        rows = [
            (1, make_pdf(["doc"])),
            (2, mm.make_fake_image(4, 3, fill=9)),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = (
            mm.media_header_meta(df, "blob", "id")
            .toPandas()
            .set_index("id")
        )
        assert out.loc[1, "media_type"] == "document"
        assert out.loc[1, "format"] == "pdf"
        assert out.loc[2, "media_type"] == "image"

    def test_pdf_text_feeds_text_quality(self, spark):
        """The composition a crawl pipeline runs: pdf_text ->
        text_quality over the extracted column."""
        from clustering_spark.operators.textops import quality_features

        df = spark.createDataFrame(
            [(1, make_pdf(["The quick brown fox jumps over a dog. " * 5]))],
            "id long, blob binary",
        )
        txt = pdf_text(df, "blob", "id").filter("status = 'ok'")
        scored = quality_features(txt.select("id", "text"), "text")
        row = scored.collect()[0]
        assert row["n_tokens"] > 30
        assert row["quality_score"] > 0.25


def test_deep_nesting_is_a_value_error_not_recursion():
    """A crafted object with thousands of nested arrays must degrade
    through the stages' ValueError contract, not RecursionError past
    it (review batch 30)."""
    blob = (
        b"%PDF-1.7\n1 0 obj\n" + b"[" * 5000 + b"]" * 5000
        + b"\nendobj\ntrailer\n<< /Root 1 0 R >>\n"
    )
    with pytest.raises(ValueError):
        _Lexer(b"[" * 5000 + b"]" * 5000).parse()
    # and through the document path: meta degrades, never raises
    # RecursionError (brute scan parses the object)
    try:
        pdf_meta(blob)
    except ValueError:
        pass


class TestBudgets:
    """Round-13 ADVICE: (a) FlateDecode must bound the allocation,
    not len-check after inflating a hostile ~1000:1 stream; (b) the
    text budget abort must keep n_pages_ok + n_pages_failed equal to
    the pages walked (the old path counted the overflowing page in
    BOTH, and kept decoding every remaining page)."""

    def test_flate_bomb_bounded(self):
        from clustering_spark.operators.pdf import (
            MAX_TEXT_BYTES,
            _decode_stream,
        )

        bomb = zlib.compress(b"\x00" * (MAX_TEXT_BYTES + 4096), 9)
        assert len(bomb) < 1024 * 1024  # small on the wire
        with pytest.raises(ValueError, match="budget"):
            _decode_stream({"/Filter": "/FlateDecode"}, bomb)

    def test_budget_abort_accounting(self, monkeypatch):
        from clustering_spark.operators import pdf as pdfmod

        monkeypatch.setattr(pdfmod, "MAX_TEXT_BYTES", 10)
        b = make_pdf(
            ["tiny", "way past the ten byte budget", "after"],
            flate=False,
        )
        text, good, bad = extract_pdf_text(b)
        # page 1 fits; page 2 trips the budget; page 3 is counted
        # failed WITHOUT being decoded — never double-counted
        assert (good, bad) == (1, 2)
        assert text == "tiny"

    def test_objstm_payload_cached_once(self):
        from clustering_spark.operators import pdf as pdfmod

        b = make_pdf(PAGES, xref_stream=True, use_objstm=True)
        doc = PdfDocument(b)
        calls = {"n": 0}
        orig = pdfmod.PdfDocument._stream_of

        def counting(self, num):
            calls["n"] += 1
            return orig(self, num)

        # route _stream_of through a counter: every member fetch of
        # the ObjStm must reuse ONE decoded payload
        doc._stream_of = counting.__get__(doc)
        for num in list(doc._in_objstm):
            doc.get(num)
        containers = set(doc._in_objstm.values())
        text_calls_for_objstm = sum(
            1 for _ in containers
        )  # one decode per distinct container
        assert calls["n"] == text_calls_for_objstm

    def test_single_document_parse_in_stage(self, spark):
        # the stage's text output is unchanged by the single-parse
        # refactor (the behavior pin; the perf claim is the code read)
        rows = [(1, make_pdf(PAGES)), (2, make_pdf(["x"], encrypted=True))]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = pdf_text(df, "blob", "id").toPandas().set_index("id")
        assert out.loc[1, "status"] == "ok"
        assert "Hello world." in out.loc[1, "text"]
        assert out.loc[2, "status"] == "encrypted"


class TestAdversarialStructure:
    """Round-13 review batch 33: the lexer/walker against crafted
    crawl bytes — reference cycles, self-referencing page trees,
    hostile /Length indirection, ObjStm mutual reference."""

    def _raw_pdf(self, objects: dict[int, bytes], root: int = 1) -> bytes:
        out = bytearray(b"%PDF-1.4\n")
        offsets = {}
        for num, body in objects.items():
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        mx = max(objects) + 1
        out += f"xref\n0 {mx}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, mx):
            off = offsets.get(num, 0)
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(mx).encode()
            + f" /Root {root} 0 R >>\nstartxref\n".encode()
            + str(xref_at).encode() + b"\n%%EOF"
        )
        return bytes(out)

    def test_self_referencing_kids_terminates(self):
        # /Pages node whose Kids contain ITSELF twice: a depth cap
        # alone branches 2^64 ways; the visited set must make this
        # return (no pages) in milliseconds
        blob = self._raw_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Count 1 /Kids [ 2 0 R 2 0 R ] >>",
        })
        text, good, bad = extract_pdf_text(blob)
        assert (text, good, bad) == ("", 0, 0)

    def test_two_node_kids_cycle_terminates(self):
        blob = self._raw_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [ 3 0 R ] >>",
            3: b"<< /Type /Pages /Kids [ 2 0 R 2 0 R ] >>",
        })
        assert extract_pdf_text(blob) == ("", 0, 0)

    def test_reference_cycle_resolves_to_error_not_hang(self):
        # object 2 IS "2 0 R": resolve must hit its hop cap
        blob = self._raw_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"2 0 R",
        })
        doc = PdfDocument(blob)
        cat = doc.resolve(doc.trailer.get("/Root"))
        with pytest.raises(ValueError, match="cycle"):
            doc.resolve(cat.get("/Pages"))

    def test_huge_length_degrades_to_salvage_or_error(self):
        # /Length far past EOF: must raise (stream past end), never
        # allocate
        blob = self._raw_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>",
            3: b"<< /Type /Page /Contents 4 0 R >>",
            4: (b"<< /Length 1152921504606846976 >>\nstream\nBT (x) Tj"
                b" ET\nendstream"),
        })
        text, good, bad = extract_pdf_text(blob)
        assert (good, bad) == (0, 1)  # page counted failed, no hang

    def test_shared_page_object_still_yields_once(self):
        # the same /Page object under two parents: visited-set rule
        # yields it once (sharing is illegal in real PDFs; ONE yield
        # beats an exponential walk)
        blob = self._raw_pdf({
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [ 3 0 R 3 0 R ] >>",
            3: b"<< /Type /Page >>",
        })
        doc = PdfDocument(blob)
        pages = list(doc.pages())
        assert len(pages) == 2  # Page nodes are not cycle members
