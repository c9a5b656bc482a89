"""Office/EPUB ZIP-container extraction (operators/office.py):
kind sniffing, per-format text extraction semantics, encryption and
zip-bomb degrade, mutation fuzz, the Spark stage, router labeling,
and the composition into the text-quality chain.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from clustering_spark.operators.office import (
    extract_docx_text,
    extract_epub_text,
    extract_office_text,
    extract_pptx_text,
    extract_xlsx_text,
    make_docx,
    make_epub,
    make_pptx,
    make_xlsx,
    office_meta,
    office_text,
    zip_kind,
)


class TestKinds:
    def test_kind_sniffing(self):
        assert zip_kind(make_docx(["x"])) == "docx"
        assert zip_kind(make_pptx([["x"]])) == "pptx"
        assert zip_kind(make_xlsx(["x"])) == "xlsx"
        assert zip_kind(make_epub(["x"])) == "epub"
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("random.bin", b"data")
        assert zip_kind(buf.getvalue()) == "zip"

    def test_not_a_zip_raises(self):
        with pytest.raises(ValueError):
            zip_kind(b"PK\x03\x04 then garbage")

    def test_meta_counts_and_encryption_flag(self):
        kind, n, total, enc = office_meta(make_docx(["hello"]))
        assert kind == "docx" and n == 2 and not enc
        # flip a member's encryption flag bit in the local header +
        # central directory: office_meta must REPORT it, extraction
        # must refuse it
        blob = bytearray(make_docx(["hello"]))
        for magic in (b"PK\x03\x04", b"PK\x01\x02"):
            at = 0
            while (at := bytes(blob).find(magic, at)) >= 0:
                off = at + (6 if magic == b"PK\x03\x04" else 8)
                blob[off] |= 1
                at += 4
        assert office_meta(bytes(blob))[3] is True
        with pytest.raises(ValueError, match="encrypted"):
            extract_docx_text(bytes(blob))


class TestExtraction:
    def test_docx_paragraphs_and_escapes(self):
        d = make_docx(["First paragraph.", "Second & <third>."])
        assert extract_docx_text(d) == (
            "First paragraph.\nSecond & <third>."
        )

    def test_pptx_slide_order_is_numeric_not_lexicographic(self):
        slides = [[f"slide {i}"] for i in range(1, 13)]
        p = make_pptx(slides)
        text = extract_pptx_text(p)
        # lexicographic order would put slide10 before slide2
        assert text.index("slide 2") < text.index("slide 10")

    def test_xlsx_shared_strings(self):
        x = make_xlsx(["Region", "Notes & caveats"])
        assert extract_xlsx_text(x) == "Region\nNotes & caveats"

    def test_epub_chapters_skip_head_and_style(self):
        e = make_epub(["Chapter one prose.", "Chapter two prose."])
        text, ok, bad = extract_epub_text(e)
        assert text == "Chapter one prose.\n\nChapter two prose."
        assert (ok, bad) == (2, 0)
        assert "color:red" not in text  # style dropped
        assert "c\n" not in text  # <title> metadata dropped

    def test_epub_malformed_chapter_counted_failed(self):
        blob = make_epub(["good prose here"])
        buf = io.BytesIO()
        with zipfile.ZipFile(io.BytesIO(blob)) as src, zipfile.ZipFile(
            buf, "w"
        ) as dst:
            for n in src.namelist():
                dst.writestr(n, src.read(n))
            dst.writestr("OEBPS/bad.xhtml", b"<html><unclosed")
        text, ok, bad = extract_epub_text(buf.getvalue())
        assert "good prose here" in text
        assert (ok, bad) == (1, 1)

    def test_plain_zip_is_not_a_document(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("a.bin", b"xx")
        assert extract_office_text(buf.getvalue()) == ("zip", "")

    def test_member_size_lie_is_bounded(self):
        # a member whose local header declares a small size but whose
        # deflate stream inflates big: the read cap catches it. Build
        # an honest large-ish member and shrink the declared size.
        blob = make_docx(["x" * 1000])
        # tamper: declare file_size smaller in the central directory
        # is complex; instead pin the declared-size budget directly
        from clustering_spark.operators import office

        old = office.MAX_MEMBER_BYTES
        office.MAX_MEMBER_BYTES = 64
        try:
            with pytest.raises(ValueError, match="budget"):
                extract_docx_text(blob)
        finally:
            office.MAX_MEMBER_BYTES = old

    def test_mutation_fuzz_degrade_contract(self):
        import random

        rng = random.Random(0x0FF1CE)
        fixtures = [
            make_docx(["a", "b"]),
            make_pptx([["s1"], ["s2"]]),
            make_epub(["ch"]),
            make_xlsx(["v"]),
        ]
        for _ in range(400):
            b = bytearray(rng.choice(fixtures))
            op = rng.randrange(3)
            if op == 0 and len(b) > 2:
                b = b[: rng.randrange(1, len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(len(b))
                del b[i : i + rng.randrange(1, 20)]
            try:
                extract_office_text(bytes(b))
            except ValueError:
                pass


class TestSpark:
    def test_office_text_stage_mixed(self, spark):
        rows = [
            (1, make_docx(["Words from a memo."])),
            (2, make_epub(["Novel text."])),
            (3, b"PK\x03\x04broken"),
            (4, b"not zip at all"),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = office_text(df, "blob", "id").toPandas().set_index("id")
        assert out.loc[1, "kind"] == "docx"
        assert out.loc[1, "text"] == "Words from a memo."
        assert out.loc[2, "kind"] == "epub"
        assert out.loc[3, "status"] == "corrupt"
        assert out.loc[4, "kind"] == "unknown"
        assert out.loc[5, "kind"] == "unknown"

    def test_router_labels_zip_documents(self, spark):
        from clustering_spark.operators import multimodal as mm

        rows = [
            (1, make_docx(["d"])),
            (2, make_epub(["e"])),
            (3, make_xlsx(["x"])),
        ]
        df = spark.createDataFrame(rows, "id long, blob binary")
        out = (
            mm.media_header_meta(df, "blob", "id")
            .toPandas()
            .set_index("id")
        )
        assert list(out["media_type"]) == ["document"] * 3
        assert list(out["format"]) == ["docx", "epub", "xlsx"]

    def test_office_feeds_text_quality(self, spark):
        from clustering_spark.operators.textops import quality_features

        df = spark.createDataFrame(
            [(1, make_docx(["The quick brown fox jumps over a dog. "
                            * 5]))],
            "id long, blob binary",
        )
        txt = office_text(df, "blob", "id").filter("status = 'ok'")
        scored = quality_features(txt.select("id", "text"), "text")
        row = scored.collect()[0]
        assert row["n_tokens"] > 30 and row["quality_score"] > 0.25


class TestRtf:
    def test_paragraphs_and_table_skip(self):
        from clustering_spark.operators.office import (
            extract_rtf_text,
            make_rtf,
        )

        r = make_rtf(["Hello RTF world.", "Second paragraph."])
        assert extract_rtf_text(r) == (
            "Hello RTF world.\nSecond paragraph."
        )
        # font/color tables must not leak (the bytes-vs-str skip-set
        # bug the first smoke test caught)
        assert "Times New Roman" not in extract_rtf_text(r)

    def test_escapes(self):
        from clustering_spark.operators.office import extract_rtf_text

        assert extract_rtf_text(b"{\\rtf1 caf\\'e9\\par}") == "café"
        assert extract_rtf_text(b"{\\rtf1\\uc1 a\\u233?b\\par}") == (
            "aéb"
        )
        assert extract_rtf_text(rb"{\rtf1 a\{b\}c\\d\par}") == "a{b}c\\d"

    def test_skip_state_restores_on_group_close(self):
        from clustering_spark.operators.office import extract_rtf_text

        t = extract_rtf_text(
            b"{\\rtf1{\\fonttbl{\\f0 Arial;}}visible\\par}"
        )
        assert t == "visible"

    def test_deep_nesting_is_iterative(self):
        from clustering_spark.operators.office import extract_rtf_text

        blob = b"{\\rtf1 " + b"{" * 50_000 + b"x" + b"}" * 50_000 + b"}"
        assert extract_rtf_text(blob) == "x"

    def test_not_rtf_raises_and_fuzz(self):
        import random

        from clustering_spark.operators.office import (
            extract_rtf_text,
            make_rtf,
        )

        with pytest.raises(ValueError):
            extract_rtf_text(b"plain text")
        rng = random.Random(0x127F)
        base = make_rtf(["alpha beta", "gamma"])
        for _ in range(300):
            b = bytearray(base)
            op = rng.randrange(3)
            if op == 0 and len(b) > 6:
                b = b[: rng.randrange(6, len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(len(b))
                del b[i : i + rng.randrange(1, 10)]
            try:
                extract_rtf_text(bytes(b))
            except ValueError:
                pass

    def test_stage_and_router(self, spark):
        from clustering_spark.operators import multimodal as mm
        from clustering_spark.operators.office import make_rtf

        df = spark.createDataFrame(
            [(1, make_rtf(["Memo text body."]))],
            "id long, blob binary",
        )
        out = office_text(df, "blob", "id").collect()[0]
        assert (out["kind"], out["status"]) == ("rtf", "ok")
        assert out["text"] == "Memo text body."
        route = mm.media_header_meta(df, "blob", "id").collect()[0]
        assert (route["media_type"], route["format"]) == (
            "document", "rtf",
        )


def test_rtf_bin_payload_cannot_corrupt_group_tracking():
    """\\binN embeds N raw bytes that are not RTF: '}' bytes inside
    them must not pop the group stack (review batch 31)."""
    from clustering_spark.operators.office import extract_rtf_text

    payload = b"}}}}{{{{\x00\xff"  # hostile raw bytes
    blob = (
        b"{\\rtf1{\\pict\\bin" + str(len(payload)).encode() + b" "
        + payload + b"}after pict\\par}"
    )
    t = extract_rtf_text(blob)
    assert t == "after pict"


def test_epub_budget_abort_accounting(monkeypatch):
    """Round-13 ADVICE: same accounting contract as
    extract_pdf_text — the overflowing member and everything after it
    count failed exactly once, extraction stops decoding."""
    from clustering_spark.operators import office as offmod
    from clustering_spark.operators.office import (
        extract_epub_text,
        make_epub,
    )

    monkeypatch.setattr(offmod, "MAX_TEXT_BYTES", 10)
    text, ok, bad = extract_epub_text(
        make_epub(["tiny", "way past the ten byte budget", "after"])
    )
    assert (ok, bad) == (1, 2)
    assert text == "tiny"


def test_xlsx_inline_strings_extracted():
    """Round-13 review batch 34: streaming/generated workbooks store
    strings INLINE (<c t="inlineStr"><is><t>) instead of the shared-
    string table — an all-inline workbook must not extract empty,
    and mixed storage yields both."""
    from clustering_spark.operators.office import (
        _zip_bytes,
        extract_xlsx_text,
    )

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>inline alpha</t></is></c>'
        '<c r="B1"><v>42</v></c>'
        '<c r="C1" t="s"><v>0</v></c>'
        "</row></sheetData></worksheet>"
    ).encode()
    inline_only = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "xl/workbook.xml": b"<wb/>",
            "xl/worksheets/sheet1.xml": sheet,
        }
    )
    assert extract_xlsx_text(inline_only) == "inline alpha"

    sst = (
        f'<?xml version="1.0"?><sst xmlns="{ns}">'
        "<si><t>shared beta</t></si></sst>"
    ).encode()
    mixed = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "xl/workbook.xml": b"<wb/>",
            "xl/sharedStrings.xml": sst,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )
    out = extract_xlsx_text(mixed)
    assert "shared beta" in out and "inline alpha" in out
    # the numeric cell (42) is data, never fabricated into prose
    assert "42" not in out


def test_xlsx_nonconventional_sheet_names_extracted():
    """Round-13 advisor: OOXML sheet part names are ARBITRARY
    (resolved via workbook rels) — sheetN.xml is only a convention.
    A workbook whose parts are named otherwise must still yield its
    inline strings; conventionally-named parts keep numeric order
    first."""
    from clustering_spark.operators.office import (
        _zip_bytes,
        extract_xlsx_text,
    )

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

    def sheet(txt):
        return (
            f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
            '<sheetData><row r="1">'
            f'<c r="A1" t="inlineStr"><is><t>{txt}</t></is></c>'
            "</row></sheetData></worksheet>"
        ).encode()

    odd = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "xl/workbook.xml": b"<wb/>",
            "xl/worksheets/Datenblatt_A.xml": sheet("odd gamma"),
        }
    )
    assert extract_xlsx_text(odd) == "odd gamma"

    mixed = _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "xl/workbook.xml": b"<wb/>",
            "xl/worksheets/sheet2.xml": sheet("conv two"),
            "xl/worksheets/sheet10.xml": sheet("conv ten"),
            "xl/worksheets/Datenblatt_A.xml": sheet("odd gamma"),
            # subdirectory members (e.g. _rels) are NOT sheets
            "xl/worksheets/_rels/sheet2.xml.rels": b"<r/>",
        }
    )
    # conventional sheets in NUMERIC order (2 before 10), then the
    # non-conventional part
    assert extract_xlsx_text(mixed).split("\n") == [
        "conv two",
        "conv ten",
        "odd gamma",
    ]
