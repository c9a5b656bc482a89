"""Stdlib Office/EPUB document extraction (public OOXML / EPUB-OCF
layouts): DOCX, PPTX, XLSX and EPUB are all ZIP containers
(``zipfile`` is stdlib), and together with PDF and HTML they close
out the document modalities a web crawl actually carries. Structure
sniffing, per-container metadata, and text extraction feeding the
same downstream stages (text_quality, dedup, language ID) the HTML
and PDF legs feed.

Extraction honesty:
- DOCX: ``word/document.xml`` paragraph walk — ``w:t`` runs,
  ``w:tab`` -> tab, ``w:br`` -> newline, paragraphs -> newlines.
- PPTX: every ``ppt/slides/slideN.xml`` in numeric order; ``a:t``
  runs, ``a:p`` paragraphs, slides separated by blank lines.
- XLSX: the shared-string table (``xl/sharedStrings.xml``) — the
  text cells; numbers/formulas are data, not prose, and are not
  fabricated into text.
- EPUB: every ``.xhtml/.html`` member in ARCHIVE order (stated:
  spine order parsing is deliberately skipped — archive order is
  what crawler replays see); XHTML is well-formed XML, so the walk
  is an ElementTree text visit with script/style dropped and block
  elements becoming newlines (tag-soup HTML belongs to
  textnorm.strip_html, not here).
- Members with the ZIP encryption flag -> status 'encrypted'; CFB
  (legacy .doc/.xls and encrypted OOXML) is a different container
  entirely and stays an honest gate.

Zip-bomb posture: member reads are capped by declared AND actual
size, total text by MAX_TEXT_BYTES — one hostile blob never holds a
task.

The reference system (ykursadkaya/Clustering) has no document
surface; this module belongs to the LLM-pipeline extension
(SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
from xml.etree import ElementTree

from clustering_spark.operators.errors import EncryptedContainerError

MAX_MEMBER_BYTES = 64 * 1024 * 1024
MAX_TEXT_BYTES = 64 * 1024 * 1024

ZIP_MAGIC = b"PK\x03\x04"

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_XH = "{http://www.w3.org/1999/xhtml}"

_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 tr table blockquote section "
    "article br".split()
)


def _open_zip(b: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(b))
    except (zipfile.BadZipFile, OSError, RuntimeError) as e:
        raise ValueError(f"not a readable ZIP: {e}") from e


def _read_member(zf: zipfile.ZipFile, name: str) -> bytes:
    import zlib

    try:
        info = zf.getinfo(name)
        if info.flag_bits & 0x1:
            raise EncryptedContainerError(
                f"encrypted ZIP member {name}"
            )
        if info.file_size > MAX_MEMBER_BYTES:
            raise ValueError(f"ZIP member {name} exceeds read budget")
        # open/read re-parse the LOCAL header and inflate — both can
        # fail independently of the central directory on a corrupt
        # blob, so the whole read maps onto the ValueError contract
        with zf.open(name) as f:
            data = f.read(MAX_MEMBER_BYTES + 1)
    except (zipfile.BadZipFile, OSError, RuntimeError, EOFError,
            zlib.error) as e:
        raise ValueError(f"bad ZIP member {name}: {e}") from e
    if len(data) > MAX_MEMBER_BYTES:
        raise ValueError(f"ZIP member {name} lied about its size")
    return data


def zip_kind(b: bytes) -> str:
    """'docx' / 'pptx' / 'xlsx' / 'epub' / 'zip' from the member
    inventory. Raises ValueError when the blob is not a readable ZIP."""
    zf = _open_zip(b)
    try:
        names = set(zf.namelist())
    except (zipfile.BadZipFile, OSError, RuntimeError) as e:
        raise ValueError(f"bad ZIP directory: {e}") from e
    if "word/document.xml" in names:
        return "docx"
    if "ppt/presentation.xml" in names:
        return "pptx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "mimetype" in names:
        try:
            if _read_member(zf, "mimetype").strip() == (
                b"application/epub+zip"
            ):
                return "epub"
        except ValueError:
            pass
    return "zip"


def office_meta(b: bytes) -> tuple[str, int, int, bool]:
    """(kind, n_members, declared_uncompressed_bytes, any_encrypted)
    — the routing pass over a ZIP-container blob."""
    zf = _open_zip(b)
    infos = zf.infolist()
    total = sum(i.file_size for i in infos)
    enc = any(i.flag_bits & 0x1 for i in infos)
    return zip_kind(b), len(infos), total, enc


def _parse_xml(data: bytes) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed OOXML part: {e}") from e


def extract_docx_text(b: bytes) -> str:
    zf = _open_zip(b)
    root = _parse_xml(_read_member(zf, "word/document.xml"))
    paras = []
    for p in root.iter(_W + "p"):
        parts = []
        for el in p.iter():
            if el.tag == _W + "t" and el.text:
                parts.append(el.text)
            elif el.tag == _W + "tab":
                parts.append("\t")
            elif el.tag == _W + "br":
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras).strip()


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def extract_pptx_text(b: bytes) -> str:
    zf = _open_zip(b)
    slides = sorted(
        (int(m.group(1)), n)
        for n in zf.namelist()
        if (m := _SLIDE_RE.match(n))
    )
    out = []
    for _num, name in slides:
        root = _parse_xml(_read_member(zf, name))
        paras = []
        for p in root.iter(_A + "p"):
            runs = [t.text for t in p.iter(_A + "t") if t.text]
            if runs:
                paras.append("".join(runs))
        if paras:
            out.append("\n".join(paras))
    return "\n\n".join(out).strip()


_SHEET_RE = re.compile(r"^xl/worksheets/sheet(\d+)\.xml$")


def extract_xlsx_text(b: bytes) -> str:
    """Text cells from BOTH string storages the spec allows: the
    shared-string table (xl/sharedStrings.xml — how writers that
    dedup strings store them) AND inline strings (<c t="inlineStr">
    <is><t> in the sheet XML — how streaming/generated workbooks
    store them; round-13 review batch: these were silently dropped,
    so an all-inline workbook extracted as empty). Sheets walk in
    numeric order; numbers/formulas are data, not prose, and are not
    fabricated into text."""
    zf = _open_zip(b)
    names = zf.namelist()
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    lines = []
    if "xl/sharedStrings.xml" in names:
        root = _parse_xml(_read_member(zf, "xl/sharedStrings.xml"))
        for si in root.iter(ns + "si"):
            runs = [t.text for t in si.iter(ns + "t") if t.text]
            if runs:
                lines.append("".join(runs))
    # sheet part names are ARBITRARY per the spec (resolved via
    # workbook rels) — sheetN.xml is only the common convention.
    # Walk conventionally-named parts first in numeric order (stable
    # output for the usual case), then every other xl/worksheets/
    # *.xml member lexicographically, so a generator that names its
    # parts differently still yields its inline strings (round-13
    # advisor finding — the exact bug class the inline-string fix
    # addressed).
    conv = sorted(
        (int(m.group(1)), n)
        for n in names
        if (m := _SHEET_RE.match(n))
    )
    conv_names = [n for _num, n in conv]
    extra = sorted(
        n
        for n in names
        if n.startswith("xl/worksheets/")
        and n.endswith(".xml")
        and n.count("/") == 2
        and n not in set(conv_names)
    )
    for name in conv_names + extra:
        root = _parse_xml(_read_member(zf, name))
        for is_el in root.iter(ns + "is"):
            runs = [t.text for t in is_el.iter(ns + "t") if t.text]
            if runs:
                lines.append("".join(runs))
    return "\n".join(lines).strip()


def _xhtml_text(root: ElementTree.Element) -> str:
    """Text visit over well-formed XHTML: script/style subtrees
    dropped, block elements produce newlines, inline elements fuse."""
    out: list[str] = []

    def local(tag) -> str:
        if not isinstance(tag, str):  # comments / PIs
            return ""
        return tag.rsplit("}", 1)[-1].lower()

    def visit(el) -> None:
        name = local(el.tag)
        # head carries metadata (title/meta/link), not document prose
        if name in ("script", "style", "noscript", "template", "head"):
            return
        if name in _BLOCK_TAGS:
            out.append("\n")
        if el.text:
            out.append(el.text)
        for child in el:
            visit(child)
            if child.tail:
                out.append(child.tail)
        if name in _BLOCK_TAGS:
            out.append("\n")

    visit(root)
    text = "".join(out)
    text = re.sub(r"[ \t\x0b\f\r]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def extract_epub_text(b: bytes) -> tuple[str, int, int]:
    """(text, n_docs_ok, n_docs_failed) over every XHTML member in
    archive order. Once collected text would exceed MAX_TEXT_BYTES,
    extraction STOPS: the overflowing member and every remaining one
    count as failed without being decoded, so ok+failed always equals
    the members walked (same accounting as extract_pdf_text)."""
    zf = _open_zip(b)
    ok = bad = 0
    parts = []
    total = 0
    budget_hit = False
    for name in zf.namelist():
        if not name.lower().endswith((".xhtml", ".html", ".htm")):
            continue
        if budget_hit:
            bad += 1
            continue
        try:
            t = _xhtml_text(_parse_xml(_read_member(zf, name)))
            if t and total + len(t) > MAX_TEXT_BYTES:
                budget_hit = True
                bad += 1
                continue
            ok += 1
            if t:
                total += len(t)
                parts.append(t)
        except ValueError:
            bad += 1
    return "\n\n".join(parts), ok, bad


def extract_office_text(b: bytes) -> tuple[str, str]:
    """(kind, text) for any supported ZIP-container document; plain
    'zip' archives yield empty text (an archive is not a document)."""
    kind = zip_kind(b)
    if kind == "docx":
        return kind, extract_docx_text(b)
    if kind == "pptx":
        return kind, extract_pptx_text(b)
    if kind == "xlsx":
        return kind, extract_xlsx_text(b)
    if kind == "epub":
        return kind, extract_epub_text(b)[0]
    return kind, ""


# --------------------------------------------------------- Spark stage


OFFICE_TEXT_SCHEMA = "id long, kind string, status string, text string"


def office_text(df, bin_col: str, id_col: str):
    """Per-blob Office/EPUB/RTF text extraction — the ZIP-container
    (and RTF) analogue of pdf_text, same degrade doctrine: blobs of
    no known document container surface as kind='unknown',
    broken/encrypted containers as status 'corrupt'/'encrypted',
    NULL as unknown; one bad row never fails a batch. One
    mapInPandas stage; blobs never ride a shuffle."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "kind", "status", "text"]
        for pdf_ in it:
            out = []
            for rid, blob in zip(pdf_[id_col], pdf_[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["kind"] = rid, "unknown"
                row["status"] = "unknown"
                if blob is not None:
                    b = bytes(blob)
                    if b[:4] == ZIP_MAGIC:
                        try:
                            row["kind"], row["text"] = (
                                extract_office_text(b)
                            )
                            row["status"] = "ok"
                        except EncryptedContainerError:
                            row["kind"] = "zip"
                            row["status"] = "encrypted"
                        except ValueError:
                            row["kind"] = "zip"
                            row["status"] = "corrupt"
                    elif b[: len(RTF_MAGIC)] == RTF_MAGIC:
                        row["kind"] = "rtf"
                        try:
                            row["text"] = extract_rtf_text(b)
                            row["status"] = "ok"
                        except ValueError:
                            row["status"] = "corrupt"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, OFFICE_TEXT_SCHEMA
    )


# ------------------------------------------------------------ fixtures


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


def make_docx(paragraphs: list[str]) -> bytes:
    """Minimal spec-shaped DOCX: [Content_Types].xml +
    word/document.xml with one w:p/w:r/w:t per paragraph."""
    body = "".join(
        f"<w:p><w:r><w:t>{_esc(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w='
        '"http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    return _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "word/document.xml": doc.encode(),
        }
    )


def make_pptx(slides: list[list[str]]) -> bytes:
    """Minimal PPTX: one slideN.xml per slide, one a:p per line."""
    members: dict[str, bytes] = {
        "[Content_Types].xml": b"<Types/>",
        "ppt/presentation.xml": b"<p/>",
    }
    for i, lines in enumerate(slides, 1):
        paras = "".join(
            f"<a:p><a:r><a:t>{_esc(t)}</a:t></a:r></a:p>" for t in lines
        )
        members[f"ppt/slides/slide{i}.xml"] = (
            '<?xml version="1.0"?><p:sld xmlns:p="x" xmlns:a='
            '"http://schemas.openxmlformats.org/drawingml/2006/main">'
            f"{paras}</p:sld>"
        ).encode()
    return _zip_bytes(members)


def make_xlsx(strings: list[str]) -> bytes:
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sst = "".join(f"<si><t>{_esc(s)}</t></si>" for s in strings)
    return _zip_bytes(
        {
            "[Content_Types].xml": b"<Types/>",
            "xl/workbook.xml": b"<wb/>",
            "xl/sharedStrings.xml": (
                f'<?xml version="1.0"?><sst xmlns="{ns}">{sst}</sst>'
            ).encode(),
        }
    )


def make_epub(chapters: list[str]) -> bytes:
    """Minimal EPUB-OCF: mimetype + one XHTML chapter per string."""
    members: dict[str, bytes] = {
        "mimetype": b"application/epub+zip",
        "META-INF/container.xml": b"<container/>",
    }
    for i, text in enumerate(chapters, 1):
        members[f"OEBPS/ch{i}.xhtml"] = (
            '<?xml version="1.0"?><html xmlns='
            '"http://www.w3.org/1999/xhtml"><head><title>c</title>'
            "<style>p{color:red}</style></head>"
            f"<body><p>{_esc(text)}</p></body></html>"
        ).encode()
    return _zip_bytes(members)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


__all__ = [
    "zip_kind",
    "office_meta",
    "extract_docx_text",
    "extract_pptx_text",
    "extract_xlsx_text",
    "extract_epub_text",
    "extract_office_text",
    "office_text",
    "make_docx",
    "make_pptx",
    "make_xlsx",
    "make_epub",
    "extract_rtf_text",
    "make_rtf",
    "ZIP_MAGIC",
    "RTF_MAGIC",
]


# ---------------------------------------------------------------- RTF

RTF_MAGIC = b"{\\rtf"

# destination groups whose payload is formatting/binary, not prose
_RTF_SKIP = frozenset(
    (
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"object", b"header", b"footer", b"headerl", b"headerr",
        b"headerf", b"footerl", b"footerr", b"footerf", b"filetbl",
        b"listtable", b"listoverridetable", b"revtbl", b"generator",
        b"themedata", b"colorschememapping", b"datastore",
        b"latentstyles",
    )
)

_RTF_CW = re.compile(rb"\\([a-z]+)(-?\d+)? ?|\\([^a-z])", re.I)


def extract_rtf_text(b: bytes) -> str:
    """Best-effort text from an RTF document (public RTF spec): group
    walk with destination skipping (font/color/style tables,
    pictures, headers), ``\\par``/``\\line`` -> newline, ``\\tab`` ->
    tab, ``\\'hh`` hex escapes decoded as cp1252, ``\\uN`` unicode
    escapes honoring the current ``\\ucN`` skip count. Iterative (an
    explicit group stack — crafted nesting cannot RecursionError) and
    budget-capped. Raises ValueError when the blob is not RTF."""
    if b[: len(RTF_MAGIC)] != RTF_MAGIC:
        raise ValueError("not an RTF document")
    out: list[str] = []
    total = 0
    pos = 0
    n = len(b)
    # group stack entries: [skipping, uc_count]
    stack: list[list] = [[False, 1]]
    pending_skip = 0  # chars to drop after \uN
    while pos < n:
        c = b[pos]
        if c == 0x7B:  # {
            stack.append(list(stack[-1]))
            pos += 1
            continue
        if c == 0x7D:  # }
            if len(stack) > 1:
                stack.pop()
            pos += 1
            continue
        if c == 0x5C:  # backslash
            m = _RTF_CW.match(b, pos)
            if not m:
                pos += 1
                continue
            pos = m.end()
            if m.group(3) is not None:  # control symbol
                sym = m.group(3)
                if sym == b"*":
                    # ignorable destination: skip unless a known
                    # text-bearing word follows (we skip all \*)
                    stack[-1][0] = True
                elif not stack[-1][0]:
                    if sym in (b"\\", b"{", b"}"):
                        out.append(sym.decode("latin-1"))
                    elif sym == b"'":
                        hx = b[pos : pos + 2]
                        pos += 2
                        if pending_skip > 0:
                            pending_skip -= 1
                        else:
                            try:
                                out.append(
                                    bytes.fromhex(
                                        hx.decode("latin-1")
                                    ).decode("cp1252", "replace")
                                )
                            except ValueError:
                                pass
                    elif sym == b"~":
                        out.append("\u00a0")
                continue
            word = m.group(1).lower()
            arg = m.group(2)
            if word == b"bin":
                # \binN embeds N bytes of RAW binary — they are not
                # RTF at all: a '}' byte inside them would corrupt
                # the group stack and a '{' could leak binary into
                # the text, so skip them positionally
                skip = max(0, int(arg or 0))
                pos = min(n, pos + skip)
                continue
            if word in _RTF_SKIP:
                stack[-1][0] = True
            elif word == b"uc".lower() and arg is not None:
                stack[-1][1] = max(0, int(arg))
            elif not stack[-1][0]:
                if word in (b"par", b"line", b"sect", b"page", b"row"):
                    out.append("\n")
                elif word == b"cell":
                    out.append("\t")
                elif word == b"tab":
                    out.append("\t")
                elif word == b"u" and arg is not None:
                    cp = int(arg)
                    if cp < 0:
                        cp += 65536
                    out.append(chr(cp))
                    pending_skip = stack[-1][1]
            continue
        if c in (0x0D, 0x0A):
            pos += 1
            continue
        # plain text run up to the next control character
        end = pos
        while end < n and b[end] not in (0x5C, 0x7B, 0x7D, 0x0D, 0x0A):
            end += 1
        if not stack[-1][0]:
            chunk = b[pos:end].decode("cp1252", "replace")
            if pending_skip:
                drop = min(pending_skip, len(chunk))
                chunk = chunk[drop:]
                pending_skip -= drop
            out.append(chunk)
            total += len(chunk)
            if total > MAX_TEXT_BYTES:
                raise ValueError("RTF text exceeds budget")
        pos = end
    text = "".join(out)
    text = re.sub(r"[ \t\x0b\f]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def make_rtf(paragraphs: list[str]) -> bytes:
    """Minimal spec-shaped RTF fixture with a font table the
    extractor must skip."""
    body = "\\par ".join(
        p.replace("\\", "\\\\").replace("{", "\\{").replace("}", "\\}")
        for p in paragraphs
    )
    return (
        "{\\rtf1\\ansi{\\fonttbl{\\f0 Times New Roman;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "\\f0\\fs24 " + body + "\\par}"
    ).encode("cp1252")
