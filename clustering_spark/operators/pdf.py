"""Stdlib PDF structural pass (public ISO 32000 layout): version,
encryption flag, page count, and best-effort text extraction for the
forms a crawl corpus is mostly made of — classic cross-reference
tables AND cross-reference streams with object streams (zlib is in
the stdlib, so FlateDecode is fully supported), simple-font text
operators (Tj / TJ / ' / "), literal and hex strings.

What this is: the routing + text-mining first pass a 100 TB crawl
needs over ``application/pdf`` blobs — page counts and encryption
for curation filters, extracted text feeding the SAME downstream
stages HTML does (text_quality, dedup, language ID). What this is
NOT: a renderer. Encrypted documents, exotic filters (JBIG2, JPX,
Crypt), and composite/CID fonts with custom CMaps degrade honestly:
`pdf_meta` reports what it can prove, `extract_pdf_text` returns the
text of the streams it can decode and counts the ones it cannot
(never silently wrong, never batch-fatal in the Spark stages).

The reference system (ykursadkaya/Clustering) has no document
surface; this module belongs to the LLM-pipeline extension
(SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import re
import struct
import zlib

from clustering_spark.operators.errors import EncryptedContainerError
from clustering_spark.operators.inflate import bounded_inflate

# parse budgets: crafted PDFs must not hold a task hostage
MAX_OBJECTS = 500_000
MAX_TEXT_BYTES = 64 * 1024 * 1024

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    """An indirect reference 'n g R'."""

    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


# containers nested deeper than this are crafted, not real documents;
# the lexer recurses per nesting level, so an explicit cap keeps a
# hostile blob from RecursionError-ing past the Spark stages' degrade
# handlers (ValueError IS the degrade contract)
MAX_NESTING = 256


class _Lexer:
    """Minimal PDF object lexer over a bytes buffer."""

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos
        self.depth = 0

    def _skip_ws(self) -> None:
        b, n = self.b, len(self.b)
        while self.pos < n:
            c = self.b[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and b[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse(self):
        """Parse one object at the cursor. Returns dict/list/bytes
        (strings), int/float, bool, None, _Ref, or a name str."""
        self._skip_ws()
        b, n = self.b, len(self.b)
        if self.pos >= n:
            raise ValueError("unexpected end of PDF data")
        c = b[self.pos]
        if b[self.pos : self.pos + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # <hex string>
            return self._parse_hex_string()
        if c == 0x28:  # (literal string)
            return self._parse_literal_string()
        if c == 0x5B:  # [ array ]
            self.pos += 1
            self.depth += 1
            if self.depth > MAX_NESTING:
                raise ValueError("PDF containers nested too deeply")
            out = []
            while True:
                self._skip_ws()
                if self.pos >= n:
                    raise ValueError("unterminated PDF array")
                if b[self.pos] == 0x5D:
                    self.pos += 1
                    self.depth -= 1
                    return out
                out.append(self.parse())
        if c == 0x2F:  # /Name
            return self._parse_name()
        if b[self.pos : self.pos + 4] == b"true":
            self.pos += 4
            return True
        if b[self.pos : self.pos + 5] == b"false":
            self.pos += 5
            return False
        if b[self.pos : self.pos + 4] == b"null":
            self.pos += 4
            return None
        # number, possibly an indirect reference "n g R"
        m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", b[self.pos : self.pos + 64])
        if not m:
            raise ValueError(
                f"unparseable PDF token at offset {self.pos}"
            )
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        val = int(tok)
        # lookahead for "g R"
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"\d+", b[self.pos : self.pos + 16])
        if m2:
            after = self.pos + len(m2.group(0))
            la = _Lexer(b, after)
            la._skip_ws()
            if b[la.pos : la.pos + 1] == b"R" and (
                la.pos + 1 >= n or b[la.pos + 1] in _WS + _DELIM
            ):
                self.pos = la.pos + 1
                return _Ref(val)
        self.pos = save
        return val

    def _parse_name(self) -> str:
        b, n = self.b, len(self.b)
        self.pos += 1
        out = bytearray()
        while self.pos < n:
            c = b[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # #xx escape
                try:
                    out.append(int(b[self.pos + 1 : self.pos + 3], 16))
                    self.pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            self.pos += 1
        return "/" + out.decode("latin-1")

    def _parse_dict(self) -> dict:
        self.pos += 2
        self.depth += 1
        if self.depth > MAX_NESTING:
            raise ValueError("PDF containers nested too deeply")
        out = {}
        b, n = self.b, len(self.b)
        while True:
            self._skip_ws()
            if b[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                self.depth -= 1
                return out
            if self.pos >= n:
                raise ValueError("unterminated PDF dictionary")
            key = self.parse()
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("PDF dictionary key is not a name")
            out[key] = self.parse()

    def _parse_hex_string(self) -> bytes:
        b, n = self.b, len(self.b)
        end = b.find(b">", self.pos + 1)
        if end < 0:
            raise ValueError("unterminated hex string")
        hx = bytes(
            c for c in b[self.pos + 1 : end] if c not in _WS
        ).decode("latin-1")
        if len(hx) % 2:
            hx += "0"
        self.pos = end + 1
        try:
            return bytes.fromhex(hx)
        except ValueError as e:
            raise ValueError("bad hex string") from e

    def _parse_literal_string(self) -> bytes:
        b, n = self.b, len(self.b)
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = b[self.pos]
            if c == 0x5C:  # backslash escape
                self.pos += 1
                if self.pos >= n:
                    break
                e = b[self.pos]
                mapped = {
                    0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09,
                    0x62: 0x08, 0x66: 0x0C, 0x28: 0x28,
                    0x29: 0x29, 0x5C: 0x5C,
                }.get(e)
                if mapped is not None:
                    out.append(mapped)
                    self.pos += 1
                elif e in b"01234567":  # octal, up to 3 digits
                    oct_ = bytearray([e])
                    self.pos += 1
                    while (
                        len(oct_) < 3
                        and self.pos < n
                        and b[self.pos] in b"01234567"
                    ):
                        oct_.append(b[self.pos])
                        self.pos += 1
                    out.append(int(oct_, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if (
                        e == 0x0D
                        and self.pos < n
                        and b[self.pos] == 0x0A
                    ):
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        raise ValueError("unterminated literal string")


def _decode_stream(sdict: dict, raw: bytes) -> bytes:
    """Apply the stream's filter chain. FlateDecode (+ the PNG Up/Sub
    predictors xref streams use) and ASCIIHexDecode are supported;
    anything else raises NotImplementedError with the filter named."""
    filters = sdict.get("/Filter")
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = sdict.get("/DecodeParms")
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for filt, parm in zip(filters, parms):
        if filt == "/FlateDecode":
            # bounded inflate: the budget must cap the ALLOCATION,
            # not be checked after a hostile ~1000:1 stream has
            # already materialized gigabytes
            data = bounded_inflate(data, MAX_TEXT_BYTES, "Flate")
            if isinstance(parm, dict) and parm.get("/Predictor", 1) > 1:
                data = _png_unpredict(
                    data,
                    int(parm.get("/Columns", 1)),
                    int(parm.get("/Colors", 1)),
                    int(parm.get("/BitsPerComponent", 8)),
                )
        elif filt == "/ASCIIHexDecode":
            hx = data.split(b">")[0]
            hx = bytes(c for c in hx if c not in _WS).decode("latin-1")
            if len(hx) % 2:
                hx += "0"
            data = bytes.fromhex(hx)
        else:
            raise NotImplementedError(f"PDF stream filter {filt}")
        if len(data) > MAX_TEXT_BYTES:
            raise ValueError("PDF stream exceeds decode budget")
    return data


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Reverse PNG row predictors (per-row tag byte) — xref streams
    almost always use Up(2)."""
    stride = max(1, columns * colors * bpc // 8)
    row_len = stride + 1
    if columns <= 0 or len(data) % row_len:
        raise ValueError("bad predictor geometry")
    out = bytearray()
    prev = bytearray(stride)
    for r in range(len(data) // row_len):
        tag = data[r * row_len]
        row = bytearray(data[r * row_len + 1 : (r + 1) * row_len])
        if tag == 0:
            pass
        elif tag == 1:  # Sub
            for i in range(1, stride):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif tag == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        else:
            raise NotImplementedError(f"PNG predictor tag {tag}")
        out += row
        prev = row
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Parsed object store for one PDF blob: resolves the trailer /
    xref chain (classic tables AND xref streams), pulls objects out
    of object streams, and exposes dictionary-graph traversal. A
    best-effort brute scan of 'N G obj' headers backs up broken xref
    offsets (the crawl reality: truncated/appended files)."""

    def __init__(self, b: bytes):
        if not b.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.b = b
        m = re.match(rb"%PDF-(\d+\.\d+)", b)
        self.version = m.group(1).decode("ascii") if m else None
        self.trailer: dict = {}
        self._offsets: dict[int, int] = {}
        self._in_objstm: dict[int, int] = {}  # obj num -> container num
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple] = {}
        self._scanned = False
        self._load_xref_chain()

    # -- xref machinery ------------------------------------------------

    def _load_xref_chain(self) -> None:
        tail = self.b[-2048:]
        idx = tail.rfind(b"startxref")
        if idx < 0:
            self._brute_scan()
            return
        lex = _Lexer(tail, idx + len(b"startxref"))
        try:
            start = lex.parse()
        except ValueError:
            self._brute_scan()
            return
        seen = set()
        pos = start if isinstance(start, int) else -1
        while isinstance(pos, int) and 0 <= pos < len(self.b):
            if pos in seen or len(seen) > 64:
                break
            seen.add(pos)
            try:
                trailer = self._load_xref_at(pos)
            except (ValueError, NotImplementedError):
                self._brute_scan()
                return
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            pos = trailer.get("/Prev", None)
        if "/Root" not in self.trailer:
            self._brute_scan()

    def _load_xref_at(self, pos: int) -> dict:
        b = self.b
        lex = _Lexer(b, pos)
        lex._skip_ws()
        if b[lex.pos : lex.pos + 4] == b"xref":
            return self._load_classic_xref(lex.pos + 4)
        # otherwise: a cross-reference STREAM object
        m = _OBJ_RE.match(b, lex.pos)
        if not m:
            raise ValueError("no xref table or stream at startxref")
        return self._load_xref_stream(m.end())

    def _load_classic_xref(self, pos: int) -> dict:
        b = self.b
        lex = _Lexer(b, pos)
        while True:
            lex._skip_ws()
            if b[lex.pos : lex.pos + 7] == b"trailer":
                lex.pos += 7
                t = lex.parse()
                if not isinstance(t, dict):
                    raise ValueError("PDF trailer is not a dictionary")
                return t
            m = re.match(rb"(\d+)\s+(\d+)", b[lex.pos : lex.pos + 48])
            if not m:
                raise ValueError("malformed classic xref subsection")
            first, count = int(m.group(1)), int(m.group(2))
            if count > MAX_OBJECTS:
                raise ValueError("implausible xref subsection size")
            lex.pos += m.end()
            # entries are fixed 20-byte records
            lex._skip_ws()
            for i in range(count):
                rec = b[lex.pos : lex.pos + 20]
                if len(rec) < 18:
                    raise ValueError("truncated xref entry")
                off = int(rec[:10])
                kind = rec[17:18]
                num = first + i
                if kind == b"n":
                    self._offsets.setdefault(num, off)
                lex.pos += 20 if rec[18:20] in (b"\r\n", b" \r", b" \n") else 18
                lex._skip_ws()

    def _load_xref_stream(self, pos_after_obj: int) -> dict:
        sdict, data = self._read_stream_at(pos_after_obj)
        w = sdict.get("/W")
        if not (isinstance(w, list) and len(w) >= 3):
            raise ValueError("xref stream lacks /W")
        w0, w1, w2 = (int(x) for x in w[:3])
        size = int(sdict.get("/Size", 0))
        index = sdict.get("/Index", [0, size])
        rec_len = w0 + w1 + w2
        if rec_len == 0 or rec_len > 32:
            raise ValueError("bad xref stream record width")
        pairs = [
            (int(index[i]), int(index[i + 1]))
            for i in range(0, len(index) - 1, 2)
        ]
        p = 0

        def field(rec: bytes, a: int, n: int, default: int) -> int:
            if n == 0:
                return default
            return int.from_bytes(rec[a : a + n], "big")

        for first, count in pairs:
            if count > MAX_OBJECTS:
                raise ValueError("implausible xref stream subsection")
            for i in range(count):
                rec = data[p : p + rec_len]
                p += rec_len
                if len(rec) < rec_len:
                    raise ValueError("truncated xref stream")
                typ = field(rec, 0, w0, 1)
                f2 = field(rec, w0, w1, 0)
                f3 = field(rec, w0 + w1, w2, 0)
                num = first + i
                if typ == 1:
                    self._offsets.setdefault(num, f2)
                elif typ == 2:
                    self._in_objstm.setdefault(num, f2)
        return sdict

    def _read_stream_at(self, pos_after_obj: int) -> tuple[dict, bytes]:
        """(stream dict, decoded data) for the object whose 'N G obj'
        header ends at pos_after_obj."""
        lex = _Lexer(self.b, pos_after_obj)
        sdict = lex.parse()
        if not isinstance(sdict, dict):
            raise ValueError("expected a stream dictionary")
        lex._skip_ws()
        if self.b[lex.pos : lex.pos + 6] != b"stream":
            raise ValueError("expected 'stream' keyword")
        p = lex.pos + 6
        if self.b[p : p + 2] == b"\r\n":
            p += 2
        elif self.b[p : p + 1] in (b"\n", b"\r"):
            p += 1
        length = sdict.get("/Length")
        if isinstance(length, _Ref):
            length = self.get(length.num)
        if not isinstance(length, int) or length < 0:
            # salvage: scan for endstream
            end = self.b.find(b"endstream", p)
            if end < 0:
                raise ValueError("stream without Length or endstream")
            length = end - p
        raw = self.b[p : p + length]
        if len(raw) < length:
            raise ValueError("stream data past end of file")
        return sdict, _decode_stream(sdict, raw)

    def _brute_scan(self) -> None:
        """Fallback index: scan every 'N G obj' header (last
        definition wins, as in incremental updates) and find a /Root
        by inspecting trailer-looking dictionaries."""
        if self._scanned:
            return
        self._scanned = True
        for m in _OBJ_RE.finditer(self.b):
            self._offsets[int(m.group(1))] = m.start()
            if len(self._offsets) > MAX_OBJECTS:
                raise ValueError("implausible PDF object count")
        if "/Root" not in self.trailer:
            for m in re.finditer(rb"/Root\b", self.b):
                start = self.b.rfind(b"<<", 0, m.start())
                if start < 0:
                    continue
                try:
                    t = _Lexer(self.b, start).parse()
                except (ValueError, NotImplementedError):
                    continue
                if isinstance(t, dict) and "/Root" in t:
                    for k, v in t.items():
                        self.trailer.setdefault(k, v)
                    break

    # -- object access --------------------------------------------------

    def get(self, num: int):
        """Fetch object ``num``, following object-stream indirection."""
        if num in self._cache:
            return self._cache[num]
        self._cache[num] = None  # cycle guard
        obj = None
        if num in self._offsets:
            m = _OBJ_RE.match(self.b, self._offsets[num])
            if m is None:
                # stale offset (crawl reality) — brute scan once
                self._brute_scan()
                m = (
                    _OBJ_RE.match(self.b, self._offsets.get(num, -1))
                    if self._offsets.get(num, -1) >= 0
                    else None
                )
            if m is not None:
                lex = _Lexer(self.b, m.end())
                obj = lex.parse()
                lex._skip_ws()
                if self.b[lex.pos : lex.pos + 6] == b"stream":
                    obj = ("__stream__", obj, m.end())
        elif num in self._in_objstm:
            obj = self._from_objstm(num)
        self._cache[num] = obj
        return obj

    def _objstm_payload(self, container: int):
        """(decoded payload, /First, {obj num -> offset}) for an
        ObjStm, cached per container: an n-object stream inflates and
        parses its header ONCE, not once per member (the O(n²) the
        per-row 100 TB kernel cannot afford)."""
        cached = self._objstm_cache.get(container)
        if cached is not None:
            return cached
        sdict, data = self._stream_of(container)
        if sdict is None or sdict.get("/Type") != "/ObjStm":
            raise ValueError("xref points into a non-ObjStm object")
        n = int(self.resolve(sdict.get("/N", 0)) or 0)
        first = int(self.resolve(sdict.get("/First", 0)) or 0)
        head = _Lexer(data, 0)
        index: dict[int, int] = {}
        for _ in range(n):
            onum = head.parse()
            ooff = head.parse()
            if isinstance(onum, int) and isinstance(ooff, int):
                index.setdefault(onum, ooff)  # first definition wins
        cached = (data, first, index)
        self._objstm_cache[container] = cached
        return cached

    def _from_objstm(self, num: int) -> object:
        data, first, index = self._objstm_payload(self._in_objstm[num])
        if num not in index:
            raise ValueError(f"object {num} not found in its ObjStm")
        return _Lexer(data, first + index[num]).parse()

    def _stream_of(self, num: int):
        """(dict, decoded bytes) when object num is a stream."""
        obj = self.get(num)
        if (
            isinstance(obj, tuple)
            and len(obj) == 3
            and obj[0] == "__stream__"
        ):
            return self._read_stream_at(obj[2])
        return None, b""

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.get(v.num)
            seen += 1
            if seen > 32:
                raise ValueError("reference cycle")
        if isinstance(v, tuple) and len(v) == 3 and v[0] == "__stream__":
            return v[1]
        return v

    # -- document-level queries -----------------------------------------

    def is_encrypted(self) -> bool:
        return "/Encrypt" in self.trailer

    def page_count(self) -> int | None:
        """/Root -> /Pages -> /Count when the catalog is intact, else
        a count of /Type /Page leaf objects (brute scan), else None."""
        root = self.resolve(self.trailer.get("/Root"))
        if isinstance(root, dict):
            pages = self.resolve(root.get("/Pages"))
            if isinstance(pages, dict):
                count = self.resolve(pages.get("/Count"))
                if isinstance(count, int) and count >= 0:
                    return count
        self._brute_scan()
        n = 0
        for num in list(self._offsets):
            obj = self.get(num)
            if isinstance(obj, dict) and obj.get("/Type") == "/Page":
                n += 1
        return n or None

    def _walk_pages(self, node, depth: int = 0, _seen=None):
        """Yield page dicts in document order. The visited set (by
        object identity — ``get`` caches, so each object number is one
        dict instance) is what actually stops crafted cycles: a depth
        cap alone lets a self-referencing /Kids [N 0 R N 0 R] node
        branch into 2^depth traversals without ever yielding a page —
        an executor hang, not a parse error (round-13 review batch).
        Legitimate trees never share nodes (one parent per kid), so
        skipping revisits changes nothing for real documents."""
        if _seen is None:
            _seen = set()
        if depth > 64 or not isinstance(node, dict) or id(node) in _seen:
            return
        t = node.get("/Type")
        if t == "/Page":
            yield node
            return
        _seen.add(id(node))
        kids = self.resolve(node.get("/Kids"))
        if isinstance(kids, list):
            for k in kids[:MAX_OBJECTS]:
                yield from self._walk_pages(
                    self.resolve(k), depth + 1, _seen
                )

    def pages(self):
        root = self.resolve(self.trailer.get("/Root"))
        if isinstance(root, dict):
            pages = self.resolve(root.get("/Pages"))
            yield from self._walk_pages(pages)

    def page_content(self, page: dict) -> bytes:
        """Concatenated decoded content streams of one page dict.
        /Contents is a stream ref, a ref to an array of stream refs,
        or a direct array — resolve the ARRAY but never the stream
        refs themselves (resolving one yields its dict, losing the
        data)."""
        contents = page.get("/Contents")
        if isinstance(contents, _Ref):
            target = self.get(contents.num)
            if isinstance(target, list):
                refs = target
            else:
                refs = [contents]
        elif isinstance(contents, list):
            refs = contents
        else:
            refs = []
        out = []
        for r in refs:
            if isinstance(r, _Ref):
                sdict, data = self._stream_of(r.num)
                if sdict is not None:
                    out.append(data)
        return b"\n".join(out)


# ---------------------------------------------------------------- text

_TEXT_OPS = re.compile(
    rb"(\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|\[|\]|/[^\s()<>\[\]{}/%]*"
    rb"|[-+.0-9]+|[A-Za-z'\"*]+)"
)


def _content_text(content: bytes) -> str:
    """Best-effort text from a content stream: Tj / ' / \" show one
    string; TJ shows an array (negative kerns > 180 units become a
    space); Td/TD/T*/TL manage line breaks. Simple-font bytes decode
    as latin-1 (the honest approximation without font CMaps; CID
    text shows up as mojibake which the downstream language-ID stage
    already flags)."""
    out: list[str] = []
    stack: list[bytes | float | str] = []
    in_array = False

    def show(s: bytes) -> None:
        out.append(s.decode("latin-1", "replace"))

    for m in _TEXT_OPS.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(":
            try:
                s = _Lexer(tok).parse()
            except ValueError:
                continue
            stack.append(s if isinstance(s, bytes) else b"")
        elif c == b"<":
            try:
                s = _Lexer(tok).parse()
            except ValueError:
                continue
            stack.append(s if isinstance(s, bytes) else b"")
        elif c == b"[":
            in_array = True
            stack.clear()
        elif c == b"]":
            in_array = False
        elif c == b"/":
            stack.append(tok.decode("latin-1"))
        elif c in b"-+.0123456789":
            try:
                stack.append(float(tok))
            except ValueError:
                pass
        else:
            op = tok
            if op == b"Tj":
                if stack and isinstance(stack[-1], bytes):
                    show(stack[-1])
            elif op == b"TJ":
                for el in stack:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, float) and el < -180:
                        out.append(" ")
            elif op in (b"'", b'"'):
                out.append("\n")
                if stack and isinstance(stack[-1], bytes):
                    show(stack[-1])
            elif op in (b"T*", b"TD"):
                out.append("\n")
            elif op == b"Td":
                # a Td with negative/zero x and negative y is the
                # common next-line idiom
                if (
                    len(stack) >= 2
                    and isinstance(stack[-1], float)
                    and stack[-1] != 0
                ):
                    out.append("\n")
            elif op == b"ET":
                out.append("\n")
            stack = [] if not in_array else stack
    text = "".join(out)
    # collapse the artifacts of per-glyph positioning
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


def pdf_meta(b: bytes) -> tuple[str | None, int | None, bool, int]:
    """(version, n_pages, encrypted, n_objects) — the routing pass.
    Raises ValueError when the blob is not parseable as PDF at all."""
    doc = PdfDocument(b)
    n_obj = len(doc._offsets) + len(doc._in_objstm)
    try:
        pages = doc.page_count()
    except (ValueError, NotImplementedError):
        pages = None
    return doc.version, pages, doc.is_encrypted(), n_obj


def extract_pdf_text(
    b: bytes, doc: PdfDocument | None = None
) -> tuple[str, int, int]:
    """(text, n_pages_extracted, n_pages_failed): per-page text via
    the content-stream walk. Encrypted documents raise ValueError
    (content is ciphertext — extracting would be silently wrong);
    pages whose streams need unsupported filters are COUNTED failed,
    not silently skipped. An already-parsed ``doc`` for the same
    bytes can be passed to avoid re-walking the xref chain (the
    pdf_text stage routes on encryption first).

    Budget accounting: once collected text would exceed
    MAX_TEXT_BYTES, extraction STOPS — the overflowing page and every
    remaining page count as failed (without decoding them), so
    ``n_pages_ok + n_pages_failed`` always equals the pages walked
    and the abort is O(remaining pages), not O(remaining decodes)."""
    if doc is None:
        doc = PdfDocument(b)
    if doc.is_encrypted():
        raise EncryptedContainerError(
            "encrypted PDF: content streams are ciphertext"
        )
    good = bad = 0
    parts: list[str] = []
    total = 0
    budget_hit = False
    for page in doc.pages():
        if budget_hit:
            bad += 1
            continue
        try:
            content = doc.page_content(page)
            t = _content_text(content)
            if t and total + len(t) > MAX_TEXT_BYTES:
                budget_hit = True
                bad += 1
                continue
            good += 1
            if t:
                total += len(t)
                parts.append(t)
        except NotImplementedError:
            bad += 1
        except ValueError:
            bad += 1
    return "\n\n".join(parts), good, bad


# ------------------------------------------------------------ fixtures


def make_pdf(
    pages: list[str],
    xref_stream: bool = False,
    use_objstm: bool = False,
    encrypted: bool = False,
    flate: bool = True,
) -> bytes:
    """Deterministic spec-shaped PDF fixture: one content stream per
    page string (Tj show operators, flate-compressed by default),
    classic xref table or cross-reference stream, optionally packing
    the page/catalog dictionaries into an object stream, optionally
    stamping an /Encrypt trailer entry (structure only — fixture
    content stays plaintext; real readers would decrypt)."""
    objects: dict[int, bytes] = {}
    n = len(pages)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
    objects[1] = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
    )
    objects[2] = (
        f"<< /Type /Pages /Count {n} /Kids [ {kids} ] >>".encode()
    )
    objects[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, text in enumerate(pages):
        page_num = 4 + 2 * i
        content_num = page_num + 1
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {content_num} 0 R >>"
        ).encode()
        lines = text.split("\n")
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            esc = (
                line.encode("latin-1", "replace")
                .replace(b"\\", b"\\\\")
                .replace(b"(", b"\\(")
                .replace(b")", b"\\)")
            )
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + esc + b") Tj")
        ops.append(b"ET")
        stream = b" ".join(ops)
        if flate:
            comp = zlib.compress(stream)
            objects[content_num] = (
                f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + comp + b"\nendstream"
            )
        else:
            objects[content_num] = (
                f"<< /Length {len(stream)} >>".encode()
                + b"\nstream\n" + stream + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    in_objstm: dict[int, int] = {}

    objstm_members = []
    if use_objstm:
        # pack the non-stream dictionaries into one object stream
        objstm_num = max(objects) + 1
        members = [
            (num, body)
            for num, body in sorted(objects.items())
            if b"stream" not in body
        ]
        head = b""
        payload = b""
        for num, body in members:
            head += f"{num} {len(payload)} ".encode()
            payload += body + b"\n"
            in_objstm[num] = objstm_num
        data = head + payload
        comp = zlib.compress(data)
        objstm_body = (
            f"<< /Type /ObjStm /N {len(members)} /First {len(head)} "
            f"/Length {len(comp)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + comp + b"\nendstream"
        )
        objects = {
            num: body
            for num, body in objects.items()
            if num not in in_objstm
        }
        objects[objstm_num] = objstm_body
        objstm_members = list(in_objstm)

    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"

    trailer_extra = b" /Encrypt 999 0 R" if encrypted else b""
    max_num = max(list(offsets) + objstm_members) + 1

    if not xref_stream:
        xref_pos = len(out)
        if use_objstm:
            raise ValueError(
                "object streams require an xref stream fixture"
            )
        out += b"xref\n"
        out += f"0 {max_num}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, max_num):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(max_num).encode()
            + b" /Root 1 0 R" + trailer_extra + b" >>\n"
        )
    else:
        xref_num = max_num
        xref_pos = len(out)
        recs = bytearray()
        recs += bytes([0]) + (0).to_bytes(4, "big") + bytes([0])
        for num in range(1, xref_num + 1):
            if num in in_objstm:
                recs += (
                    bytes([2])
                    + in_objstm[num].to_bytes(4, "big")
                    + bytes([objstm_members.index(num)])
                )
            elif num in offsets:
                recs += (
                    bytes([1]) + offsets[num].to_bytes(4, "big")
                    + bytes([0])
                )
            elif num == xref_num:
                recs += (
                    bytes([1]) + xref_pos.to_bytes(4, "big") + bytes([0])
                )
            else:
                recs += bytes([0]) + (0).to_bytes(4, "big") + bytes([0])
        comp = zlib.compress(bytes(recs))
        out += f"{xref_num} 0 obj\n".encode()
        out += (
            f"<< /Type /XRef /Size {xref_num + 1} /W [1 4 1] "
            f"/Root 1 0 R{trailer_extra.decode('latin-1')} "
            f"/Length {len(comp)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n" + comp + b"\nendstream\nendobj\n"
        )
    out += b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    return bytes(out)


# --------------------------------------------------------- Spark stages


PDF_META_SCHEMA = (
    "id long, format string, version string, n_pages int, "
    "encrypted boolean, n_objects int"
)

PDF_TEXT_SCHEMA = (
    "id long, status string, text string, "
    "n_pages_ok int, n_pages_failed int"
)


def pdf_header_meta(df, bin_col: str, id_col: str):
    """Per-blob PDF routing metadata (version / page count /
    encryption / object count) — the curation first pass over an
    ``application/pdf`` blob column. Mixed-corpus degrade contract
    (the image_header_meta doctrine): blobs without the %PDF- magic
    surface as format='unknown', structurally broken ones as
    'corrupt', NULL blobs as unknown — one bad row never fails a
    batch."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "format", "version", "n_pages", "encrypted",
            "n_objects",
        ]
        for pdf_ in it:
            out = []
            for rid, blob in zip(pdf_[id_col], pdf_[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["format"] = rid, "unknown"
                if blob is not None:
                    b = bytes(blob)
                    if b[:5] == b"%PDF-":
                        try:
                            (
                                row["version"], row["n_pages"],
                                row["encrypted"], row["n_objects"],
                            ) = pdf_meta(b)
                            row["format"] = "pdf"
                        except (ValueError, NotImplementedError,
                                struct.error):
                            row["format"] = "corrupt"
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, PDF_META_SCHEMA
    )


def pdf_text(df, bin_col: str, id_col: str):
    """Per-blob text extraction: the PDF analogue of strip_html,
    feeding the same downstream stages (text_quality, dedup,
    language ID). status ∈ ok / encrypted / corrupt / unknown; pages
    whose content streams need unsupported filters are counted in
    ``n_pages_failed``, never silently skipped. Extraction is
    per-blob CPU-bound Python — exactly what mapInPandas batches
    across executor cores; the blob column never rides a shuffle."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "status", "text", "n_pages_ok", "n_pages_failed"]
        for pdf_ in it:
            out = []
            for rid, blob in zip(pdf_[id_col], pdf_[bin_col]):
                row = dict.fromkeys(cols)
                row["id"], row["status"] = rid, "unknown"
                if blob is not None:
                    b = bytes(blob)
                    if b[:5] == b"%PDF-":
                        try:
                            # ONE xref-chain parse per blob: the doc
                            # built for the encryption check is the
                            # doc extraction walks
                            doc = PdfDocument(b)
                            if doc.is_encrypted():
                                row["status"] = "encrypted"
                            else:
                                (
                                    row["text"], row["n_pages_ok"],
                                    row["n_pages_failed"],
                                ) = extract_pdf_text(b, doc)
                                row["status"] = "ok"
                        except (ValueError, NotImplementedError,
                                struct.error):
                            row["status"] = "corrupt"
                            row["text"] = None
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, PDF_TEXT_SCHEMA
    )


__all__ = [
    "PdfDocument",
    "pdf_meta",
    "extract_pdf_text",
    "make_pdf",
    "pdf_header_meta",
    "pdf_text",
    "MAX_TEXT_BYTES",
]
