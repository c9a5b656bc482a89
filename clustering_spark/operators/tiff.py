"""Stdlib+numpy TIFF codec (public TIFF 6.0 layout): decode for the
compressions scanned-document corpora actually use — uncompressed
(1), CCITT G3 1D/2D and G4 fax (2/3/4, via operators/ccitt), LZW (5,
MSB-first variable-width codes with the spec's EARLY code-width
change and horizontal-differencing predictor 2), new-style
JPEG-in-TIFF (7, incl. the JPEGTables abbreviated layout), Deflate
(8/32946, bounded inflate), and PackBits (32773) — over bilevel
(1-bit, both photometric polarities), 8- and 16-bit grayscale/RGB
(16-bit reduces to the high byte under the file byte order), chunky
AND planar (PlanarConfiguration 2) layouts, strips AND tiles.
Old-style JPEG (6), exotic bit depths, and predictor-2-on-16-bit
raise a precise NotImplementedError (the PIL route handles them when
present). An encoder emits the same forms so round-trips pin the
decoder with no binary assets.

TIFF joins FAKE/PNG/JPEG/GIF/BMP as the fifth codec-free image
family: the header pass (multimodal._tiff_meta) routes it already;
this module closes the pixel gate for the dominant scanned-doc
compressions.

Reference parity note: the reference system (ykursadkaya/Clustering)
has no image surface; this module belongs to the LLM-pipeline
multimodal extension (SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import struct

import numpy as np

from clustering_spark.operators.inflate import bounded_inflate

# same decompression-bomb budget as the JPEG/GIF/BMP codecs
MAX_DECODE_PIXELS = 64 * 1024 * 1024

_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, max_bytes: int) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12
    bit codes with the EARLY width change (the width grows when the
    next free slot is 2^w - 1, one code sooner than GIF). Truncated
    input yields the bytes decoded so far (strip salvage); a code
    beyond the table raises."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = bitbuf << 8 | data[pos]
            pos += 1
            nbits += 8
        code = bitbuf >> (nbits - width) & ((1 << width) - 1)
        nbits -= width
        # drop the consumed high bits: without this, bitbuf grows into
        # an unbounded bignum and every `<< 8` is O(stream size) —
        # quadratic decode (measured 0.01 MB/s vs 1.5 for the same
        # loop shape in gif.py; found by tools/codec_bench.py, r13)
        bitbuf &= (1 << nbits) - 1
        if code == _CLEAR:
            del table[258:]
            width = 9
            prev = None
            continue
        if code == _EOI:
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise ValueError("LZW stream starts with a table code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        out += entry
        if len(out) > max_bytes:
            raise ValueError("LZW output exceeds decode budget")
        prev = entry
        # early change: the encoder widens when ITS next free slot is
        # 2^w - 1, and the decoder's table lags the encoder's by one
        # entry (the encoder adds on emit, the decoder on receipt of
        # the NEXT code) — so the decoder widens at 2^w - 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """Width-synchronized TIFF LZW encoder (fixtures + round-trip
    pins): emits Clear up front, resets the table when it fills, and
    applies the same early width change the decoder expects."""
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = bitbuf << width | code
        nbits += width
        while nbits >= 8:
            out.append(bitbuf >> (nbits - 8) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:  # table full: reset like real writers
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append(bitbuf << (8 - nbits) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, max_bytes: int) -> bytes:
    """Apple PackBits: n in 0..127 copies n+1 literals, n in -127..-1
    repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        ctrl = data[pos]
        pos += 1
        if ctrl == 128:
            continue
        if ctrl < 128:
            lits = data[pos : pos + ctrl + 1]
            if len(lits) < ctrl + 1:
                raise ValueError("truncated PackBits literals")
            out += lits
            pos += ctrl + 1
        else:
            if pos >= n:
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - ctrl)
            pos += 1
        if len(out) > max_bytes:
            raise ValueError("PackBits output exceeds decode budget")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _read_tags(b: bytes) -> dict[int, list[int]]:
    """First-IFD tag table as {tag: [values...]} for the integer
    types (BYTE/SHORT/LONG), following out-of-line value offsets.
    Raises ValueError on structural nonsense."""
    if b[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF")
    if len(b) < 8:
        raise ValueError("truncated TIFF header")
    bo = "<" if b[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("TIFF IFD offset past end of file")
    (n_entries,) = struct.unpack(bo + "H", b[ifd_off : ifd_off + 2])
    sizes = {1: 1, 3: 2, 4: 4, 7: 1}  # 7 = UNDEFINED (JPEGTables)
    fmts = {1: "B", 3: "H", 4: "I", 7: "B"}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        entry = b[at : at + 12]
        if len(entry) < 12:
            raise ValueError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(bo + "HHI", entry[:8])
        if typ not in sizes or count == 0:
            continue
        total = sizes[typ] * count
        if count > 0xFFFF:
            raise ValueError("implausible TIFF tag count")
        if total <= 4:
            raw = entry[8 : 8 + total]
        else:
            (off,) = struct.unpack(bo + "I", entry[8:12])
            raw = b[off : off + total]
            if len(raw) < total:
                raise ValueError("TIFF tag values past end of file")
        tags[tag] = list(struct.unpack(bo + f"{count}{fmts[typ]}", raw))
    return tags


def decode_tiff(b: bytes):
    """Decode a TIFF. Returns ``(width, height, channels, samples)``
    row-major top-down uint8 — the decode_baseline/decode_gif/
    decode_bmp contract (16-bit samples keep the HIGH byte under the
    file's byte order, the PNG decoder's reduction rule). Raises
    ValueError on malformed streams and NotImplementedError for forms
    outside the supported envelope.

    Round-13 envelope expansion (three former honest gates closed):
    TILED layouts (TileWidth/TileLength/TileOffsets/TileByteCounts,
    edge tiles padded per spec), PLANAR configuration 2 (one plane
    per channel, chunks ordered plane-major), and 16-BIT gray/RGB.
    All compose (a tiled planar 16-bit file decodes) and each works
    with none/LZW/PackBits compression; CCITT stays strip+chunky
    (fax data is never tiled in practice). Still honestly gated:
    predictor 2 on 16-bit samples, JPEG-in-TIFF (routes via PIL)."""
    tags = _read_tags(b)
    bo = "<" if b[:2] == b"II" else ">"
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF IFD lacks ImageWidth/ImageLength")
    w, h = tags[256][0], tags[257][0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)  # spec default: 1 bit per sample
    planar = tags.get(284, [1])[0]
    predictor = tags.get(317, [1])[0]
    tiled = 322 in tags or 323 in tags
    if w <= 0 or h <= 0:
        raise ValueError("bad TIFF dimensions")
    if w * h > MAX_DECODE_PIXELS:
        raise ValueError("TIFF exceeds decode pixel budget")
    if planar not in (1, 2):
        raise ValueError(f"bad TIFF PlanarConfiguration {planar}")
    if comp not in (1, 2, 3, 4, 5, 6, 7, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a real codec "
            "(none/CCITT G3+G4/LZW/Deflate/PackBits/JPEG decode here)"
        )
    if comp == 6:
        # old-style JPEG-in-TIFF (round 14): the spec's compression 6
        # is famously underspecified, but the layout real files
        # overwhelmingly ship — EXIF thumbnails included — is tag 513
        # (JPEGInterchangeFormat) pointing at ONE complete JFIF
        # stream, with 514 carrying its length. Decode that case on
        # the in-repo T.81 codec; the per-strip JPEGProc/table-tag
        # variant (no 513) stays an honest named gate, because its
        # table-assembly semantics genuinely diverge across writers.
        if 513 not in tags:
            raise NotImplementedError(
                "old-style JPEG-in-TIFF (compression 6) without a "
                "JPEGInterchangeFormat stream — per-strip JPEGProc "
                "table assembly is writer-divergent; route via PIL"
            )
        off = tags[513][0]
        ln = tags.get(514, [len(b) - off])[0]
        if off < 0 or ln <= 0 or off + ln > len(b):
            raise ValueError(
                "JPEGInterchangeFormat stream outside the file"
            )
        from clustering_spark.operators.jpeg import decode_baseline

        jw, jh, jch, jsamples = decode_baseline(b[off : off + ln])
        if (jw, jh) != (w, h):
            raise ValueError(
                f"old-style JPEG stream is {jw}x{jh}, IFD claims "
                f"{w}x{h}"
            )
        return w, h, jch, jsamples
    if comp == 7 and planar == 2:
        raise NotImplementedError("planar JPEG-in-TIFF")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    bilevel = spp == 1 and bits == [1]
    if bilevel:
        sample_bytes = 0  # bit-packed
    elif spp in (1, 3) and all(v == 8 for v in bits):
        sample_bytes = 1
    elif spp in (1, 3) and all(v == 16 for v in bits):
        sample_bytes = 2
    else:
        raise NotImplementedError(
            f"TIFF bits={bits} spp={spp} (1-bit bilevel, 8/16-bit "
            "gray, 8/16-bit RGB are supported)"
        )
    if predictor == 2 and sample_bytes != 1:
        raise NotImplementedError(
            "TIFF predictor 2 with non-8-bit samples"
        )
    if comp == 7 and sample_bytes != 1:
        raise NotImplementedError(
            "JPEG-in-TIFF decodes 8-bit samples only"
        )
    t4opts = tags.get(292, [0])[0]
    if comp in (2, 3, 4):
        if not bilevel:
            raise ValueError("CCITT compression requires 1-bit data")
        if tiled:
            raise NotImplementedError("CCITT-compressed tiled TIFF")
        t6opts = tags.get(293, [0])[0]
        if (comp == 3 and t4opts & 2) or (comp == 4 and t6opts & 2):
            raise NotImplementedError("CCITT uncompressed-mode option")
    if photo not in (0, 1, 2) and not (photo == 6 and comp == 7):
        # photometric 6 (YCbCr) is legal exactly for new-style
        # JPEG-in-TIFF, where the embedded JPEG owns the color
        # transform and the decoder already emits RGB
        raise NotImplementedError(f"TIFF photometric {photo}")
    jpeg_tables = bytes(
        bytearray(tags[347])
    ) if 347 in tags else None  # tag 347: abbreviated-stream tables

    planes = spp if (planar == 2 and spp > 1) else 1
    samp = spp if planes == 1 else 1  # samples per pixel per chunk

    def chunk_samples(raw: bytes, n_rows: int, n_cols: int) -> np.ndarray:
        """(n_rows, n_cols*samp) uint8 samples from one compressed
        chunk: inflation, 16-bit high-byte reduction, and the
        per-chunk horizontal predictor (differencing restarts at
        every strip/tile row per spec)."""
        if bilevel:
            if comp in (2, 3, 4):
                from clustering_spark.operators.ccitt import (
                    decode_g3_1d,
                    decode_g3_2d,
                    decode_g4,
                )

                # CCITT emits 1 = black, exactly TIFF's photometric-0
                # (WhiteIsZero) sample convention
                if comp == 4:
                    return decode_g4(raw, n_cols, n_rows)
                if comp == 3 and t4opts & 1:
                    # MR (round 13): EOL+tag rows, 2D vs previous
                    return decode_g3_2d(raw, n_cols, n_rows)
                return decode_g3_1d(
                    raw, n_cols, n_rows,
                    byte_align=(comp == 2), eol=(comp == 3),
                )
            row_bytes = (n_cols + 7) // 8
            expect = row_bytes * n_rows
            if comp == 1:
                data = raw
            elif comp == 5:
                data = _lzw_decode(raw, expect)
            elif comp in (8, 32946):  # Adobe/zlib Deflate (r13)
                data = bounded_inflate(raw, expect, "TIFF Deflate")
            else:
                data = _packbits_decode(raw, expect)
            if len(data) < expect:
                raise ValueError("TIFF chunk shorter than its rows")
            packed = np.frombuffer(
                bytes(data[:expect]), np.uint8
            ).reshape(n_rows, row_bytes)
            return np.unpackbits(packed, axis=1)[:, :n_cols]
        if comp == 7:
            # new-style JPEG-in-TIFF: each chunk is a complete JPEG
            # stream, or an abbreviated one whose DQT/DHT ride the
            # JPEGTables tag — splice those after the chunk's SOI
            from clustering_spark.operators.jpeg import decode_baseline

            stream = raw
            if jpeg_tables is not None and len(jpeg_tables) > 4:
                stream = raw[:2] + jpeg_tables[2:-2] + raw[2:]
            jw, jh, jch, jsamples = decode_baseline(stream)
            if (jw, jh) != (n_cols, n_rows) or jch != samp:
                raise ValueError(
                    f"JPEG chunk is {jw}x{jh}x{jch}, expected "
                    f"{n_cols}x{n_rows}x{samp}"
                )
            return np.frombuffer(jsamples, np.uint8).reshape(
                n_rows, n_cols * samp
            )
        expect = n_rows * n_cols * samp * sample_bytes
        if comp == 1:
            data = raw
        elif comp == 5:
            data = _lzw_decode(raw, expect)
        elif comp in (8, 32946):  # Adobe/zlib Deflate (r13)
            data = bounded_inflate(raw, expect, "TIFF Deflate")
        else:
            data = _packbits_decode(raw, expect)
        if len(data) < expect:
            raise ValueError("TIFF chunk shorter than its rows")
        a = np.frombuffer(bytes(data[:expect]), np.uint8)
        if sample_bytes == 2:
            a = a.reshape(n_rows, n_cols * samp, 2)
            a = a[:, :, 0] if bo == ">" else a[:, :, 1]  # high byte
        else:
            a = a.reshape(n_rows, n_cols * samp)
        if predictor == 2:
            a = np.cumsum(
                a.reshape(n_rows, n_cols, samp), axis=1, dtype=np.uint8
            ).reshape(n_rows, n_cols * samp)
        return np.ascontiguousarray(a)

    out = np.zeros((planes, h, w * samp), dtype=np.uint8)
    if tiled:
        if 324 not in tags or 325 not in tags:
            raise ValueError("tiled TIFF lacks TileOffsets/ByteCounts")
        tw = tags.get(322, [w])[0]
        tl = tags.get(323, [h])[0]
        if tw <= 0 or tl <= 0 or tw * tl > MAX_DECODE_PIXELS:
            raise ValueError("bad TIFF tile geometry")
        offs, cnts = tags[324], tags[325]
        if len(offs) != len(cnts):
            raise ValueError("tile offset/count length mismatch")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offs) < across * down * planes:
            raise ValueError("TIFF tiles do not cover the image")
        ti = 0
        for p in range(planes):
            for ty in range(down):
                for tx in range(across):
                    off, cnt = offs[ti], cnts[ti]
                    ti += 1
                    raw = b[off : off + cnt]
                    if len(raw) < cnt:
                        raise ValueError("TIFF tile past end of file")
                    # tiles are FULL tw x tl per spec; edge tiles
                    # carry padding that is clipped here
                    a = chunk_samples(raw, tl, tw)
                    y0, x0 = ty * tl, tx * tw
                    ys, xs = min(tl, h - y0), min(tw, w - x0)
                    a3 = a.reshape(tl, tw, samp)
                    out[p, y0 : y0 + ys, x0 * samp : (x0 + xs) * samp] = (
                        a3[:ys, :xs].reshape(ys, xs * samp)
                    )
    else:
        if 273 not in tags or 279 not in tags:
            raise ValueError("TIFF IFD lacks strip offsets/byte counts")
        offsets, counts = tags[273], tags[279]
        if len(offsets) != len(counts):
            raise ValueError("strip offset/count length mismatch")
        rows_per_strip = tags.get(278, [h])[0] or h
        spl = (h + rows_per_strip - 1) // rows_per_strip
        if len(offsets) < spl * planes:
            raise ValueError("TIFF strips do not cover the image")
        si = 0
        for p in range(planes):
            for s in range(spl):
                y0 = s * rows_per_strip
                strip_rows = min(rows_per_strip, h - y0)
                off, cnt = offsets[si], counts[si]
                si += 1
                raw = b[off : off + cnt]
                if len(raw) < cnt:
                    raise ValueError("TIFF strip past end of file")
                out[p, y0 : y0 + strip_rows] = chunk_samples(
                    raw, strip_rows, w
                )

    if bilevel:
        ba = out[0]
        if photo == 0:  # WhiteIsZero: 0 = white
            gray = np.where(ba == 0, 255, 0).astype(np.uint8)
        else:
            gray = (ba * 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    if planes > 1:
        arr = np.stack([out[p] for p in range(planes)], axis=2)
    else:
        arr = out[0].reshape(h, w, spp)
    if spp == 1:
        if photo == 0:
            arr = 255 - arr
        return w, h, 1, np.ascontiguousarray(arr[:, :, 0]).tobytes()
    if photo != 2 and not (photo == 6 and comp == 7):
        raise ValueError("3-sample TIFF with non-RGB photometric")
    return w, h, 3, np.ascontiguousarray(arr).tobytes()


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """(tables_blob, abbreviated_stream): the DQT/DHT segments of a
    complete JPEG stream move into an SOI..EOI tables stream (the
    TIFF tag 347 layout, TechNote2); everything else — including the
    SOS and entropy data verbatim — stays in the chunk stream."""
    pos = 2
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    n = len(stream)
    while pos + 4 <= n:
        if stream[pos] != 0xFF:
            raise ValueError("marker expected while splitting JPEG")
        marker = stream[pos + 1]
        if marker == 0xDA:
            rest += stream[pos:]  # SOS + entropy + EOI verbatim
            break
        (seglen,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        seg = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff(
    arr: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    photometric: int | None = None,
    bilevel: bool = False,
    big_endian: bool = False,
    sample_depth: int = 8,
    planar: bool = False,
    tile: tuple[int, int] | None = None,
    jpeg_tables: bool = False,
) -> bytes:
    """Deterministic TIFF fixture: (H, W) gray / (H, W, 3) RGB uint8
    (or 0/1 values with ``bilevel=True``), compression in
    none/lzw/packbits (+ the CCITT family for bilevel), optional
    horizontal predictor, any strip height. ``photometric`` overrides
    the default (0 exercises WhiteIsZero inversion).

    Round-13 layout knobs (fixtures for the expanded decode
    envelope): ``sample_depth=16`` writes each uint8 value v as
    v*257 under the file byte order (the high byte round-trips
    exactly, mirroring the PNG fixture rule); ``planar=True`` writes
    PlanarConfiguration 2 (plane-major chunks); ``tile=(tw, tl)``
    writes a tiled layout (edge tiles zero-padded per spec) instead
    of strips."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w = arr.shape[:2]
        spp = 3
        if bilevel:
            raise ValueError("bilevel fixtures are single-channel")
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8 array")
    comp_code = {
        "none": 1, "ccittrle": 2, "g3": 3, "g3-2d": 3, "g4": 4,
        "lzw": 5, "jpeg": 7, "deflate": 8, "packbits": 32773,
    }[compression]
    g3_2d = compression == "g3-2d"
    if comp_code in (2, 3, 4) and not bilevel:
        raise ValueError("CCITT fixtures take bilevel=True input")
    if comp_code == 7 and (bilevel or planar or sample_depth != 8):
        raise ValueError("JPEG fixtures are chunky 8-bit")
    if bilevel and (planar or tile or sample_depth != 8):
        raise ValueError(
            "bilevel fixtures are chunky 1-bit strips"
        )
    if sample_depth not in (8, 16):
        raise ValueError("sample_depth must be 8 or 16")
    if predictor and sample_depth != 8:
        raise ValueError("predictor fixtures are 8-bit")
    photo = photometric if photometric is not None else (
        2 if spp == 3 else 1
    )
    rps = rows_per_strip or h
    bo = ">" if big_endian else "<"
    use_planar = bool(planar) and spp > 1
    planes = spp if use_planar else 1
    samp = spp if not use_planar else 1

    def block_bytes(block: np.ndarray) -> bytes:
        """Serialize a (rows, cols, samp) uint8 sample block at the
        fixture depth (16-bit: v -> v*257, file byte order)."""
        if predictor:
            d = block.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - block[:, :-1, :].astype(np.int16)
            block = (d % 256).astype(np.uint8)
        if sample_depth == 16:
            wide = block.astype(np.uint16) * 257
            inter = np.empty(block.shape + (2,), np.uint8)
            hi = (wide >> 8).astype(np.uint8)
            lo = (wide & 0xFF).astype(np.uint8)
            if big_endian:
                inter[..., 0], inter[..., 1] = hi, lo
            else:
                inter[..., 0], inter[..., 1] = lo, hi
            return inter.tobytes()
        return np.ascontiguousarray(block).tobytes()

    def compress(raw: bytes) -> bytes:
        if comp_code == 5:
            return _lzw_encode(raw)
        if comp_code == 8:
            import zlib

            return zlib.compress(raw)
        if comp_code == 32773:
            return _packbits_encode(raw)
        return raw

    def make_chunk(blk: np.ndarray) -> bytes:
        if comp_code == 7:
            from clustering_spark.operators.jpeg import encode_baseline

            px = blk[:, :, 0] if spp == 1 else blk
            return encode_baseline(np.ascontiguousarray(px))
        return compress(block_bytes(blk))

    pix = arr.reshape(h, w, spp)
    chunks: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        for p in range(planes):
            plane = pix[:, :, p : p + 1] if use_planar else pix
            padded = np.zeros(
                (down * tl, across * tw, samp), dtype=np.uint8
            )
            padded[:h, :w] = plane
            for ty in range(down):
                for tx in range(across):
                    blk = padded[
                        ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw
                    ]
                    chunks.append(make_chunk(blk))
    elif bilevel:
        for y0 in range(0, h, rps):
            if comp_code in (2, 3, 4):
                from clustering_spark.operators.ccitt import (
                    encode_g3_1d,
                    encode_g3_2d,
                    encode_g4,
                )

                bit_rows = (arr[y0 : y0 + rps] > 0).astype(np.uint8)
                if comp_code == 4:
                    chunks.append(encode_g4(bit_rows))
                elif g3_2d:
                    chunks.append(encode_g3_2d(bit_rows, k=2))
                else:
                    chunks.append(
                        encode_g3_1d(
                            bit_rows,
                            byte_align=(comp_code == 2),
                            eol=(comp_code == 3),
                        )
                    )
            else:
                packed = np.packbits(
                    (arr[y0 : y0 + rps] > 0).astype(np.uint8), axis=1
                )
                chunks.append(compress(packed.tobytes()))
    else:
        for p in range(planes):
            plane = pix[:, :, p : p + 1] if use_planar else pix
            for y0 in range(0, h, rps):
                chunks.append(make_chunk(plane[y0 : y0 + rps]))

    tables_blob = None
    if comp_code == 7 and jpeg_tables:
        # abbreviated-stream layout: DQT/DHT move to tag 347, every
        # chunk keeps only SOI + frame/scan segments (TIFF TechNote2)
        tables_blob, _ = _split_jpeg_tables(chunks[0])
        chunks = [_split_jpeg_tables(c)[1] for c in chunks]

    bits_vals = [1] if bilevel else [sample_depth] * spp
    entries = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, bits_vals),
        (259, 3, [comp_code]),
        (262, 3, [photo]),
        (277, 3, [spp]),
    ]
    if tile is not None:
        entries += [(322, 4, [tile[0]]), (323, 4, [tile[1]])]
    else:
        entries.append((278, 4, [rps]))
    if use_planar:
        entries.append((284, 3, [2]))
    if predictor and not bilevel:
        entries.append((317, 3, [2]))
    if g3_2d:
        entries.append((292, 4, [1]))  # T4Options: 2D coding
    if tables_blob is not None:
        entries.append((347, 7, list(tables_blob)))
    # layout: header(8) + IFD + out-of-line values + data chunks
    n_tag = len(entries) + 2  # + chunk offsets + chunk byte counts
    ifd_bytes = 2 + 12 * n_tag + 4
    extra_off = 8 + ifd_bytes
    extra = bytearray()

    def value_field(typ: int, vals: list[int]) -> bytes:
        nonlocal extra
        fmt = {3: "H", 4: "I", 7: "B"}[typ]
        raw = struct.pack(bo + f"{len(vals)}{fmt}", *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = extra_off + len(extra)
        extra += raw
        return struct.pack(bo + "I", off)

    # two passes: sizes of out-of-line values shift chunk offsets, so
    # reserve value space first, then place chunks after it
    tmp_extra_len = 0
    for _tag, typ, vals in entries:
        size = {3: 2, 4: 4, 7: 1}[typ] * len(vals)
        if size > 4:
            tmp_extra_len += size
    n_chunks = len(chunks)
    for size_each in (4, 4):  # offsets, byte counts as LONG
        if n_chunks * size_each > 4:
            tmp_extra_len += n_chunks * size_each
    chunks_base = extra_off + tmp_extra_len
    chunk_offsets = []
    acc = chunks_base
    for s in chunks:
        chunk_offsets.append(acc)
        acc += len(s)
    off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    all_entries = sorted(
        entries
        + [
            (off_tag, 4, chunk_offsets),
            (cnt_tag, 4, [len(s) for s in chunks]),
        ]
    )
    strips = chunks
    magic = b"MM\x00*" if big_endian else b"II*\x00"
    out = bytearray(magic + struct.pack(bo + "I", 8))
    out += struct.pack(bo + "H", n_tag)
    for tag, typ, vals in all_entries:
        out += struct.pack(bo + "HHI", tag, typ, len(vals))
        out += value_field(typ, vals)
    out += struct.pack(bo + "I", 0)  # no next IFD
    assert len(extra) == tmp_extra_len
    out += extra
    for s in strips:
        out += s
    return bytes(out)


__all__ = ["decode_tiff", "encode_tiff", "MAX_DECODE_PIXELS"]
