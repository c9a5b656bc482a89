"""JPEG (ITU-T T.81) Huffman DCT codec on the stdlib + numpy alone —
no PIL/libjpeg in this container.

This closes the last image-capability gate: ``decode_image_meta`` could
parse JPEG headers natively (SOF walk) but had to raise for pixels
without PIL. The decoder handles the two processes web JPEGs actually
use — baseline/extended sequential (SOF0/SOF1) and, since round 12,
PROGRESSIVE (SOF2, Annex G.2: spectral selection + successive
approximation, DC/AC first and refinement scans, EOB runs, restart
intervals) — 8-bit, grayscale or YCbCr, any sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart markers, 16-bit quant tables —
plus, since round 13, LOSSLESS (SOF3, Annex H / process 14: all
seven predictors, 2-16-bit precision with high-byte reduction,
point transform, interleaved components; ``encode_lossless`` pins
bit-exact round-trips, which is the definition of the process).
Arithmetic / hierarchical processes and lossless restart intervals
raise honest ``NotImplementedError``.
A progressive ENCODER (``encode_progressive``,
script-driven scan schedule) exists so the progressive decoder is
pinned by exact pixel parity against the sequential pipeline — both
encoders share one coefficient-preparation path, so a progressive
file and a baseline file of the same array decode to identical
pixels.

Speed posture, stated plainly: the entropy decode is a pure-Python
bit-reader (the IDCT/upsample/color steps are vectorized numpy). Like
``_png_decode``, that is fixture-and-contract speed, not codec speed —
a production 100 TB image pipeline routes through the PIL/libjpeg
branch of ``decode_image_meta`` when the environment has it; this
module guarantees the CONTRACT is real and testable everywhere.

The encoder exists so tests can roundtrip real entropy-coded data
(DC prediction, AC run-lengths, byte stuffing, restart markers,
subsampled MCU interleave) without shipping binary blobs, and doubles
as a minimal JPEG sink. It uses the spec's own example tables
(Annex K) at their published quality.

Reference parity note: the reference engine has no image path at all —
this whole module is beyond-reference capability (SURVEY §7.6).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables

# zigzag scan: position k in the entropy stream -> natural-order index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 example quantization tables (zigzag order here is
# immaterial: we store/apply them in the order they travel in DQT)
QUANT_LUMA = bytes([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QUANT_CHROMA = bytes([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 example Huffman specs: BITS (code count per length 1..16)
# + HUFFVAL (symbols in canonical order)
DC_LUMA_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
DC_LUMA_VALS = bytes(range(12))
AC_LUMA_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
DC_CHROMA_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
DC_CHROMA_VALS = bytes(range(12))
AC_CHROMA_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M: coeff = M @ spatial @ M.T,
    spatial = M.T @ coeff @ M."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_basis()


def _build_decode_table(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman: (code_length, code_value) -> symbol, plus
    an 8-bit first-level LUT under the reserved string key "lut8"
    (cannot collide with the tuple keys): every 8-bit window whose
    prefix is a code of length <= 8 maps to (symbol, length), so the
    common case decodes in ONE peek + ONE list index instead of up
    to 8 bit-reads + dict probes (round 14: ~2x on the whole-decode
    path for baseline/progressive/lossless alike). Windows starting
    with a longer (or invalid) code map to None and fall back to the
    exact bit-walk."""
    table, code, k = {}, 0, 0
    lut: list = [None] * 256
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            if length <= 8 and code < (1 << length):
                # the range guard keeps CORRUPT DHTs (counts that
                # overflow the canonical code space) on the same
                # degrade path as before: the tuple entry is stored,
                # the bit-walk finds (or rejects) it, and the fuzz
                # contract (ValueError, never IndexError) holds
                base = code << (8 - length)
                for w in range(base, base + (1 << (8 - length))):
                    lut[w] = (vals[k], length)
            k += 1
            code += 1
        code <<= 1
    table["lut8"] = lut
    return table


def _build_encode_table(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman: symbol -> (code_value, code_length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


# --------------------------------------------------------------- decode


class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes):
        self.data, self.pos, self.buf, self.n = data, 0, 0, 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted mid-symbol")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        out = (self.buf >> self.n) & ((1 << nbits) - 1)
        self.buf &= (1 << self.n) - 1
        return out

    def peek8(self) -> tuple[int, int]:
        """(next 8 bits zero-padded on the right, how many of them
        are REAL) without consuming — the first level of the LUT
        symbol decode. Padding never fabricates a decode: the caller
        only accepts a LUT hit whose code length fits the real
        bits."""
        while self.n < 8 and self.pos < len(self.data):
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        if self.n >= 8:
            return (self.buf >> (self.n - 8)) & 0xFF, 8
        return (self.buf << (8 - self.n)) & 0xFF, self.n

    def skip(self, nbits: int) -> None:
        """Drop ``nbits`` already-buffered bits (peek8 guarantees
        they are buffered)."""
        self.n -= nbits
        self.buf &= (1 << self.n) - 1


def _decode_symbol(br: _BitReader, table: dict) -> int:
    lut = table.get("lut8")
    if lut is not None:
        w, avail = br.peek8()
        hit = lut[w]
        if hit is not None and hit[1] <= avail:
            br.skip(hit[1])
            return hit[0]
    # exact bit-walk: codes longer than 8 bits, hand-built tables
    # without a LUT, and end-of-stream windows shorter than the
    # matched code (where the walk preserves the exhausted error)
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(br: _BitReader, dc_tab: dict, ac_tab: dict, pred: int):
    """One 8x8 block of quantized coefficients (natural order) + the
    updated DC predictor."""
    coeffs = np.zeros(64, dtype=np.int32)
    t = _decode_symbol(br, dc_tab)
    pred += _extend(br.read(t), t) if t else 0
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = _decode_symbol(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[ZIGZAG[k]] = _extend(br.read(s), s)
        k += 1
    return coeffs, pred


def _split_scan(b: bytes, pos: int):
    """De-stuff the entropy-coded segment starting at ``pos``; split on
    restart markers. Returns (list of de-stuffed byte segments,
    position of the terminating marker's 0xFF)."""
    segs, cur = [], bytearray()
    n = len(b)
    while pos < n:
        byte = b[pos]
        if byte != 0xFF:
            cur.append(byte)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        nxt = b[pos + 1]
        if nxt == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            pos += 2
        elif nxt == 0xFF:  # fill byte before a marker (B.1.1.2) —
            pos += 1  # legal inside scans ahead of RSTn; skip, re-look
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: scan over
            break
    segs.append(bytes(cur))
    return segs, pos


def decode_baseline(b: bytes):
    """Decode a Huffman-DCT JPEG — baseline/extended sequential
    (SOF0/SOF1) or progressive (SOF2). Returns ``(width, height,
    channels, samples)`` with ``samples`` row-major uint8 bytes
    (graymap for 1 component, RGB for 3). Raises ``ValueError`` on
    malformed streams and ``NotImplementedError`` for
    lossless/arithmetic/hierarchical processes — never internal
    KeyError/IndexError/struct.error (fuzz-pinned in tests/test_jpeg.py
    and tests/test_jpeg_progressive.py). The name predates progressive
    support and is kept for API stability; ``decode_jpeg`` aliases it."""
    try:
        return _decode_impl(b)
    except struct.error as exc:
        raise ValueError(f"malformed JPEG stream: {exc}") from exc


decode_jpeg = decode_baseline


# decompression-bomb guard: a few-hundred-byte stream whose SOF claims
# 65535x65535 would otherwise allocate ~34 GB of planes before the
# entropy decode ever fails. 64 Mpx passes any real 8192x8192 asset.
MAX_DECODE_PIXELS = 64 * 1024 * 1024


def _decode_impl(b: bytes):
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (w, h, [(comp_id, h_i, v_i, tq)])
    dri = 0  # restart interval in MCUs (0 = none declared)
    progressive = False
    lossless = False
    prec_bits = 8
    prog_store = None  # cid -> (blocks_y, blocks_x, 64) int32 coefficients
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            if progressive and prog_store is not None:
                return _reconstruct_progressive(frame, prog_store, quant)
            break  # EOI before any scan
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers, no length field
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        payload = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                i += 1
                if pq == 0:
                    raw = np.frombuffer(
                        payload[i : i + 64], dtype=np.uint8
                    ).astype(np.int32)
                    i += 64
                else:
                    raw = np.frombuffer(
                        payload[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                if len(raw) != 64:
                    raise ValueError("truncated quantization table")
                # DQT payloads travel in ZIGZAG order (B.2.4.1):
                # de-zigzag to natural order so dequantization indexes
                # match the natural-order coefficient blocks
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = raw
                quant[tq] = tbl
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            if len(payload) >= 2:
                (dri,) = struct.unpack(">H", payload[:2])
        elif marker == 0xC4:  # DHT: one or more tables
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                bits = payload[i + 1 : i + 17]
                nv = sum(bits)
                vals = payload[i + 17 : i + 17 + nv]
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated Huffman table")
                i += 17 + nv
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # Huffman sequential/progressive/lossless (SOF3 since r13)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if lossless:
                if not (2 <= prec <= 16):
                    raise ValueError(f"illegal lossless precision {prec}")
            elif prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            prec_bits = prec
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    # T.81 bounds; 0 would divide-by-zero the
                    # upsample, >4 is spec-invalid
                    raise ValueError(
                        f"invalid sampling factors {hi}x{vi} for "
                        f"component {cid}"
                    )
                comps.append((cid, hi, vi, tq))
            if lossless and any(
                c[1] != 1 or c[2] != 1 for c in comps
            ):
                raise NotImplementedError("subsampled lossless JPEG")
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, _tq in comps:
                if hmax % hi or vmax % vi:
                    # the np.repeat upsample assumes integer ratios;
                    # spec-legal non-divisible factors (e.g. 3x1 luma
                    # with 2x1 chroma) need fractional upsampling
                    raise NotImplementedError(
                        f"non-integer sampling ratio: component {cid} is "
                        f"{hi}x{vi} against max {hmax}x{vmax}"
                    )
            if w * h > MAX_DECODE_PIXELS:
                raise ValueError(
                    f"{w}x{h} exceeds MAX_DECODE_PIXELS "
                    f"({MAX_DECODE_PIXELS}) — refusing a decompression "
                    "bomb; raise jpeg.MAX_DECODE_PIXELS if intentional"
                )
            if h == 0:
                # B.2.2 allows Y=0 in SOF with the real height arriving
                # in a DNL segment after the scan — a deliberate,
                # named capability gate, not generic corruption
                raise NotImplementedError(
                    "DNL-deferred frame height (SOF Y=0) not supported"
                )
            if w == 0:
                raise ValueError("zero-dimension frame")
            frame = (w, h, comps)
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential, progressive, and "
                f"lossless Huffman JPEG are supported (got SOF marker "
                f"0xFF{marker:02X} — arithmetic/hierarchical)"
            )
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            if not payload:
                raise ValueError("truncated SOS header")
            ns = payload[0]
            scan_comps = []  # (cid, td, ta) in scan order
            for si in range(ns):
                cs, tdta = payload[1 + 2 * si : 3 + 2 * si]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            scan_tabs = {cs: (td, ta) for cs, td, ta in scan_comps}
            w, h, comps = frame
            if lossless:
                if len(payload) < 4 + 2 * ns:
                    raise ValueError("truncated lossless SOS header")
                pred_sel = payload[1 + 2 * ns]  # Ss = predictor 1..7
                ahal = payload[3 + 2 * ns]
                pt = ahal & 0x0F  # Al = point transform
                if not (1 <= pred_sel <= 7):
                    raise ValueError(
                        f"invalid lossless predictor {pred_sel}"
                    )
                if pt >= prec_bits:
                    raise ValueError("point transform exceeds precision")
                for cs, td, _ta in scan_comps:
                    if td not in huff_dc:
                        raise ValueError(f"missing Huffman table DC{td}")
                return _decode_lossless_scan(
                    b, pos, frame, scan_comps, pred_sel, pt,
                    huff_dc, prec_bits, dri,
                )
            if progressive:
                if len(payload) < 4 + 2 * ns:
                    raise ValueError("truncated progressive SOS header")
                ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
                ahal = payload[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                if prog_store is None:
                    prog_store = _alloc_prog_store(frame)
                pos = _decode_prog_scan(
                    b, pos, frame, scan_comps, (ss, se, ah, al),
                    huff_dc, huff_ac, dri, prog_store,
                )
                continue
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG not supported"
                )
            for cid, _hi, _vi, tq in comps:
                # surface missing tables as malformed-stream errors,
                # not KeyErrors from deep inside the MCU loop
                if tq not in quant:
                    raise ValueError(f"missing quant table {tq}")
                if cid not in scan_tabs:
                    raise ValueError(f"SOS lacks component {cid}")
                td, ta = scan_tabs[cid]
                if td not in huff_dc or ta not in huff_ac:
                    raise ValueError(
                        f"missing Huffman table DC{td}/AC{ta}"
                    )
            return _decode_scan(
                b, pos, frame, scan_tabs, quant, huff_dc, huff_ac, dri
            )
        # else: APPn / COM / DNL — skip. (Restart SEGMENTS are split on
        # the RST markers themselves; DRI's interval additionally lets
        # the MCU loop advance at the declared boundary even when a
        # segment's byte padding isn't drained — see _decode_scan.)
    if progressive and prog_store is not None:
        # the 2-byte EOI can sit past the 4-byte marker-read window;
        # every decoded scan was complete, so reconstruct (missing-EOI
        # tolerance, matching common decoders)
        return _reconstruct_progressive(frame, prog_store, quant)
    raise ValueError("no SOS marker — truncated JPEG")


def _decode_scan(b, pos, frame, scan_tabs, quant, huff_dc, huff_ac, dri=0):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros(
            (mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64
        )
    segs, _end = _split_scan(b, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu = 0
    seg_i = 0
    br = _BitReader(segs[0])
    m = _DCT_M
    total_mcus = mcus_x * mcus_y
    while mcu < total_mcus:
        my, mx = divmod(mcu, mcus_x)
        for cid, hi, vi, tq in comps:
            dq = quant[tq]
            dc_tab = huff_dc[scan_tabs[cid][0]]
            ac_tab = huff_ac[scan_tabs[cid][1]]
            for by in range(vi):
                for bx in range(hi):
                    coeffs, preds[cid] = _decode_block(
                        br, dc_tab, ac_tab, preds[cid]
                    )
                    block = (coeffs * dq).astype(np.float64).reshape(8, 8)
                    spatial = m.T @ block @ m + 128.0
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
        mcu += 1
        # advance to the next restart segment when this one is drained
        # to (at most) padding bits — or, when DRI declared the
        # interval, at the declared MCU boundary regardless: a
        # conformant stream whose padding forms a full (stuffed) 0xFF
        # byte never LOOKS drained, and without the DRI check the loop
        # would try to decode the next MCU out of padding and fail a
        # valid file with 'entropy data exhausted'
        if (
            seg_i + 1 < len(segs)
            and mcu < total_mcus
            and (br.pos >= len(br.data) or (dri and mcu % dri == 0))
        ):
            seg_i += 1
            br = _BitReader(segs[seg_i])
            preds = {cid: 0 for cid, *_ in comps}
    return _planes_to_image(frame, planes)


# ---------------------------------------------------- progressive decode
#
# T.81 Annex G.2 (public spec): a progressive frame accumulates
# quantized coefficients across multiple scans — DC first/refine
# (spectral band 0, successive-approximation bit planes) and AC
# first/refine (bands [Ss, Se] of ONE component per scan, with
# end-of-band run coding). The coefficient store persists across
# scans; reconstruction (dequant + IDCT + upsample + color) happens
# once, at EOI. The control flow below follows the spec's decision
# tables (G.2.2), which the classic public decoders implement the
# same way.


def _comp_block_grid(frame, cid):
    """(blocks_y, blocks_x) a NON-INTERLEAVED scan traverses for one
    component: ceil dims of the component's own sample array (A.2.3),
    NOT the MCU-padded grid."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for c, hi, vi, _tq in comps:
        if c == cid:
            cw = -(-w * hi // hmax)
            ch = -(-h * vi // vmax)
            return -(-ch // 8), -(-cw // 8)
    raise ValueError(f"scan references unknown component {cid}")


def _alloc_prog_store(frame):
    """Per-component coefficient arrays at the MCU-padded block grid
    (interleaved DC scans traverse the full padded grid; the
    non-interleaved sub-grid is its top-left corner)."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for cid, hi, vi, _tq in comps
    }


def _decode_prog_scan(
    b, pos, frame, scan_comps, band, huff_dc, huff_ac, dri, store
):
    """Decode one progressive scan into ``store``; returns the byte
    position of the terminating marker for the caller's marker walk."""
    ss, se, ah, al = band
    w, h, comps = frame
    by_id = {cid: (hi, vi) for cid, hi, vi, _tq in comps}
    for cid, _td, _ta in scan_comps:
        if cid not in by_id:
            raise ValueError(f"SOS references unknown component {cid}")
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0 (G.1.1.1)")
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not ss <= se <= 63:
            raise ValueError(f"bad spectral band [{ss}, {se}]")
    if ah and ah != al + 1:
        raise ValueError(f"successive approximation Ah={ah} with Al={al}")
    if al > 13:
        raise ValueError(f"point transform Al={al} out of range")
    for cid, td, ta in scan_comps:
        if ss == 0 and ah == 0 and td not in huff_dc:
            raise ValueError(f"missing Huffman table DC{td}")
        if ss > 0 and ta not in huff_ac:
            raise ValueError(f"missing Huffman table AC{ta}")

    segs, end = _split_scan(b, pos)
    seg_i = 0
    br = _BitReader(segs[0])
    state = {"eobrun": 0, "preds": {cid: 0 for cid, _t, _a in scan_comps}}

    if ss == 0 and len(scan_comps) > 1:
        # interleaved DC scan: MCU traversal over the padded grid
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        total = mcus_x * mcus_y

        def decode_unit(u):
            my, mx = divmod(u, mcus_x)
            for cid, td, _ta in scan_comps:
                hi, vi = by_id[cid]
                for byy in range(vi):
                    for bxx in range(hi):
                        blk = store[cid][my * vi + byy, mx * hi + bxx]
                        _prog_dc(br, blk, huff_dc.get(td), ah, al,
                                 state, cid)
    else:
        # single-component scan (DC or AC): component block raster
        cid, td, ta = scan_comps[0]
        bh, bw = _comp_block_grid(frame, cid)
        total = bh * bw

        def decode_unit(u):
            blk = store[cid][u // bw, u % bw]
            if ss == 0:
                _prog_dc(br, blk, huff_dc.get(td), ah, al, state, cid)
            elif ah == 0:
                _prog_ac_first(br, blk, huff_ac[ta], ss, se, al, state)
            else:
                _prog_ac_refine(br, blk, huff_ac[ta], ss, se, al, state)

    unit = 0
    while unit < total:
        decode_unit(unit)
        unit += 1
        # restart-boundary advance. With DRI declared, the boundary is
        # authoritative — progressive units can be a few BITS each, so
        # the sequential path's byte-drained heuristic fires early
        # (the segment's last byte is buffered while undecoded bits
        # for later units remain). Without DRI a conformant stream has
        # no RSTs; the drained fallback only matters for stray ones.
        if (
            seg_i + 1 < len(segs)
            and unit < total
            and (
                (dri and unit % dri == 0)
                or (not dri and br.pos >= len(br.data) and br.n == 0)
            )
        ):
            seg_i += 1
            br = _BitReader(segs[seg_i])
            state["eobrun"] = 0
            state["preds"] = {c: 0 for c, _t, _a in scan_comps}
    return end


def _prog_dc(br, blk, dc_tab, ah, al, state, cid):
    if ah == 0:  # first pass: full-precision diff, shifted up by Al
        t = _decode_symbol(br, dc_tab)
        diff = _extend(br.read(t), t) if t else 0
        state["preds"][cid] += diff
        blk[0] = state["preds"][cid] << al
    else:  # refinement: one bit per block at position Al
        if br.read(1):
            blk[0] |= 1 << al
    return blk


def _prog_ac_first(br, blk, ac_tab, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[ZIGZAG[k]] = _extend(br.read(s), s) << al
        k += 1


def _prog_ac_refine(br, blk, ac_tab, ss, se, al, state):
    """AC successive-approximation refinement (G.2.2 / the classic
    public control flow): new coefficients arrive as ±1<<Al; every
    already-nonzero coefficient passed over consumes one correction
    bit; EOB runs carry correction bits for the rest of the band."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_symbol(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "AC refinement code with size > 1 (corrupt scan)"
                    )
                val = p1 if br.read(1) else m1
            while k <= se:
                c = int(blk[ZIGZAG[k]])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        if val:
                            blk[ZIGZAG[k]] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            c = int(blk[ZIGZAG[k]])
            if c != 0 and br.read(1) and (c & p1) == 0:
                blk[ZIGZAG[k]] = c + (p1 if c >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, store, quant):
    """Dequantize + IDCT the accumulated coefficient store (one
    vectorized einsum per component) and assemble the final image
    through the shared upsample/color tail."""
    w, h, comps = frame
    m = _DCT_M
    planes = {}
    for cid, hi, vi, tq in comps:
        if tq not in quant:
            raise ValueError(f"missing quant table {tq}")
        blocks = store[cid]
        bh, bw, _ = blocks.shape
        dq = quant[tq].astype(np.float64).reshape(8, 8)
        coeff = blocks.reshape(bh, bw, 8, 8).astype(np.float64) * dq
        spatial = np.einsum("ij,yxjk,kl->yxil", m.T, coeff, m) + 128.0
        planes[cid] = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return _planes_to_image(frame, planes)


def _planes_to_image(frame, planes):
    """Upsample + crop + color-convert component planes into the final
    (w, h, channels, samples) tuple — shared by the sequential and
    progressive reconstruction paths."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.tobytes()
    if len(out_planes) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, bl], axis=-1)
        rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, rgb.tobytes()
    raise NotImplementedError(
        f"{len(out_planes)}-component JPEG (CMYK?) not supported"
    )


# --------------------------------------------------------------- encode


def _ll_predict(plane, y: int, x: int, sel: int, default: int) -> int:
    """T.81 H.1.2.1 sample prediction: default at the very first
    sample, Ra along the first line, Rb down the first column, the
    selected predictor (1-7) elsewhere. All arithmetic modulo 2^16
    happens in the caller."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a = int(plane[y, x - 1])
    bb = int(plane[y - 1, x])
    if sel == 1:
        return a
    if sel == 2:
        return bb
    c = int(plane[y - 1, x - 1])
    if sel == 3:
        return c
    if sel == 4:
        return a + bb - c
    if sel == 5:
        return a + ((bb - c) >> 1)
    if sel == 6:
        return bb + ((a - c) >> 1)
    return (a + bb) >> 1  # sel == 7


def _decode_lossless_scan(
    b, pos, frame, scan_comps, pred_sel, pt, huff_dc, prec, dri
):
    """Lossless (SOF3, T.81 Annex H) scan decode: per sample, a DC
    Huffman category (0-16; 16 means difference 32768 with no extra
    bits) + EXTEND-coded difference against the H.1.2.1 prediction,
    components interleaved one sample per MCU. Output samples
    renormalize by the point transform (<< Pt) and reduce to the
    8-bit contract by dropping prec-8 low bits — the same high-byte
    rule as the PNG/TIFF 16-bit paths.

    Restart intervals stay a NAMED gate: T.81 H.2.1.1 only says
    predictions "reset", and real codecs disagree on whether the
    post-restart samples re-enter the first-line special cases — a
    guessed semantic would decode plausibly and wrongly, which is
    worse than refusing."""
    w, h, comps = frame
    nc = len(scan_comps)
    if nc != len(comps):
        # spec-legal (H.2: one scan per component) but unsupported —
        # a named gate, not a malformed-stream error
        raise NotImplementedError(
            "non-interleaved multi-scan lossless JPEG"
        )
    if dri:
        raise NotImplementedError(
            "restart intervals in lossless JPEG"
        )
    segs, _end = _split_scan(b, pos)
    tabs = [huff_dc[td] for _cs, td, _ta in scan_comps]
    default = 1 << (prec - pt - 1)
    planes = np.zeros((nc, h, w), dtype=np.int32)
    br = _BitReader(segs[0])
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                t = _decode_symbol(br, tabs[ci])
                if t > 16:
                    # SSSS beyond 16 is not a lossless category; a
                    # crafted DHT carrying one would otherwise pull
                    # t extra bits and decode deterministic garbage
                    raise ValueError(
                        f"illegal lossless DC category {t}"
                    )
                if t == 16:
                    diff = 32768
                elif t == 0:
                    diff = 0
                else:
                    diff = _extend(br.read(t), t)
                pred = _ll_predict(planes[ci], y, x, pred_sel, default)
                planes[ci][y, x] = (pred + diff) & 0xFFFF
    vals = (planes << pt).astype(np.int64)
    if prec > 8:
        vals >>= prec - 8
    out = np.clip(vals, 0, 255).astype(np.uint8)
    # lossless components are stored directly (no YCbCr transform is
    # defined for process 14 in JFIF practice): gray or RGB as-is
    img = np.transpose(out, (1, 2, 0))
    return w, h, nc, np.ascontiguousarray(img).tobytes()


def exif_orientation(b: bytes) -> int:
    """EXIF Orientation (tag 274) from the first APP1 segment, 1
    (upright) when absent or unparseable. The APP1 payload after
    'Exif\\0\\0' is a complete TIFF byte string, so the TIFF tag
    reader parses it — two public specs composing, no new parser.
    Orientation is what makes perceptual dedup of camera uploads
    work: the same photo shot in portrait stores rotated, and an
    orientation-blind dHash sees a different image."""
    if b[:2] != b"\xff\xd8":
        return 1
    pos = 2
    n = len(b)
    while pos + 4 <= n and b[pos] == 0xFF:
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if marker == 0xDA:  # entropy data: EXIF never sits past SOS
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if seglen < 2:
            break
        if marker == 0xE1 and b[pos + 4 : pos + 10] == b"Exif\x00\x00":
            from clustering_spark.operators.tiff import _read_tags

            try:
                tags = _read_tags(b[pos + 10 : pos + 2 + seglen])
            except ValueError:
                return 1
            o = tags.get(274, [1])[0]
            return o if 1 <= o <= 8 else 1
        pos += 2 + seglen
    return 1


def exif_app1_segment(orientation: int) -> bytes:
    """Minimal spec-shaped APP1/EXIF segment carrying just the
    Orientation tag — fixture for splicing after SOI."""
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)  # IFD at offset 8
        + struct.pack("<H", 1)  # one entry
        + struct.pack("<HHIHH", 274, 3, 1, orientation, 0)
        + struct.pack("<I", 0)  # no next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


# lossless fixture Huffman table: canonical lengths 2,2,2,3..16 for
# categories 0..16 (Kraft sum 1 - 2^-16 — never an all-ones code)
_LL_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1])
_LL_VALS = bytes(range(17))


def encode_lossless(
    arr: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode an (H, W) gray or (H, W, 3) RGB uint8 array as a
    LOSSLESS JPEG (SOF3, process 14). For ``precision`` > 8 each
    uint8 value v is stored as v << (precision-8), so the decoder's
    high-byte reduction recovers v exactly (the PNG/TIFF fixture
    rule). ``point_transform`` drops that many low bits before
    coding, exactly as H.1 defines. Round-trips bit-exactly at Pt=0
    — that is the point of process 14."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("expected (H,W) or (H,W,3) uint8 array")
    if not (1 <= predictor <= 7):
        raise ValueError("predictor must be 1..7")
    if not (8 <= precision <= 16):
        raise ValueError("fixture precision must be 8..16")
    if point_transform >= precision:
        raise ValueError("point transform exceeds precision")
    h, w, nc = arr.shape
    samples = arr.astype(np.int64) << (precision - 8)
    coded = (samples >> point_transform).astype(np.int64)
    default = 1 << (precision - point_transform - 1)
    enc = _build_encode_table(_LL_BITS, _LL_VALS)
    bw = _BitWriter()
    planes = np.transpose(coded, (2, 0, 1))
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                pred = _ll_predict(
                    planes[ci], y, x, predictor, default
                )
                diff = (int(planes[ci][y, x]) - pred) & 0xFFFF
                # map the mod-2^16 difference back to the signed
                # representative in [-32767, 32768]
                sdiff = diff if diff <= 32768 else diff - 65536
                if sdiff == 32768:
                    c, ln = enc[16]
                    bw.write(c, ln)
                    continue
                t, code = _magnitude(sdiff)
                c, ln = enc[t]
                bw.write(c, ln)
                if t:
                    bw.write(code, t)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    # SOF3
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    # one DHT (DC class 0, id 0) shared by every component
    dht = bytes([0x00]) + _LL_BITS + _LL_VALS
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    # SOS: Ss = predictor, Se = 0, AhAl = point transform
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.buf = (self.buf << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.buf >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.buf &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category t, t-bit code) for a signed coefficient — inverse of
    EXTEND."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1) & ((1 << t) - 1)


def _encode_block(bw, coeffs, dc_enc, ac_enc, pred):
    diff = int(coeffs[0]) - pred
    t, code = _magnitude(diff)
    c, ln = dc_enc[t]
    bw.write(c, ln)
    if t:
        bw.write(code, t)
    run = 0
    last_nz = 0
    zz = [int(coeffs[ZIGZAG[k]]) for k in range(64)]
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        t, code = _magnitude(v)
        c, ln = ac_enc[(run << 4) | t]
        bw.write(c, ln)
        bw.write(code, t)
        run = 0
    if last_nz < 63:
        c, ln = ac_enc[0x00]  # EOB
        bw.write(c, ln)
    return int(coeffs[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _prep_components(arr: np.ndarray, subsample: bool):
    """Shared front half of the sequential and progressive encoders:
    color transform, chroma downsample, MCU padding, DCT, quantize.
    Returns (nc, w, h, comps, qtabs, mcus_x, mcus_y, blocks) with
    ``comps`` entries (cid, hi, vi, tq, td, ta) and ``blocks[cid]`` a
    (blocks_y, blocks_x, 64) int32 array of natural-order quantized
    coefficients. One function so the two encoders can never drift in
    coefficient arithmetic (the progressive parity test relies on
    bit-identical coefficients)."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        planes = [arr]
        comps = [(1, 1, 1, 0, 0, 0)]  # id, h, v, tq, td, ta
        nc = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, bch = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bch
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bch
        planes = [y, cb, cr]
        sy = 2 if subsample else 1
        comps = [(1, sy, sy, 0, 0, 0), (2, 1, 1, 1, 1, 1), (3, 1, 1, 1, 1, 1)]
        nc = 3
    else:
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8 array")
    h, w = planes[0].shape
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    qtabs = {0: np.frombuffer(QUANT_LUMA, np.uint8).astype(np.int32)}
    if nc == 3:
        qtabs[1] = np.frombuffer(QUANT_CHROMA, np.uint8).astype(np.int32)

    m = _DCT_M
    blocks: dict[int, np.ndarray] = {}
    for (cid, hi, vi, tq, _td, _ta), p in zip(comps, planes):
        if hi < hmax or vi < vmax:
            # box-filter downsample (pad to even first)
            fy, fx = vmax // vi, hmax // hi
            py = -(-p.shape[0] // fy) * fy
            px = -(-p.shape[1] // fx) * fx
            pp = np.pad(p, ((0, py - p.shape[0]), (0, px - p.shape[1])),
                        mode="edge")
            p = pp.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        th, tw = mcus_y * vi * 8, mcus_x * hi * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        bh, bwd = th // 8, tw // 8
        tiles = p.reshape(bh, 8, bwd, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ij,yxjk,kl->yxil", m, tiles, m.T)
        q = np.round(
            coeff.reshape(bh, bwd, 64)
            / qtabs[tq].astype(np.float64)[None, None, :]
        ).astype(np.int32)
        blocks[cid] = q
    return nc, w, h, comps, qtabs, mcus_x, mcus_y, blocks


def encode_baseline(
    arr: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an ``(H, W)`` grayscale or ``(H, W, 3)`` RGB uint8 array
    as a baseline JFIF JPEG with the Annex K example tables. 3-channel
    input converts to YCbCr; ``subsample=True`` emits 4:2:0 chroma.
    ``restart_interval`` > 0 inserts DRI/RSTn every that many MCUs.
    Lossy exactly the way JPEG is lossy (DCT quantization)."""
    nc, w, h, comps, _qtabs, mcus_x, mcus_y, blocks = _prep_components(
        arr, subsample
    )
    dc_enc = {0: _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)}
    ac_enc = {0: _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)}
    if nc == 3:
        dc_enc[1] = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_enc[1] = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    chunks = []  # entropy chunks between restarts
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(mcu, mcus_x)
        for cid, hi, vi, tq, td, ta in comps:
            for by in range(vi):
                for bx in range(hi):
                    q = blocks[cid][my * vi + by, mx * hi + bx]
                    preds[cid] = _encode_block(
                        bw, q, dc_enc[td], ac_enc[ta], preds[cid]
                    )
    bw.flush()
    chunks.append(bytes(bw.out))

    # DQT payloads must be in ZIGZAG order (B.2.4.1); the module
    # constants are the spec's natural-order matrices
    zz_luma = bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
    zz_chroma = bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + zz_luma)
    if nc == 3:
        out += _seg(0xFFDB, b"\x01" + zz_chroma)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, hi, vi, tq, _td, _ta in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xFFC0, sof)
    out += _seg(0xFFC4, b"\x00" + DC_LUMA_BITS + DC_LUMA_VALS)
    out += _seg(0xFFC4, b"\x10" + AC_LUMA_BITS + AC_LUMA_VALS)
    if nc == 3:
        out += _seg(0xFFC4, b"\x01" + DC_CHROMA_BITS + DC_CHROMA_VALS)
        out += _seg(0xFFC4, b"\x11" + AC_CHROMA_BITS + AC_CHROMA_VALS)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for cid, _hi, _vi, _tq, td, ta in comps:
        sos += bytes([cid, (td << 4) | ta])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    for i, chunk in enumerate(chunks):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += chunk
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------- progressive encode
#
# Fixture-grade progressive encoder (T.81 Annex G.1): same Annex K
# tables and the SAME quantized coefficients as encode_baseline
# (shared _prep_components), emitted across a scan script of DC
# first/refine and AC first/refine band scans. Exists so the
# progressive DECODER is pinned by exact pixel parity against the
# sequential pipeline with no binary assets — and because a
# progressive writer is itself part of a complete JPEG surface.

#: default scan scripts (component indices into `comps`): the classic
#: spectral-selection + successive-approximation progression shape —
#: coarse DC first, low AC bands, then bit-plane refinements down to
#: Al=0 for every (component, band).
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
)
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


# Progressive AC scans emit EOBn symbols (r<<4, r=1..14) that the
# Annex K SEQUENTIAL tables don't define — progressive files carry
# their own AC table. A flat canonical code (176 symbols, all 8 bits:
# every (r, s) with s<=10) is legal (max code 175 < 255 so the
# reserved all-ones code is never assigned), trivially correct, and
# compression-irrelevant for fixtures.
PROG_AC_VALS = bytes((r << 4) | s for r in range(16) for s in range(11))
PROG_AC_BITS = bytes([0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0])


class _ProgScanWriter:
    """Entropy writer for one progressive scan: bit emission plus the
    EOB-run / buffered-correction-bit machinery shared by the AC
    passes, chunked on restart boundaries."""

    def __init__(self):
        self.bw = _BitWriter()
        self.chunks: list[bytes] = []
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits under the EOB run

    def flush_eob(self, ac_enc):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            c, ln = ac_enc[nbits << 4]
            self.bw.write(c, ln)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            for bit in self.pending:
                self.bw.write(bit, 1)
            self.pending = []
            self.eobrun = 0

    def restart(self, ac_enc):
        if ac_enc is not None:
            self.flush_eob(ac_enc)
        self.bw.flush()
        self.chunks.append(bytes(self.bw.out))
        self.bw = _BitWriter()

    def finish(self, ac_enc) -> list[bytes]:
        if ac_enc is not None:
            self.flush_eob(ac_enc)
        self.bw.flush()
        self.chunks.append(bytes(self.bw.out))
        return self.chunks


def _enc_dc_unit(sw, blk, dc_enc, ah, al, preds, cid):
    if ah == 0:
        temp = int(blk[0]) >> al  # arithmetic shift (G.1.2.1)
        diff = temp - preds[cid]
        preds[cid] = temp
        t, code = _magnitude(diff)
        c, ln = dc_enc[t]
        sw.bw.write(c, ln)
        if t:
            sw.bw.write(code, t)
    else:
        sw.bw.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first_block(sw, blk, ac_enc, ss, se, al):
    run = 0
    for k in range(ss, se + 1):
        v = int(blk[ZIGZAG[k]])
        t = (v >> al) if v >= 0 else -((-v) >> al)  # toward-zero shift
        if t == 0:
            run += 1
            continue
        sw.flush_eob(ac_enc)
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            sw.bw.write(c, ln)
            run -= 16
        s, code = _magnitude(t)
        c, ln = ac_enc[(run << 4) | s]
        sw.bw.write(c, ln)
        sw.bw.write(code, s)
        run = 0
    if run:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eob(ac_enc)


def _enc_ac_refine_block(sw, blk, ac_enc, ss, se, al):
    vals = [int(blk[ZIGZAG[k]]) for k in range(ss, se + 1)]
    mags = [(abs(v) >> al) for v in vals]
    # band ends after the LAST newly-significant coefficient (mag 1);
    # everything past it joins the EOB run
    last_new = -1
    for i, t in enumerate(mags):
        if t == 1:
            last_new = i
    r = 0
    corr: list[int] = []  # correction bits queued behind the next code
    for i in range(last_new + 1):
        t = mags[i]
        if t == 0:
            r += 1
            continue
        # ZRLs must be emitted at ANY nonzero position once r > 15 —
        # history positions included — so every buffered correction
        # bit belongs to a position inside the 16-zero window its ZRL
        # covers (the decoder consumes bits during the ZRL walk)
        if r > 15:
            sw.flush_eob(ac_enc)
            while r > 15:
                c, ln = ac_enc[0xF0]
                sw.bw.write(c, ln)
                for bit in corr:
                    sw.bw.write(bit, 1)
                corr = []
                r -= 16
        if t > 1:  # history-nonzero: correction bit rides the stream
            corr.append(t & 1)
            continue
        # t == 1: newly significant at this bit plane
        sw.flush_eob(ac_enc)
        c, ln = ac_enc[(r << 4) | 1]
        sw.bw.write(c, ln)
        sw.bw.write(1 if vals[i] > 0 else 0, 1)
        for bit in corr:
            sw.bw.write(bit, 1)
        corr = []
        r = 0
    # tail: zero/history coefficients after the last new one join the
    # EOB run; their correction bits buffer until the run flushes.
    # (corr is always empty here — the loop ends on a t==1 flush.)
    if last_new < len(mags) - 1:
        sw.eobrun += 1
        sw.pending += [mags[i] & 1 for i in range(last_new + 1, len(mags))
                       if mags[i] > 1]
        if sw.eobrun == 0x7FFF:
            sw.flush_eob(ac_enc)


def encode_progressive(
    arr: np.ndarray,
    subsample: bool = False,
    scans: tuple | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode as a progressive JFIF JPEG (SOF2). ``scans`` is a tuple
    of (component_indices, Ss, Se, Ah, Al) following T.81's rules (DC
    scans may interleave components; AC scans take one component;
    every band must reach Al=0 for full fidelity) — defaults to the
    classic spectral-selection + successive-approximation script.
    Quantized coefficients are IDENTICAL to encode_baseline's (shared
    preparation), so decoding both files yields identical pixels —
    the property the decoder parity tests pin."""
    nc, w, h, comps, _qtabs, mcus_x, mcus_y, blocks = _prep_components(
        arr, subsample
    )
    if scans is None:
        scans = _PROG_SCRIPT_GRAY if nc == 1 else _PROG_SCRIPT_COLOR
    dc_enc = {0: _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)}
    ac_enc = {0: _build_encode_table(PROG_AC_BITS, PROG_AC_VALS)}
    if nc == 3:
        dc_enc[1] = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_enc[1] = ac_enc[0]

    zz_luma = bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
    zz_chroma = bytes(QUANT_CHROMA[ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + zz_luma)
    if nc == 3:
        out += _seg(0xFFDB, b"\x01" + zz_chroma)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, hi, vi, tq, _td, _ta in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xFFC2, sof)
    out += _seg(0xFFC4, b"\x00" + DC_LUMA_BITS + DC_LUMA_VALS)
    out += _seg(0xFFC4, b"\x10" + PROG_AC_BITS + PROG_AC_VALS)
    if nc == 3:
        out += _seg(0xFFC4, b"\x01" + DC_CHROMA_BITS + DC_CHROMA_VALS)
        out += _seg(0xFFC4, b"\x11" + PROG_AC_BITS + PROG_AC_VALS)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    frame = (w, h, [(cid, hi, vi, tq) for cid, hi, vi, tq, _d, _a in comps])

    for comp_idxs, ss, se, ah, al in scans:
        scan_comps = [comps[i] for i in comp_idxs]
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("AC scans must cover exactly one component")
        sw = _ProgScanWriter()
        ac_for_flush = ac_enc[scan_comps[0][5]] if ss > 0 else None
        preds = {c[0]: 0 for c in scan_comps}
        if ss == 0 and len(scan_comps) > 1:
            total = mcus_x * mcus_y
            for mcu in range(total):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    sw.restart(ac_for_flush)
                    preds = {c[0]: 0 for c in scan_comps}
                my, mx = divmod(mcu, mcus_x)
                for cid, hi, vi, _tq, td, _ta in scan_comps:
                    for by in range(vi):
                        for bx in range(hi):
                            _enc_dc_unit(
                                sw, blocks[cid][my * vi + by, mx * hi + bx],
                                dc_enc[td], ah, al, preds, cid,
                            )
        else:
            cid, _hi, _vi, _tq, td, ta = scan_comps[0]
            bh, bwd = _comp_block_grid(frame, cid)
            total = bh * bwd
            for u in range(total):
                if restart_interval and u and u % restart_interval == 0:
                    sw.restart(ac_for_flush)
                    preds = {c[0]: 0 for c in scan_comps}
                blk = blocks[cid][u // bwd, u % bwd]
                if ss == 0:
                    _enc_dc_unit(sw, blk, dc_enc[td], ah, al, preds, cid)
                elif ah == 0:
                    _enc_ac_first_block(sw, blk, ac_enc[ta], ss, se, al)
                else:
                    _enc_ac_refine_block(sw, blk, ac_enc[ta], ss, se, al)
        chunks = sw.finish(ac_for_flush)
        sos = bytes([len(scan_comps)])
        for cid, _hi, _vi, _tq, td, ta in scan_comps:
            sos += bytes([cid, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        for i, chunk in enumerate(chunks):
            if i:
                out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            out += chunk
    out += b"\xff\xd9"
    return bytes(out)
