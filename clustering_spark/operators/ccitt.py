"""Stdlib CCITT fax codecs (public ITU-T T.4 / T.6 layouts): Group 4
(MMR, TIFF compression 4), Group 3 one-dimensional (MH, TIFF
compressions 2 and 3 with 1D lines), and — since round 13 — Group 3
TWO-dimensional (MR, TIFF compression 3 with the T4Options 2D bit:
EOL-prefixed rows whose tag bit selects 1D or T.6-style 2D coding
against the previous row). Decode AND encode, so the bilevel
round-trip pins the code tables without binary assets.

Scope honesty: the T.6 extension escape (uncompressed mode) raises a
precise NotImplementedError; everything else here is the complete
spec surface for the codecs, including the shared extended makeup
codes to run length 2560.

The code tables are transcribed from the public T.4 tables; the test
suite pins prefix-freeness per color, several well-known codewords
(white-8 = 10011, black-2 = 11, white-makeup-64 = 11011), and full
random round-trips at widths spanning the makeup ranges.

The reference system (ykursadkaya/Clustering) has no image surface;
this module belongs to the LLM-pipeline multimodal extension
(SURVEY.md "beyond the reference" set).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------- T.4 code tables
# run length -> codeword bit-string (MSB first)

_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

_BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes, shared by both colors (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2D (T.6 / T.4-2D) mode codes
_MODE_P = "0001"
_MODE_H = "001"
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}

_EOL = "000000000001"


def _decode_tree(table: dict[int, str]) -> dict:
    """Prefix tree: bitstring walk -> run length."""
    root: dict = {}
    for run, bits in table.items():
        node = root
        for c in bits[:-1]:
            node = node.setdefault(c, {})
            if not isinstance(node, dict):
                raise AssertionError("code table is not prefix-free")
        last = bits[-1]
        if last in node:
            raise AssertionError("code table is not prefix-free")
        node[last] = run
    return root

_WHITE_TREE = _decode_tree({**_WHITE, **_EXT_MAKEUP})
_BLACK_TREE = _decode_tree({**_BLACK, **_EXT_MAKEUP})


class _BitReader:
    __slots__ = ("b", "pos")

    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0  # bit position

    def read(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.b):
            raise ValueError("CCITT bit stream exhausted")
        bit = (self.b[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def peek_done(self) -> bool:
        return self.pos >> 3 >= len(self.b)

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: str) -> None:
        for c in bits:
            self.acc = self.acc << 1 | (c == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write("0")

    def bytes(self) -> bytes:
        acc, n = self.acc, self.n
        out = bytes(self.out)
        if n:
            out += bytes([acc << (8 - n)])
        return out


def _read_run(r: _BitReader, tree: dict) -> int:
    """One complete run length: 0+ makeup codes then a terminating
    code (T.4 allows chained extended makeups for very long runs)."""
    total = 0
    while True:
        node = tree
        while isinstance(node, dict):
            node = node.get("1" if r.read() else "0")
            if node is None:
                raise ValueError("invalid CCITT code")
        total += node
        if node < 64:  # terminating code ends the run
            return total


def _emit_run(w: _BitWriter, run: int, table: dict[int, str]) -> None:
    while run >= 2624:  # 2560 makeup + up to 63 terminator headroom
        w.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 1792 and run - (run % 64) in _EXT_MAKEUP:
        make = run - (run % 64)
        w.write(_EXT_MAKEUP[make])
        run -= make
    elif run >= 64:
        make = min(1728, run - (run % 64))
        w.write(table[make])
        run -= make
    w.write(table[run])


def _runs_to_row(runs: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    pos = 0
    color = 0
    for run in runs:
        if run < 0 or pos + run > width:
            raise ValueError("CCITT run overruns row width")
        if color:
            row[pos : pos + run] = 1
        pos += run
        color ^= 1
    if pos != width:
        raise ValueError("CCITT row does not sum to width")
    return row


def _row_to_runs(row: np.ndarray) -> list[int]:
    """White-first run lengths of a 0/1 row."""
    changes = np.flatnonzero(np.diff(row)) + 1
    bounds = np.concatenate(([0], changes, [len(row)]))
    runs = np.diff(bounds).tolist()
    if row[0] == 1:  # leading black: prepend the zero-length white run
        runs = [0] + runs
    return runs


# ------------------------------------------------------------ G3 (MH)


def _expect_eol(r: _BitReader) -> None:
    """Scan to the next EOL code (>= 11 zeros then a 1), tolerating
    fill bits."""
    zeros = 0
    while True:
        bit = r.read()
        if bit:
            if zeros >= 11:
                return
            raise ValueError("expected EOL before G3 row")
        zeros += 1


def _decode_1d_row(r: _BitReader, width: int) -> np.ndarray:
    """One Modified-Huffman row: alternating white/black runs until
    the row is full."""
    runs = []
    total = 0
    color = 0
    while total < width:
        run = _read_run(r, _WHITE_TREE if color == 0 else _BLACK_TREE)
        runs.append(run)
        total += run
        color ^= 1
    return _runs_to_row(runs, width)


def decode_g3_1d(
    data: bytes, width: int, height: int, byte_align: bool = True,
    eol: bool = False,
) -> np.ndarray:
    """Modified-Huffman decode (TIFF compression 2: byte-aligned rows
    without EOL; compression 3 with default T4Options: EOL-prefixed
    rows). Returns an (height, width) uint8 0/1 array where 1 =
    black."""
    r = _BitReader(data)
    rows = []
    for _ in range(height):
        if eol:
            _expect_eol(r)
        rows.append(_decode_1d_row(r, width))
        if byte_align:
            r.align()
    return np.stack(rows)


def decode_g3_2d(data: bytes, width: int, height: int) -> np.ndarray:
    """T.4 TWO-dimensional decode (MR — TIFF compression 3 with the
    T4Options 2D bit, the round-13 closure of a long-standing honest
    gate): every row is EOL-prefixed and the single bit AFTER each
    EOL tags the row's coding — 1 = one-dimensional (MH runs), 0 =
    two-dimensional against the previous row using exactly the T.6
    vertical/horizontal/pass modes (the shared ``_decode_2d_row``).
    The first row of a compliant stream is tagged 1D (its reference
    line is imaginary all-white either way). Returns (height, width)
    uint8 0/1, 1 = black."""
    r = _BitReader(data)
    ref = np.zeros(width, dtype=np.uint8)
    rows = []
    for _ in range(height):
        _expect_eol(r)
        if r.read():  # tag bit: 1 = 1D row
            row = _decode_1d_row(r, width)
        else:
            row = _decode_2d_row(r, ref, width)
        rows.append(row)
        ref = row
    return np.stack(rows)


def encode_g3_1d(
    arr: np.ndarray, byte_align: bool = True, eol: bool = False
) -> bytes:
    """MH encode of an (h, w) 0/1 array (1 = black)."""
    arr = np.asarray(arr, dtype=np.uint8)
    w = _BitWriter()
    for row in arr:
        if eol:
            w.write(_EOL)
        _encode_1d_row(w, row)
        if byte_align:
            w.align()
    return w.bytes()


# ------------------------------------------------------------ G4 (MMR)


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the color changes (a pixel differing from its
    left neighbor; imaginary white pixel before the row)."""
    padded = np.concatenate(([0], row))
    return (np.flatnonzero(np.diff(padded))).tolist()


def _b1_b2(ref_tr: list[int], a0: int, color: int) -> tuple[int, int]:
    """b1: first changing element on the reference line right of a0
    whose pixel color is OPPOSITE the coding color (i.e. the same
    color as the upcoming a1); b2: the next change after b1. Both
    default to the imaginary change at end-of-line."""
    import bisect

    i = bisect.bisect_right(ref_tr, a0)
    # transition k (0-based) flips to black when k is even (rows
    # start white), so the pixel color at ref_tr[k] is (k % 2 == 0)
    want_black = color == 0
    if i < len(ref_tr) and (i % 2 == 0) != want_black:
        i += 1
    b1 = ref_tr[i] if i < len(ref_tr) else -1
    b2 = ref_tr[i + 1] if i + 1 < len(ref_tr) else -1
    return b1, b2


def _decode_2d_row(
    r: _BitReader, ref: np.ndarray, width: int
) -> np.ndarray:
    """One two-dimensionally coded row against reference line ``ref``
    — the mode machinery shared verbatim by T.6 (G4) and T.4-2D (the
    MR tagged rows): vertical/horizontal/pass codes with the stall
    guards that keep crafted streams from looping."""
    ref_tr = _transitions(ref)
    row = np.zeros(width, dtype=np.uint8)
    a0 = -1
    color = 0
    while a0 < width:
        b1, b2 = _b1_b2(ref_tr, a0, color)
        if b1 < 0:
            b1 = width
        if b2 < 0:
            b2 = width
        # decode one mode code
        if r.read():
            mode = ("V", 0)
        elif r.read():  # 01x
            mode = ("V", 1) if r.read() else ("V", -1)
        elif r.read():  # 001
            mode = ("H", 0)
        elif r.read():  # 0001
            mode = ("P", 0)
        else:  # 0000 1/0...
            if r.read():
                mode = ("V", 2) if r.read() else ("V", -2)
            elif r.read():
                mode = ("V", 3) if r.read() else ("V", -3)
            else:
                raise NotImplementedError(
                    "T.6 extension/uncompressed mode"
                )
        if mode[0] == "P":
            if b2 <= max(a0, 0) and b2 < width:
                raise ValueError("G4 pass mode does not advance")
            if color:
                row[max(a0, 0) : b2] = 1
            a0 = b2
        elif mode[0] == "V":
            a1 = b1 + mode[1]
            # a1 must ADVANCE (a zero-length first run is legal
            # only at line start, for rows that begin black) —
            # otherwise a crafted stream could loop forever
            if a1 < 0 or a1 > width or (a0 >= 0 and a1 <= a0):
                raise ValueError("G4 vertical mode out of range")
            if color:
                row[max(a0, 0) : a1] = 1
            a0 = a1
            color ^= 1
        else:  # horizontal: two MH runs from a0
            start = max(a0, 0)
            r1 = _read_run(
                r, _WHITE_TREE if color == 0 else _BLACK_TREE
            )
            r2 = _read_run(
                r, _BLACK_TREE if color == 0 else _WHITE_TREE
            )
            if start + r1 + r2 > width:
                raise ValueError("G4 horizontal runs overrun row")
            if r1 + r2 == 0 and a0 >= 0:
                # two zero-length runs advance nothing: only legal
                # as the imaginary start-of-line step — anywhere
                # else a crafted stream would loop forever
                raise ValueError("G4 horizontal mode stalls")
            if color:
                row[start : start + r1] = 1
            else:
                row[start + r1 : start + r1 + r2] = 1
            a0 = start + r1 + r2
    return row


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 (Group 4 MMR) decode into an (height, width) uint8 0/1
    array (1 = black). Raises ValueError on invalid codes, overruns,
    or the (unsupported, rare) uncompressed-mode extension."""
    r = _BitReader(data)
    ref = np.zeros(width, dtype=np.uint8)  # imaginary all-white row
    out = []
    for _ in range(height):
        row = _decode_2d_row(r, ref, width)
        out.append(row)
        ref = row
    return np.stack(out)


def _encode_2d_row(w: _BitWriter, row: np.ndarray, ref: np.ndarray) -> None:
    """Emit one two-dimensionally coded row against ``ref`` — shared
    by encode_g4 and encode_g3_2d's tagged-0 rows."""
    import bisect

    width = len(row)
    cod_tr = _transitions(row)
    ref_tr = _transitions(ref)
    a0 = -1
    color = 0
    while a0 < width:
        j = bisect.bisect_right(cod_tr, a0)
        # a1: next change in the coding line after a0
        a1 = cod_tr[j] if j < len(cod_tr) else width
        a2 = cod_tr[j + 1] if j + 1 < len(cod_tr) else width
        b1, b2 = _b1_b2(ref_tr, a0, color)
        if b1 < 0:
            b1 = width
        if b2 < 0:
            b2 = width
        if b2 < a1:
            w.write(_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.write(_MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
        else:
            w.write(_MODE_H)
            start = max(a0, 0)
            _emit_run(w, a1 - start, _WHITE if color == 0 else _BLACK)
            _emit_run(w, a2 - a1, _BLACK if color == 0 else _WHITE)
            a0 = a2


def _encode_1d_row(w: _BitWriter, row: np.ndarray) -> None:
    color = 0
    for run in _row_to_runs(row):
        _emit_run(w, run, _WHITE if color == 0 else _BLACK)
        color ^= 1


def encode_g4(arr: np.ndarray) -> bytes:
    """T.6 encode of an (h, w) 0/1 array (1 = black); ends with EOFB."""
    arr = np.asarray(arr, dtype=np.uint8)
    _h, width = arr.shape
    w = _BitWriter()
    ref = np.zeros(width, dtype=np.uint8)
    for row in arr:
        _encode_2d_row(w, row, ref)
        ref = row
    w.write(_EOL + _EOL)  # EOFB
    return w.bytes()


def encode_g3_2d(arr: np.ndarray, k: int = 2) -> bytes:
    """T.4 two-dimensional (MR) encode of an (h, w) 0/1 array: every
    row EOL-prefixed with its tag bit; every ``k``-th row is coded 1D
    (the fax-machine error-recovery cadence — K=2 at standard
    resolution, K=4 at fine), the rows between 2D against their
    predecessor."""
    arr = np.asarray(arr, dtype=np.uint8)
    if k < 1:
        raise ValueError("K factor must be >= 1")
    w = _BitWriter()
    ref = None
    for i, row in enumerate(arr):
        w.write(_EOL)
        if i % k == 0 or ref is None:
            w.write("1")
            _encode_1d_row(w, row)
        else:
            w.write("0")
            _encode_2d_row(w, row, ref)
        ref = row
    return w.bytes()


__all__ = [
    "decode_g4",
    "encode_g4",
    "decode_g3_1d",
    "encode_g3_1d",
    "decode_g3_2d",
    "encode_g3_2d",
]
