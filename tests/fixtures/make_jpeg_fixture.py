"""One-time generator for tiny_gray16x8.jpg — a minimal but SPEC-VALID
baseline JFIF JPEG (ITU-T T.81): grayscale, 16x8, flat mid-gray.

Built from the public JPEG spec alone: standard Annex K quantization /
Huffman tables, one component, two 8x8 MCUs. A flat block at sample
value 128 level-shifts to 0, so every DCT coefficient is 0: each MCU
encodes as DC-category-0 ("00") + EOB ("1010") = 6 bits; 12 bits total
pad with 1s to 2 bytes. Any conformant decoder (PIL, libjpeg, browser)
renders a 16x8 mid-gray image.

Run: python tests/fixtures/make_jpeg_fixture.py  (writes alongside itself)
"""

from __future__ import annotations

import struct
from pathlib import Path

# Annex K.1 luminance quantization table (order is immaterial here:
# every DCT coefficient of the flat image quantizes to 0 regardless)
QUANT_LUMA = bytes(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)

# Annex K.3 luminance DC Huffman spec: BITS (codes per length 1..16)
# then HUFFVAL (symbols in code order)
DC_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
DC_VALS = bytes(range(12))

# Annex K.3 luminance AC Huffman spec
AC_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
AC_VALS = bytes(
    [
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
    ]
)

WIDTH, HEIGHT = 16, 8


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def build() -> bytes:
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + QUANT_LUMA)  # DQT, Pq=0 Tq=0
    # SOF0: precision 8, height, width, 1 component (id 1, 1x1, Tq 0)
    out += _seg(
        0xFFC0, struct.pack(">BHHB", 8, HEIGHT, WIDTH, 1) + b"\x01\x11\x00"
    )
    out += _seg(0xFFC4, b"\x00" + DC_BITS + DC_VALS)  # DHT DC class0 id0
    out += _seg(0xFFC4, b"\x10" + AC_BITS + AC_VALS)  # DHT AC class1 id0
    # SOS: 1 component (id 1, DC table 0 / AC table 0), Ss=0 Se=63 A=0
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    # entropy data: 2 MCUs x (DC cat 0 "00" + EOB "1010"), 1-padded
    # 00 1010 00 1010 1111 -> 0x28 0xAF
    out += bytes([0x28, 0xAF])
    out += b"\xff\xd9"  # EOI
    return bytes(out)


if __name__ == "__main__":
    path = Path(__file__).parent / "tiny_gray16x8.jpg"
    path.write_bytes(build())
    print(f"wrote {path} ({path.stat().st_size} bytes)")
