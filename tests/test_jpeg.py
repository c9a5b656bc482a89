"""Baseline JPEG codec (operators/jpeg): decode correctness against an
INDEPENDENT direct-cosine IDCT reference (not the codec's own basis
matrix), encode→decode roundtrips across grayscale / 4:4:4 / 4:2:0 /
restart-marker layouts, byte-stuffing, 16-bit quant tables, and honest
gates for non-baseline processes. No Spark needed — pure codec."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from clustering_spark.operators import jpeg
from clustering_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    decode_baseline,
    encode_baseline,
)


def _reference_idct(coeffs64, quant64):
    """Direct T.81 A.3.3 IDCT: double cosine sum, pure Python — an
    implementation independent of the codec's matrix basis."""
    dq = [c * q for c, q in zip(coeffs64, quant64)]
    out = []
    for y in range(8):
        row = []
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * dq[u * 8 + v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            row.append(min(255, max(0, round(s / 4.0 + 128.0))))
        out.append(row)
    return np.array(out, dtype=np.int64)


def _single_block_jpeg(coeffs64) -> bytes:
    """Hand-assemble an 8x8 grayscale baseline JPEG carrying exactly
    the given quantized coefficients (natural order) — built from the
    encoder's Huffman writer only, never its DCT, so decoding it tests
    the decoder's dequant+IDCT against the reference above."""
    bw = jpeg._BitWriter()
    dc_enc = jpeg._build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = jpeg._build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    jpeg._encode_block(bw, np.asarray(coeffs64, dtype=np.int32), dc_enc, ac_enc, 0)
    bw.flush()
    # spec-conformant DQT: zigzag order on the wire (the non-uniform
    # Annex K table makes any ordering mistake fail the reference
    # comparison — this is the interop pin for the de-zigzag path)
    zz_quant = bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += jpeg._seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += jpeg._seg(0xFFDB, b"\x00" + zz_quant)
    out += jpeg._seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    out += jpeg._seg(0xFFC4, b"\x00" + DC_LUMA_BITS + DC_LUMA_VALS)
    out += jpeg._seg(0xFFC4, b"\x10" + AC_LUMA_BITS + AC_LUMA_VALS)
    out += jpeg._seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_committed_fixture_decodes_flat_gray():
    from pathlib import Path

    b = (Path(__file__).parent / "fixtures" / "tiny_gray16x8.jpg").read_bytes()
    w, h, ch, s = decode_baseline(b)
    assert (w, h, ch) == (16, 8, 1)
    assert set(s) == {128}


def test_decode_matches_independent_idct_reference():
    """Random quantized coefficient blocks, entropy-coded by hand,
    must decode to the direct-cosine-sum reference within 1 intensity
    step (float association slack only). Covers DC categories, AC
    run/size codes, ZRL, EOB, sign EXTEND."""
    rng = np.random.default_rng(42)
    quant = list(QUANT_LUMA)
    for trial in range(8):
        coeffs = np.zeros(64, dtype=np.int64)
        coeffs[0] = int(rng.integers(-60, 60))
        # sparse AC pattern incl. long zero runs (exercises ZRL)
        for k in rng.choice(np.arange(1, 64), size=6, replace=False):
            coeffs[ZIGZAG[k]] = int(rng.integers(-8, 9))
        coeffs[ZIGZAG[63]] = int(rng.integers(1, 4))  # force full-block path
        b = _single_block_jpeg(coeffs)
        w, h, ch, s = decode_baseline(b)
        got = np.frombuffer(s, np.uint8).reshape(8, 8).astype(np.int64)
        want = _reference_idct(list(coeffs), quant)
        assert np.abs(got - want).max() <= 1, f"trial {trial}"


def test_gray_roundtrip_smooth_image():
    img = np.linspace(0, 255, 24 * 17).reshape(24, 17).astype(np.uint8)
    w, h, ch, s = decode_baseline(encode_baseline(img))
    assert (w, h, ch) == (17, 24, 1)
    dec = np.frombuffer(s, np.uint8).reshape(24, 17).astype(float)
    assert np.abs(dec - img.astype(float)).max() <= 8  # quantization loss

def _smooth_rgb(h=20, w=30):
    img = np.zeros((h, w, 3))
    img[..., 0] = np.linspace(0, 200, w)[None, :]
    img[..., 1] = np.linspace(0, 200, h)[:, None]
    img[..., 2] = 100
    return img.astype(np.uint8)


def test_color_444_roundtrip():
    img = _smooth_rgb()
    w, h, ch, s = decode_baseline(encode_baseline(img))
    assert (w, h, ch) == (30, 20, 3)
    dec = np.frombuffer(s, np.uint8).reshape(20, 30, 3).astype(float)
    assert np.abs(dec - img.astype(float)).mean() <= 4

def test_color_420_subsampled_roundtrip():
    img = _smooth_rgb()
    b = encode_baseline(img, subsample=True)
    # the stream really is 4:2:0: Y sampling factors 2x2 in SOF
    sof = b.index(b"\xff\xc0")
    assert b[sof + 11] == 0x22
    w, h, ch, s = decode_baseline(b)
    assert (w, h, ch) == (30, 20, 3)
    dec = np.frombuffer(s, np.uint8).reshape(20, 30, 3).astype(float)
    assert np.abs(dec - img.astype(float)).mean() <= 8


def test_restart_markers_roundtrip():
    img = np.linspace(0, 255, 40 * 40).reshape(40, 40).astype(np.uint8)
    b = encode_baseline(img, restart_interval=3)
    assert b"\xff\xd0" in b  # at least one RST0 actually emitted
    w, h, ch, s = decode_baseline(b)
    dec = np.frombuffer(s, np.uint8).reshape(40, 40).astype(float)
    assert np.abs(dec - img.astype(float)).max() <= 8


def test_byte_stuffing_survives_roundtrip():
    """An entropy stream containing a raw 0xFF must travel stuffed
    (FF 00) and decode back; scan a few seeds to pin one that emits a
    stuffed byte, then assert the roundtrip."""
    rng = np.random.default_rng(0)
    for _ in range(50):
        img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        b = encode_baseline(img)
        scan_start = b.index(b"\xff\xda") + 14
        if b"\xff\x00" in b[scan_start:-2]:
            decode_baseline(b)  # must not raise; stuffing unescaped OK
            return
    pytest.fail("no seed produced a stuffed 0xFF byte in 50 tries")


def test_16bit_quant_table_decode():
    """Rewriting the 8-bit DQT as a Pq=1 (16-bit) table with the same
    values must decode identically."""
    img = np.linspace(0, 255, 16 * 16).reshape(16, 16).astype(np.uint8)
    b = encode_baseline(img)
    zz_quant = bytes(QUANT_LUMA[ZIGZAG[k]] for k in range(64))
    old = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_quant
    assert old in b
    new = (
        b"\xff\xdb"
        + struct.pack(">H", 131)
        + b"\x10"
        + b"".join(struct.pack(">H", q) for q in zz_quant)
    )
    b16 = b.replace(old, new, 1)
    assert decode_baseline(b16) == decode_baseline(b)


def test_malformed_and_truncated_gates():
    img = np.zeros((8, 8), dtype=np.uint8)
    b = encode_baseline(img)
    # a BASELINE stream whose SOF marker is flipped to SOF2 is now
    # parsed as progressive — and rejected as malformed, because its
    # baseline SOS (Se=63 with Ss=0) violates the progressive scan
    # rules (G.1.1.1); round 12 made real SOF2 streams decodable
    # (tests/test_jpeg_progressive.py)
    with pytest.raises(ValueError, match="Se=0"):
        decode_baseline(b.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # round 13: SOF3 is now a real decode path, so a baseline stream
    # flipped to SOF3 is rejected as MALFORMED lossless (its SOS Ss=0
    # is not a legal predictor), not gated; arithmetic coding remains
    # the named gate
    with pytest.raises(ValueError, match="predictor"):
        decode_baseline(b.replace(b"\xff\xc0", b"\xff\xc3", 1))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_baseline(b.replace(b"\xff\xc0", b"\xff\xc9", 1))
    with pytest.raises(ValueError):
        decode_baseline(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError, match="no SOS"):
        decode_baseline(b[: b.index(b"\xff\xda")] + b"\xff\xd9")


def test_odd_dimensions_edge_blocks():
    """Dims not multiples of 8 (and of 16 under 4:2:0): edge MCUs pad
    on encode and crop on decode — output must be exactly (h, w)."""
    img = _smooth_rgb(h=13, w=21)
    for sub in (False, True):
        w, h, ch, s = decode_baseline(encode_baseline(img, subsample=sub))
        assert (w, h, ch) == (21, 13, 3)
        dec = np.frombuffer(s, np.uint8).reshape(13, 21, 3).astype(float)
        assert np.abs(dec - img.astype(float)).mean() <= 10


def test_zero_sampling_factor_is_valueerror_not_zerodiv():
    img = np.zeros((8, 8), dtype=np.uint8)
    b = bytearray(encode_baseline(img))
    sof = bytes(b).index(b"\xff\xc0")
    b[sof + 11] = 0x10  # h=1, v=0
    with pytest.raises(ValueError, match="sampling"):
        decode_baseline(bytes(b))


def test_mutation_fuzz_never_crashes_with_internal_errors():
    """Byte-mutation fuzz over a real stream: every mutation must
    either decode or raise ValueError / NotImplementedError — never
    KeyError / ZeroDivisionError / IndexError / struct.error from the
    guts (the review-batch contract for parser robustness)."""
    rng = np.random.default_rng(123)
    base = encode_baseline(_smooth_rgb(12, 12), subsample=True)
    for _ in range(300):
        mutated = bytearray(base)
        for _k in range(int(rng.integers(1, 4))):
            mutated[int(rng.integers(2, len(base)))] = int(
                rng.integers(0, 256)
            )
        try:
            decode_baseline(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass
        # anything else propagates and fails the test

def test_fill_bytes_before_restart_marker_decode():
    """T.81 B.1.1.2: runs of 0xFF fill bytes are legal padding before
    any marker, including RSTn inside the entropy scan. Injecting fill
    bytes ahead of each restart marker must decode to the identical
    image (previously _split_scan mistook FF FF for a terminating
    marker and truncated the scan)."""
    img = np.linspace(0, 255, 40 * 40).reshape(40, 40).astype(np.uint8)
    b = encode_baseline(img, restart_interval=3)
    assert b"\xff\xd0" in b
    base = np.frombuffer(decode_baseline(b)[3], np.uint8)
    padded = b
    for rst in range(8):
        padded = padded.replace(
            bytes([0xFF, 0xD0 + rst]), bytes([0xFF, 0xFF, 0xFF, 0xD0 + rst])
        )
    assert len(padded) > len(b)
    got = np.frombuffer(decode_baseline(padded)[3], np.uint8)
    assert np.array_equal(got, base)


def test_non_divisible_sampling_ratio_is_explicit_gate():
    """Spec-legal but unsupported non-integer sampling ratios (3x1 luma
    against 2x1 chroma) must raise NotImplementedError naming the
    factors at SOF time — not an opaque ValueError from np.stack."""
    b = bytearray(encode_baseline(_smooth_rgb()))
    sof = bytes(b).index(b"\xff\xc0")
    assert b[sof + 11] == 0x11  # 4:4:4 encode: comp0 is 1x1
    b[sof + 11] = 0x31  # luma 3x1
    b[sof + 14] = 0x21  # cb 2x1 -> hmax 3 not divisible by 2
    with pytest.raises(NotImplementedError, match="non-integer sampling"):
        decode_baseline(bytes(b))

def test_dnl_deferred_height_is_named_gate():
    """SOF Y=0 with a post-scan DNL segment is spec-legal (B.2.2);
    the decoder gates it as NotImplementedError naming DNL, not a
    generic zero-dimension ValueError."""
    b = bytearray(encode_baseline(np.full((16, 16), 128, np.uint8)))
    sof = bytes(b).index(b"\xff\xc0")
    b[sof + 5 : sof + 7] = b"\x00\x00"  # frame height -> 0
    with pytest.raises(NotImplementedError, match="DNL"):
        decode_baseline(bytes(b))

def test_full_byte_padding_before_rst_advances_via_dri():
    """A conformant encoder may end a restart interval with a full
    byte of 1-padding — which is 0xFF, travels STUFFED (FF 00), and
    therefore never lets the segment look byte-drained. With DRI
    honored, the decoder advances at the declared MCU boundary and
    decodes identically; before the fix this valid stream died with
    'entropy data exhausted'."""
    img = np.linspace(0, 255, 40 * 40).reshape(40, 40).astype(np.uint8)
    b = encode_baseline(img, restart_interval=3)
    base = np.frombuffer(decode_baseline(b)[3], np.uint8)
    # simulate the padding byte: a stuffed 0xFF immediately before the
    # first restart marker
    first_rst = b.index(b"\xff\xd0")
    padded = b[:first_rst] + b"\xff\x00" + b[first_rst:]
    got = np.frombuffer(decode_baseline(padded)[3], np.uint8)
    assert np.array_equal(got, base)


class TestLossless:
    """Round 13: lossless JPEG (SOF3, T.81 Annex H / process 14) —
    the former 'lossless' honest gate. Bit-exact round-trips are the
    definition of the process, so equality (not PSNR) is the pin."""

    @pytest.mark.parametrize("pred", list(range(1, 8)))
    def test_every_predictor_roundtrips_exactly(self, pred):
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(40 + pred)
        g = rng.integers(0, 256, (11, 7), dtype=np.uint8)
        w, h, ch, s = decode_baseline(encode_lossless(g, predictor=pred))
        assert (w, h, ch) == (7, 11, 1)
        assert (np.frombuffer(s, np.uint8).reshape(11, 7) == g).all()

    def test_rgb_interleaved_roundtrip(self):
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(50)
        c = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
        w, h, ch, s = decode_baseline(encode_lossless(c, predictor=4))
        assert (w, h, ch) == (9, 6, 3)
        assert (np.frombuffer(s, np.uint8).reshape(6, 9, 3) == c).all()

    @pytest.mark.parametrize("prec", [12, 16])
    def test_high_precision_reduces_to_high_byte(self, prec):
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(60)
        g = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        w, h, ch, s = decode_baseline(
            encode_lossless(g, precision=prec, predictor=7)
        )
        assert (np.frombuffer(s, np.uint8).reshape(8, 8) == g).all()

    def test_point_transform_drops_low_bits(self):
        from clustering_spark.operators.jpeg import encode_lossless

        g = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4 + 3
        w, h, ch, s = decode_baseline(
            encode_lossless(g, point_transform=2)
        )
        got = np.frombuffer(s, np.uint8).reshape(8, 8)
        assert (got == (g >> 2) << 2).all()

    def test_restart_interval_stays_named_gate(self):
        from clustering_spark.operators.jpeg import encode_lossless

        blob = bytearray(encode_lossless(np.zeros((4, 4), np.uint8)))
        # splice a DRI segment right after SOI
        import struct as st

        dri = b"\xff\xdd" + st.pack(">H", 4) + st.pack(">H", 2)
        blob[2:2] = dri
        with pytest.raises(NotImplementedError, match="restart"):
            decode_baseline(bytes(blob))

    def test_subsampled_lossless_stays_gate(self):
        from clustering_spark.operators.jpeg import encode_lossless

        blob = bytearray(encode_lossless(np.zeros((4, 4, 3), np.uint8)))
        i = blob.find(b"\xff\xc3")
        # component 0 sampling byte: SOF3 payload = len(2) prec(1)
        # h(2) w(2) nc(1) then (cid, hv, tq) triples
        blob[i + 2 + 2 + 6 + 1] = 0x22
        with pytest.raises(NotImplementedError, match="subsampled"):
            decode_baseline(bytes(blob))

    def test_truncated_stream_raises(self):
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(70)
        g = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        blob = encode_lossless(g)
        with pytest.raises(ValueError):
            decode_baseline(blob[: len(blob) - 30])

    @pytest.mark.parametrize("pred", list(range(1, 8)))
    def test_every_predictor_with_point_transform(self, pred):
        # round-14 review batch 2: Pt changes the default prediction
        # (1 << (prec-Pt-1)) AND the output renormalization — every
        # predictor must compose with it, including 7's (Ra+Rb)>>1
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(80 + pred)
        g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        w, h, ch, s = decode_baseline(
            encode_lossless(g, predictor=pred, point_transform=1)
        )
        got = np.frombuffer(s, np.uint8).reshape(9, 13)
        assert (got == (g >> 1) << 1).all()

    def test_point_transform_with_high_precision(self):
        # Pt applies BEFORE the high-byte reduction: 16-bit samples
        # with Pt=3 must still reduce to the exact top byte
        from clustering_spark.operators.jpeg import encode_lossless

        rng = np.random.default_rng(90)
        g = rng.integers(0, 256, (6, 6), dtype=np.uint8)
        w, h, ch, s = decode_baseline(
            encode_lossless(
                g, precision=16, predictor=7, point_transform=3
            )
        )
        got = np.frombuffer(s, np.uint8).reshape(6, 6)
        # samples were (v<<8) >> 3 at encode; decode <<3 then >>8
        assert (got == ((g.astype(np.int32) << 8 >> 3) << 3 >> 8)
                ).all()

    def test_point_transform_at_precision_rejected(self):
        from clustering_spark.operators.jpeg import encode_lossless

        blob = bytearray(
            encode_lossless(np.zeros((4, 4), np.uint8))
        )
        # SOS: ff da len(2) ns(1) (cs,td/ta)*ns ss se ahal — patch
        # Al (low nibble of the last byte) to 8 (== precision)
        i = blob.find(b"\xff\xda")
        (slen,) = __import__("struct").unpack(
            ">H", blob[i + 2 : i + 4]
        )
        blob[i + 2 + slen - 1] = 0x08
        with pytest.raises(ValueError, match="point transform"):
            decode_baseline(bytes(blob))

    def test_dht_category_above_16_rejected(self):
        # a crafted DHT can map a code to SSSS > 16 — the decoder
        # must raise, not pull t extra bits and emit garbage
        from clustering_spark.operators.jpeg import encode_lossless

        blob = bytearray(encode_lossless(np.zeros((4, 4), np.uint8)))
        i = blob.find(b"\xff\xc4")
        assert i > 0
        # DHT payload: len(2) tc/th(1) bits(16) vals... — patch the
        # first value symbol to 0xC8 (200)
        j = i + 2 + 2 + 1 + 16
        blob[j] = 0xC8
        with pytest.raises(ValueError):
            decode_baseline(bytes(blob))


class TestExifOrientation:
    """Round 13: EXIF Orientation (tag 274) — parsed by composing the
    APP1 walk with the TIFF tag reader, and normalized in the
    perceptual-hash path so camera-rotated duplicates collide."""

    def test_reader_and_fixture(self):
        from clustering_spark.operators.jpeg import (
            encode_baseline,
            exif_app1_segment,
            exif_orientation,
        )

        base = encode_baseline(np.zeros((8, 8), np.uint8))
        assert exif_orientation(base) == 1  # absent -> upright
        for o in range(1, 9):
            tagged = base[:2] + exif_app1_segment(o) + base[2:]
            assert exif_orientation(tagged) == o
        # out-of-range value degrades to upright
        weird = base[:2] + exif_app1_segment(9) + base[2:]
        assert exif_orientation(weird) == 1
        assert exif_orientation(b"\x00\x00nope") == 1

    @pytest.mark.parametrize("o,transform", [
        (3, lambda a: a[::-1, ::-1]),   # stored rot180
        (6, lambda a: np.rot90(a, 1)),  # stored 90 CCW, tag says CW
        (8, lambda a: np.rot90(a, 3)),  # stored 90 CW, tag says CCW
    ])
    def test_rotated_duplicate_collides_in_dhash(self, o, transform):
        from clustering_spark.operators.jpeg import (
            encode_baseline,
            exif_app1_segment,
        )
        from clustering_spark.operators.multimodal import (
            _decode_gray,
            _dhash64,
        )

        y = np.linspace(0, 220, 24)[:, None]
        x = np.linspace(0, 90, 36)[None, :]
        upright = (y + x).astype(np.uint8)
        plain = encode_baseline(upright)
        stored = encode_baseline(
            np.ascontiguousarray(transform(upright))
        )
        tagged = stored[:2] + exif_app1_segment(o) + stored[2:]
        h1 = _dhash64(_decode_gray(plain))
        h2 = _dhash64(_decode_gray(tagged))
        ham = bin(h1 ^ h2).count("1")
        assert ham <= 2, (o, ham)
        # and WITHOUT the tag the rotated copy does NOT collide —
        # the normalization is doing the work
        h3 = _dhash64(_decode_gray(stored))
        assert bin(h1 ^ h3).count("1") > 8


class TestLutDifferential:
    """Round-15 review batch 2: the 8-bit first-level LUT must be
    SEMANTICALLY INVISIBLE — for any table and any bit stream, the
    LUT-accelerated decode and the exact bit-walk produce identical
    symbol sequences and identical end-of-stream errors."""

    def test_lut_vs_bitwalk_random_streams(self):
        import random

        from clustering_spark.operators.jpeg import (
            _BitReader,
            _build_decode_table,
            _decode_symbol,
        )

        rng = random.Random(15)
        # canonical tables of varied shape, incl. codes > 8 bits and
        # a degenerate 1-symbol table
        shapes = [
            ([0, 2, 3, 1] + [0] * 12, list(range(6))),
            ([1] + [0] * 15, [7]),
            ([0, 1, 1, 2, 3, 5, 8, 13, 21] + [0] * 7, list(range(54))),
            ([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 2, 0, 0, 0],
             [1, 2, 3, 4]),
        ]
        for bits, vals in shapes:
            table = _build_decode_table(bytes(bits), bytes(vals))
            walk_only = {k: v for k, v in table.items() if k != "lut8"}
            for trial in range(40):
                data = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(1, 24))
                )
                a = _BitReader(data)
                b = _BitReader(data)
                out_a, out_b = [], []
                err_a = err_b = None
                try:
                    for _ in range(64):
                        out_a.append(_decode_symbol(a, table))
                except ValueError as e:
                    err_a = str(e)
                try:
                    for _ in range(64):
                        out_b.append(_decode_symbol(b, walk_only))
                except ValueError as e:
                    err_b = str(e)
                assert out_a == out_b, (bits, data.hex())
                assert err_a == err_b, (bits, data.hex(), err_a, err_b)
                # and both readers agree on the consumed position
                assert (a.pos, a.n) == (b.pos, b.n)
