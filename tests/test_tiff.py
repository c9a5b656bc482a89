"""TIFF codec (operators/tiff.py): encode/decode round-trips across
compression x predictor x strip x endianness, bilevel polarities,
WhiteIsZero inversion, the TIFF-LZW early-change width ladder, honest
NotImplementedError gates, mutation fuzz, and the Spark dispatch
(decode_image_meta, image_dhash, resize_images).
"""

from __future__ import annotations

import numpy as np
import pytest

from clustering_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


def _rt(arr, **kw):
    w, h, ch, s = decode_tiff(encode_tiff(arr, **kw))
    got = np.frombuffer(s, np.uint8)
    if ch == 1:
        return got.reshape(h, w)
    return got.reshape(h, w, ch)


def _oldstyle_jpeg_tiff(jpeg_bytes: bytes, w: int, h: int) -> bytes:
    """Minimal OLD-style JPEG-in-TIFF (compression 6) fixture: tag
    513 (JPEGInterchangeFormat) pointing at one complete JFIF stream
    with 514 carrying its length — the EXIF-thumbnail layout."""
    import struct as st

    entries = [
        (256, 4, w), (257, 4, h), (258, 3, 8), (259, 3, 6),
        (262, 3, 6), (277, 3, 1),
        (513, 4, None), (514, 4, len(jpeg_bytes)),
    ]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(b"II*\x00" + st.pack("<I", 8))
    out += st.pack("<H", n)
    for tag, typ, val in entries:
        v = data_off if tag == 513 else val
        out += st.pack("<HHI", tag, typ, 1)
        out += st.pack("<I", v) if typ == 4 else st.pack("<HH", v, 0)
    out += st.pack("<I", 0)  # no next IFD
    out += jpeg_bytes
    return bytes(out)


class TestRoundTrip:
    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    @pytest.mark.parametrize("pred", [False, True])
    @pytest.mark.parametrize("be", [False, True])
    def test_gray_and_rgb(self, comp, pred, be):
        rng = np.random.default_rng(11)
        g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
        assert (_rt(g, compression=comp, predictor=pred,
                    big_endian=be) == g).all()
        c = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        assert (_rt(c, compression=comp, predictor=pred,
                    big_endian=be) == c).all()

    def test_multi_strip(self):
        rng = np.random.default_rng(12)
        g = rng.integers(0, 256, (10, 40), dtype=np.uint8)
        for rps in (1, 3, 10, 99):
            assert (
                _rt(g, compression="lzw", rows_per_strip=rps) == g
            ).all()

    def test_bilevel_both_polarities(self):
        rng = np.random.default_rng(13)
        bl = rng.integers(0, 2, (10, 30), dtype=np.uint8)
        # BlackIsZero: 1 bits are white
        assert (_rt(bl, bilevel=True, photometric=1) == bl * 255).all()
        # WhiteIsZero: 0 bits are white
        assert (
            _rt(bl, bilevel=True, photometric=0)
            == np.where(bl > 0, 0, 255)
        ).all()

    def test_white_is_zero_gray_inverts(self):
        g = np.arange(25, dtype=np.uint8).reshape(5, 5)
        assert (_rt(g, photometric=0) == 255 - g).all()

    def test_predictor_bytes_differ_but_decode_equal(self):
        # a smooth gradient: the predictor changes the wire bytes
        # (that is its point) but not the decoded pixels
        g = np.tile(np.arange(64, dtype=np.uint8) * 4, (8, 1))
        a = encode_tiff(g, compression="lzw", predictor=False)
        b = encode_tiff(g, compression="lzw", predictor=True)
        assert a != b
        wa, ha, _, sa = decode_tiff(a)
        wb, hb, _, sb = decode_tiff(b)
        assert sa == sb


class TestLzw:
    def test_width_ladder_and_reset(self):
        # 300k random bytes force 10/11/12-bit codes AND a table
        # reset — the early-change off-by-one lives exactly here
        rng = np.random.default_rng(14)
        data = bytes(rng.integers(0, 256, 300_000, dtype=np.uint8))
        assert _lzw_decode(_lzw_encode(data), 10**7) == data

    def test_repetitive_data(self):
        data = b"abab" * 5000 + b"x" * 3000
        assert _lzw_decode(_lzw_encode(data), 10**6) == data

    def test_output_budget_enforced(self):
        data = bytes(1000)
        with pytest.raises(ValueError):
            _lzw_decode(_lzw_encode(data), 10)

    def test_truncation_salvages_prefix(self):
        data = b"scanned document row " * 100
        enc = _lzw_encode(data)
        got = _lzw_decode(enc[: len(enc) // 2], 10**6)
        assert data.startswith(got) and len(got) > 0

    def test_packbits_roundtrip_and_budget(self):
        rng = np.random.default_rng(15)
        runs = b"".join(
            bytes([v]) * n
            for v, n in zip(
                rng.integers(0, 256, 200),
                rng.integers(1, 300, 200),
            )
        )
        assert _packbits_decode(_packbits_encode(runs), 10**6) == runs
        with pytest.raises(ValueError):
            _packbits_decode(_packbits_encode(runs), 10)


class TestGates:
    def test_oldstyle_jpeg_without_stream_is_honest_gate(self):
        # round 14: old-style JPEG (6) with a JPEGInterchangeFormat
        # stream decodes natively (TestOldStyleJpegInTiff); the
        # per-strip JPEGProc table-assembly variant (no tag 513)
        # stays the honest gate — its semantics genuinely diverge
        # across writers
        g = np.zeros((4, 4), dtype=np.uint8)
        blob = bytearray(encode_tiff(g))
        idx = blob.find(b"\x03\x01\x03\x00")  # tag 259, SHORT
        assert idx > 0
        blob[idx + 8] = 6
        with pytest.raises(NotImplementedError, match="compression 6"):
            decode_tiff(bytes(blob))

    def test_oldstyle_jpeg_interchange_stream_decodes(self):
        """Round 14: the layout real compression-6 files ship — tag
        513 (JPEGInterchangeFormat) pointing at ONE complete JFIF
        stream (EXIF thumbnails use exactly this) — decodes on the
        in-repo T.81 codec."""
        from clustering_spark.operators.jpeg import encode_baseline

        g = np.full((8, 8), 128, np.uint8)
        g[2:6, 2:6] = 136  # smooth content: JPEG-close, not exact
        blob = _oldstyle_jpeg_tiff(encode_baseline(g), 8, 8)
        w, h, ch, s = decode_tiff(blob)
        assert (w, h, ch) == (8, 8, 1)
        got = np.frombuffer(s, np.uint8).reshape(8, 8)
        assert abs(float(got.mean()) - float(g.mean())) < 3.0

    def test_oldstyle_jpeg_dim_mismatch_raises(self):
        from clustering_spark.operators.jpeg import encode_baseline

        blob = _oldstyle_jpeg_tiff(
            encode_baseline(np.zeros((4, 4), np.uint8)), 8, 8
        )
        with pytest.raises(ValueError, match="IFD claims"):
            decode_tiff(blob)

    def test_oldstyle_jpeg_stream_outside_file_raises(self):
        from clustering_spark.operators.jpeg import encode_baseline

        jpg = encode_baseline(np.zeros((4, 4), np.uint8))
        blob = bytearray(_oldstyle_jpeg_tiff(jpg, 4, 4))
        # inflate the declared length past EOF
        import struct as st

        i = blob.find(st.pack("<HH", 514, 4))
        blob[i + 8 : i + 12] = st.pack("<I", len(blob) * 4)
        with pytest.raises(ValueError, match="outside the file"):
            decode_tiff(bytes(blob))

    def test_exotic_depth_is_honest_gate(self):
        # 16-bit graduated from gate to supported in round 13; 12-bit
        # (and other sub/odd depths) stay honestly gated
        g = np.zeros((4, 4), dtype=np.uint8)
        blob = bytearray(encode_tiff(g))
        idx = blob.find(b"\x02\x01\x03\x00")  # tag 258 BitsPerSample
        assert idx > 0
        blob[idx + 8] = 12
        with pytest.raises(NotImplementedError, match="bits"):
            decode_tiff(bytes(blob))

    def test_decode_budget(self):
        g = np.zeros((4, 4), dtype=np.uint8)
        blob = bytearray(encode_tiff(g))
        # inflate ImageWidth (256, LONG) to 2^20 and height too
        i256 = blob.find(b"\x00\x01\x04\x00")
        i257 = blob.find(b"\x01\x01\x04\x00")
        import struct as st

        blob[i256 + 8 : i256 + 12] = st.pack("<I", 1 << 20)
        blob[i257 + 8 : i257 + 12] = st.pack("<I", 1 << 20)
        with pytest.raises(ValueError, match="budget"):
            decode_tiff(bytes(blob))

    def test_mutation_fuzz_degrade_contract(self):
        import random

        rng = random.Random(0x71FF)
        g = np.arange(120, dtype=np.uint8).reshape(10, 12)
        fixtures = [
            encode_tiff(g),
            encode_tiff(g, compression="lzw", predictor=True),
            encode_tiff(g, compression="packbits", rows_per_strip=3),
            encode_tiff((g % 2), bilevel=True),
        ]
        for _ in range(600):
            base = bytearray(rng.choice(fixtures))
            op = rng.randrange(3)
            if op == 0 and len(base) > 2:
                base = base[: rng.randrange(1, len(base))]
            elif op == 1:
                for _ in range(rng.randrange(1, 8)):
                    base[rng.randrange(len(base))] = rng.randrange(256)
            else:
                i = rng.randrange(len(base))
                del base[i : i + rng.randrange(1, 20)]
            try:
                decode_tiff(bytes(base))
            except (ValueError, NotImplementedError):
                pass


class TestSparkDispatch:
    def test_decode_image_meta_and_dhash(self, spark):
        from clustering_spark.operators import multimodal as mm

        rng = np.random.default_rng(16)
        g = rng.integers(0, 256, (12, 20), dtype=np.uint8)
        blob = encode_tiff(g, compression="lzw", predictor=True)
        df = spark.createDataFrame([(1, blob)], "id long, img binary")
        row = mm.decode_image_meta(df, "img", "id").collect()[0]
        assert (row["width"], row["height"]) == (20, 12)
        assert row["mean_intensity"] == pytest.approx(float(g.mean()))
        dh = mm.image_dhash(df, "img", "id").collect()[0]
        expect = mm._dhash64(g.astype(np.float64))
        assert dh["dhash"] == expect

    def test_resize_reemits_tiff(self, spark):
        from clustering_spark.operators import multimodal as mm

        rng = np.random.default_rng(17)
        c = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        blob = encode_tiff(c, compression="packbits")
        df = spark.createDataFrame([(1, blob)], "id long, img binary")
        out = mm.resize_images(df, "img", "id", 8, 8).collect()[0]
        w, h, ch, s = decode_tiff(bytes(out["image"]))
        assert (w, h, ch) == (8, 8, 3)
        # nearest-neighbor at exactly 2x downscale picks pixel centers
        got = np.frombuffer(s, np.uint8).reshape(8, 8, 3)
        assert (got == c[1::2, 1::2]).all()


class TestExpandedEnvelope:
    """Round 13: tiled / planar / 16-bit TIFF — three former honest
    gates, now decoded. Every combination round-trips through the
    fixture encoder (16-bit writes v*257 so the high-byte reduction
    recovers v exactly)."""

    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
    @pytest.mark.parametrize("depth", [8, 16])
    @pytest.mark.parametrize("be", [False, True])
    def test_16bit_gray_and_rgb(self, comp, depth, be):
        rng = np.random.default_rng(depth + be)
        for shape in ((9, 7), (6, 5, 3)):
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            blob = encode_tiff(
                a, compression=comp, sample_depth=depth, big_endian=be
            )
            w, h, ch, s = decode_tiff(blob)
            got = np.frombuffer(s, np.uint8).reshape(
                shape if len(shape) == 3 else shape
            )
            assert (got == a).all()

    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
    def test_planar_rgb(self, comp):
        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
        blob = encode_tiff(a, compression=comp, planar=True,
                           rows_per_strip=4)
        w, h, ch, s = decode_tiff(blob)
        assert (w, h, ch) == (6, 10, 3)
        assert (np.frombuffer(s, np.uint8).reshape(10, 6, 3) == a).all()

    @pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
    @pytest.mark.parametrize("dims", [(16, 16), (8, 4)])
    def test_tiled_gray_and_rgb(self, comp, dims):
        rng = np.random.default_rng(11)
        for shape in ((20, 13), (9, 17, 3)):  # edge tiles padded
            a = rng.integers(0, 256, shape, dtype=np.uint8)
            blob = encode_tiff(a, compression=comp, tile=dims)
            w, h, ch, s = decode_tiff(blob)
            got = np.frombuffer(s, np.uint8).reshape(shape)
            assert (got == a).all()

    def test_tiled_planar_16bit_composes(self):
        rng = np.random.default_rng(21)
        a = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
        blob = encode_tiff(
            a, compression="lzw", tile=(8, 8), planar=True,
            sample_depth=16, big_endian=True,
        )
        w, h, ch, s = decode_tiff(blob)
        assert (w, h, ch) == (9, 11, 3)
        assert (np.frombuffer(s, np.uint8).reshape(11, 9, 3) == a).all()

    def test_16bit_predictor_stays_gated(self):
        # predictor 2 semantics on 16-bit need 16-bit cumsum before
        # reduction — honestly gated, never silently wrong
        a = np.zeros((4, 4), dtype=np.uint8)
        blob = bytearray(encode_tiff(a, sample_depth=16))
        # splice a predictor tag in? simpler: patch an existing blob's
        # IFD is brittle — drive the gate through the decoder check
        # by crafting via encode (which refuses), then assert decode's
        # code path directly:
        from clustering_spark.operators import tiff as t

        tags = t._read_tags(bytes(blob))
        assert tags[258] == [16]
        with pytest.raises(ValueError, match="8-bit"):
            encode_tiff(a, sample_depth=16, predictor=True)

    def test_huge_rows_per_strip_is_single_strip(self):
        # real-world writers ship RowsPerStrip=0xFFFFFFFF meaning
        # "one strip" — ceil(h/huge)=1 must decode, not overflow
        import struct as st

        a = (np.arange(88).reshape(8, 11) * 3 % 251).astype(np.uint8)
        blob = bytearray(encode_tiff(a))
        i = blob.find(st.pack("<HH", 278, 4))
        if i < 0:  # encoder may omit the tag; splice is then moot
            pytest.skip("encoder wrote no RowsPerStrip tag")
        blob[i + 8 : i + 12] = st.pack("<I", 0xFFFFFFFF)
        w, h, ch, s = decode_tiff(bytes(blob))
        assert (np.frombuffer(s, np.uint8).reshape(8, 11) == a).all()

    def test_zero_rows_per_strip_falls_back_to_height(self):
        import struct as st

        a = (np.arange(88).reshape(8, 11) * 7 % 253).astype(np.uint8)
        blob = bytearray(encode_tiff(a))
        i = blob.find(st.pack("<HH", 278, 4))
        if i < 0:
            pytest.skip("encoder wrote no RowsPerStrip tag")
        blob[i + 8 : i + 12] = st.pack("<I", 0)
        w, h, ch, s = decode_tiff(bytes(blob))
        assert (np.frombuffer(s, np.uint8).reshape(8, 11) == a).all()

    def test_tile_dims_without_offsets_raises(self):
        # a file carrying TileWidth/TileLength but no TileOffsets/
        # ByteCounts selects the tiled path and must fail loudly,
        # not fall back to reading strips that describe other bytes
        import struct as st

        a = np.zeros((8, 8), dtype=np.uint8)
        blob = bytearray(encode_tiff(a))  # stripped layout
        # splice TileWidth into an existing tag slot we can spare:
        # overwrite the RowsPerStrip tag id with TileWidth (322)
        i = blob.find(st.pack("<HH", 278, 4))
        if i < 0:
            pytest.skip("encoder wrote no RowsPerStrip tag")
        blob[i : i + 2] = st.pack("<H", 322)
        with pytest.raises(ValueError, match="[Tt]ile"):
            decode_tiff(bytes(blob))

    def test_too_few_tiles_raises(self):
        a = np.zeros((20, 20), dtype=np.uint8)
        blob = bytearray(encode_tiff(a, tile=(16, 16)))
        # drop the tile count: patch TileByteCounts count to 1
        import struct as st

        i = blob.find(st.pack("<HH", 325, 4))
        assert i > 0
        blob[i + 4 : i + 8] = st.pack("<I", 1)
        i = blob.find(st.pack("<HH", 324, 4))
        blob[i + 4 : i + 8] = st.pack("<I", 1)
        with pytest.raises(ValueError, match="cover"):
            decode_tiff(bytes(blob))


class TestJpegInTiff:
    """Round 13: new-style JPEG-in-TIFF (compression 7) — composed
    from the in-repo T.81 codec, both complete-stream chunks and the
    abbreviated JPEGTables (tag 347) layout. JPEG is lossy, so the
    pin is closeness on smooth content plus exact geometry."""

    def _smooth(self, h, w, ch=None):
        y = np.linspace(0, 200, h)[:, None]
        x = np.linspace(0, 55, w)[None, :]
        g = (y + x).astype(np.uint8)
        if ch is None:
            return g
        return np.stack([g, g // 2, 255 - g], axis=2)

    @pytest.mark.parametrize("tables", [False, True])
    def test_gray_strips(self, tables):
        g = self._smooth(24, 31)
        blob = encode_tiff(g, compression="jpeg", rows_per_strip=10,
                           jpeg_tables=tables)
        w, h, ch, s = decode_tiff(blob)
        assert (w, h, ch) == (31, 24, 1)
        got = np.frombuffer(s, np.uint8).reshape(24, 31)
        assert np.abs(got.astype(float) - g.astype(float)).mean() <= 6

    @pytest.mark.parametrize("tables", [False, True])
    def test_rgb_tiled(self, tables):
        c = self._smooth(21, 19, ch=3)
        blob = encode_tiff(c, compression="jpeg", tile=(16, 16),
                           jpeg_tables=tables)
        w, h, ch, s = decode_tiff(blob)
        assert (w, h, ch) == (19, 21, 3)
        got = np.frombuffer(s, np.uint8).reshape(21, 19, 3)
        assert np.abs(got.astype(float) - c.astype(float)).mean() <= 8

    def test_abbreviated_without_tables_tag_raises(self):
        g = self._smooth(16, 16)
        blob = bytearray(
            encode_tiff(g, compression="jpeg", jpeg_tables=True)
        )
        # corrupt the JPEGTables tag id so the chunk has no tables
        import struct as st

        i = blob.find(st.pack("<HH", 347, 7))
        assert i > 0
        blob[i : i + 2] = st.pack("<H", 40000)  # unknown private tag
        with pytest.raises(ValueError):
            decode_tiff(bytes(blob))

    def test_wrong_chunk_geometry_raises(self):
        from clustering_spark.operators.jpeg import encode_baseline

        # hand-assemble: declare 8x8 but embed a 16x16 JPEG chunk
        g16 = self._smooth(16, 16)
        blob = bytearray(encode_tiff(self._smooth(8, 8),
                                     compression="jpeg"))
        # replace the chunk wholesale is fiddly; instead patch declared
        # width/height down and expect the geometry check to fire
        import struct as st

        i256 = blob.find(st.pack("<HH", 256, 4))
        blob[i256 + 8 : i256 + 12] = st.pack("<I", 4)
        i257 = blob.find(st.pack("<HH", 257, 4))
        blob[i257 + 8 : i257 + 12] = st.pack("<I", 4)
        with pytest.raises(ValueError, match="expected"):
            decode_tiff(bytes(blob))


class TestDeflate:
    """Round 13: TIFF Deflate (8 / its Adobe twin 32946) — rides the
    shared bounded_inflate, so bombs are budget-bounded for free."""

    @pytest.mark.parametrize("depth", [8, 16])
    def test_roundtrip_strips_and_tiles(self, depth):
        rng = np.random.default_rng(77)
        g = rng.integers(0, 256, (14, 9), dtype=np.uint8)
        for kw in ({"rows_per_strip": 5}, {"tile": (8, 8)}):
            blob = encode_tiff(g, compression="deflate",
                               sample_depth=depth, **kw)
            w, h, ch, s = decode_tiff(blob)
            assert (np.frombuffer(s, np.uint8).reshape(14, 9) == g).all()

    def test_adobe_code_32946_decodes_too(self):
        g = np.arange(36, dtype=np.uint8).reshape(6, 6)
        blob = bytearray(encode_tiff(g, compression="deflate"))
        import struct as st

        i = blob.find(st.pack("<HH", 259, 3))
        blob[i + 8 : i + 10] = st.pack("<H", 32946)
        w, h, ch, s = decode_tiff(bytes(blob))
        assert (np.frombuffer(s, np.uint8).reshape(6, 6) == g).all()

    def test_deflate_bomb_bounded(self):
        import struct as st
        import zlib as z

        g = np.zeros((4, 4), dtype=np.uint8)
        blob = bytearray(encode_tiff(g, compression="deflate"))
        # swap the strip for a bomb and fix the byte count
        bomb = z.compress(b"\x00" * (32 * 1024 * 1024), 9)
        i279 = blob.find(st.pack("<HH", 279, 4))
        (old_cnt,) = st.unpack("<I", blob[i279 + 8 : i279 + 12])
        i273 = blob.find(st.pack("<HH", 273, 4))
        (off,) = st.unpack("<I", blob[i273 + 8 : i273 + 12])
        out = bytes(blob[:off]) + bomb
        out = bytearray(out)
        out[i279 + 8 : i279 + 12] = st.pack("<I", len(bomb))
        with pytest.raises(ValueError, match="budget"):
            decode_tiff(bytes(out))


class TestOldstyleJpegHostileOffsets:
    """Round-15 review batch 2: JPEGInterchangeFormat offsets that
    point outside the file (or carry hostile lengths) must be a clean
    ValueError — never an IndexError/OverflowError, never a decode of
    unrelated bytes."""

    def _fixture(self, off_override=None, len_override=None,
                 drop_514=False):
        import struct as st

        from clustering_spark.operators.jpeg import encode_baseline

        g = np.full((8, 8), 128, dtype=np.uint8)
        jb = encode_baseline(g)
        entries = [
            (256, 4, 8), (257, 4, 8), (258, 3, 8), (259, 3, 6),
            (262, 3, 6), (277, 3, 1), (513, 4, None),
        ]
        if not drop_514:
            entries.append((514, 4, len(jb) if len_override is None
                            else len_override))
        n = len(entries)
        data_off = 8 + 2 + 12 * n + 4
        out = bytearray(b"II*\x00" + st.pack("<I", 8))
        out += st.pack("<H", n)
        for tag, typ, val in entries:
            if tag == 513:
                v = data_off if off_override is None else off_override
            else:
                v = val
            out += st.pack("<HHI", tag, typ, 1)
            out += st.pack("<I", v) if typ == 4 else st.pack("<HH", v, 0)
        out += st.pack("<I", 0)
        out += jb
        return bytes(out)

    def test_offset_past_eof(self):
        blob = self._fixture(off_override=1 << 20)
        with pytest.raises(ValueError, match="outside the file"):
            decode_tiff(blob)

    def test_offset_past_eof_without_length_tag(self):
        # 514 absent: length defaults to len(b) - off, which goes
        # NEGATIVE for an out-of-file offset — must still be clean
        blob = self._fixture(off_override=1 << 20, drop_514=True)
        with pytest.raises(ValueError, match="outside the file"):
            decode_tiff(blob)

    def test_length_overruns_eof(self):
        blob = self._fixture(len_override=1 << 24)
        with pytest.raises(ValueError, match="outside the file"):
            decode_tiff(blob)

    def test_zero_length(self):
        blob = self._fixture(len_override=0)
        with pytest.raises(ValueError, match="outside the file"):
            decode_tiff(blob)

    def test_offset_overlapping_ifd_still_fails_cleanly(self):
        # an offset INSIDE the file but pointing at IFD bytes (not a
        # JFIF stream) must fail as a JPEG parse error, never decode
        blob = self._fixture(off_override=8)
        with pytest.raises(ValueError):
            decode_tiff(blob)
