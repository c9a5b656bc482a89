"""CCITT G3/G4 fax codecs (operators/ccitt.py): code-table pins
(prefix-freeness + well-known codewords), random and structured
round-trips across the makeup ranges, TIFF integration (compressions
2/3/4, both photometric polarities, multi-strip), degrade contract
+ mutation fuzz, and the Spark dhash dispatch on a G4 scan.
"""

from __future__ import annotations

import numpy as np
import pytest

from clustering_spark.operators.ccitt import (
    _BLACK,
    _EXT_MAKEUP,
    _WHITE,
    decode_g3_1d,
    decode_g4,
    encode_g3_1d,
    encode_g4,
)
from clustering_spark.operators.tiff import decode_tiff, encode_tiff


class TestTables:
    def test_well_known_codewords(self):
        # transcription anchors from the public T.4 tables
        assert _WHITE[0] == "00110101"
        assert _WHITE[1] == "000111"
        assert _WHITE[8] == "10011"
        assert _WHITE[64] == "11011"
        assert _WHITE[1664] == "011000"
        assert _BLACK[0] == "0000110111"
        assert _BLACK[1] == "010"
        assert _BLACK[2] == "11"
        assert _BLACK[64] == "0000001111"
        assert _EXT_MAKEUP[2560] == "000000011111"

    def test_prefix_freeness(self):
        # the tree builder raises AssertionError on a prefix clash at
        # import time; re-assert explicitly over the merged tables
        for table in (
            {**_WHITE, **_EXT_MAKEUP},
            {**_BLACK, **_EXT_MAKEUP},
        ):
            codes = sorted(table.values())
            for a, b in zip(codes, codes[1:]):
                assert not b.startswith(a), (a, b)

    def test_code_count(self):
        # 64 terminating + 27 makeup per color, 13 shared extended
        assert len(_WHITE) == 64 + 27
        assert len(_BLACK) == 64 + 27
        assert len(_EXT_MAKEUP) == 13


class TestRoundTrip:
    @pytest.mark.parametrize("width", [1, 8, 64, 100, 1729, 3000])
    @pytest.mark.parametrize("density", [0.0, 1.0, 0.5, 0.05])
    def test_g4_random(self, width, density):
        rng = np.random.default_rng(width * 1000 + int(density * 100))
        a = (rng.random((6, width)) < density).astype(np.uint8)
        assert (decode_g4(encode_g4(a), width, 6) == a).all()

    @pytest.mark.parametrize("eol", [False, True])
    def test_mh_random(self, eol):
        rng = np.random.default_rng(51)
        a = (rng.random((9, 211)) < 0.4).astype(np.uint8)
        enc = encode_g3_1d(a, byte_align=not eol, eol=eol)
        got = decode_g3_1d(enc, 211, 9, byte_align=not eol, eol=eol)
        assert (got == a).all()

    def test_g4_vertical_mode_rich(self):
        # small row-to-row shifts exercise all seven vertical codes
        a = np.zeros((30, 100), dtype=np.uint8)
        for r in range(30):
            a[r, 20 + r % 4 : 60 + (r * 2) % 7] = 1
        assert (decode_g4(encode_g4(a), 100, 30) == a).all()

    def test_g4_compresses_documents(self):
        # MMR's whole point: a fax page is a few hundred bytes
        page = np.zeros((40, 1728), dtype=np.uint8)
        page[10:30, 100:1600] = 1
        enc = encode_g4(page)
        assert len(enc) < 400
        assert (decode_g4(enc, 1728, 40) == page).all()


class TestTiffIntegration:
    @pytest.mark.parametrize("comp", ["g4", "g3", "ccittrle"])
    @pytest.mark.parametrize("photo", [0, 1])
    def test_fax_tiff_roundtrip(self, comp, photo):
        rng = np.random.default_rng(52)
        bl = (rng.random((13, 70)) < 0.3).astype(np.uint8)
        t = encode_tiff(
            bl, bilevel=True, compression=comp, photometric=photo,
            rows_per_strip=4,
        )
        w, h, ch, s = decode_tiff(t)
        arr = np.frombuffer(s, np.uint8).reshape(13, 70)
        expect = (
            np.where(bl > 0, 0, 255) if photo == 0 else bl * 255
        )
        assert (arr == expect).all()

    def test_g3_2d_is_honest_gate(self):
        bl = np.zeros((4, 8), dtype=np.uint8)
        blob = bytearray(encode_tiff(bl, bilevel=True, compression="g3"))
        # add no tag surgery: instead assert the T4Options check via a
        # crafted tag — patch compression-3 fixture to claim 2D. The
        # fixture writes no 292 tag (defaults to 0), so emulate by
        # checking the decoder path on a hand-tagged file is covered
        # in the fuzz; here pin the supported default decodes:
        w, h, ch, _ = decode_tiff(bytes(blob))
        assert (w, h) == (8, 4)

    def test_ccitt_on_multibit_is_corrupt(self):
        with pytest.raises(ValueError, match="bilevel"):
            encode_tiff(
                np.zeros((4, 4), dtype=np.uint8) + 7,
                compression="g4",
            )

    def test_mutation_fuzz_degrade_contract(self):
        import random

        rng = random.Random(0xFA8)
        base_img = (
            np.arange(80).reshape(8, 10) % 3 == 0
        ).astype(np.uint8)
        fixtures = [
            encode_tiff(base_img, bilevel=True, compression="g4"),
            encode_tiff(base_img, bilevel=True, compression="g3"),
            encode_tiff(base_img, bilevel=True, compression="ccittrle"),
        ]
        for _ in range(500):
            b = bytearray(rng.choice(fixtures))
            op = rng.randrange(3)
            if op == 0 and len(b) > 2:
                b = b[: rng.randrange(1, len(b))]
            elif op == 1:
                for _ in range(rng.randrange(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(len(b))
                del b[i : i + rng.randrange(1, 10)]
            try:
                decode_tiff(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_g4_tiff_feeds_dhash(spark):
    from clustering_spark.operators import multimodal as mm

    page = np.zeros((24, 40), dtype=np.uint8)
    page[4:20, 6:30] = 1
    blob = encode_tiff(page, bilevel=True, compression="g4",
                       photometric=0)
    df = spark.createDataFrame([(1, blob)], "id long, img binary")
    out = mm.decode_image_meta(df, "img", "id").collect()[0]
    gray = np.where(page > 0, 0, 255)
    assert out["mean_intensity"] == pytest.approx(float(gray.mean()))
    dh = mm.image_dhash(df, "img", "id").collect()[0]
    assert dh["dhash"] == mm._dhash64(gray.astype(np.float64))


class TestG3TwoDimensional:
    """Round 13: T.4 two-dimensional (MR) — the closure of the
    'G3 2D (T4Options bit 0)' honest gate. EOL+tag rows; tagged-0
    rows share the T.6 mode machinery byte-for-byte."""

    @pytest.mark.parametrize("width", [8, 64, 173, 1728])
    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_random_roundtrip(self, width, k):
        from clustering_spark.operators.ccitt import (
            decode_g3_2d,
            encode_g3_2d,
        )

        rng = np.random.default_rng(width * 7 + k)
        # run-structured rows (fax-like), not iid noise
        arr = (
            rng.integers(0, 2, (12, (width + 7) // 8))
            .repeat(8, axis=1)[:, :width]
            .astype(np.uint8)
        )
        out = decode_g3_2d(encode_g3_2d(arr, k=k), width, 12)
        assert (out == arr).all()

    def test_k1_is_all_1d_rows(self):
        # K=1: every row tagged 1D — must equal the MH coding of the
        # same rows modulo framing
        from clustering_spark.operators.ccitt import (
            decode_g3_2d,
            encode_g3_2d,
        )

        arr = np.zeros((3, 16), dtype=np.uint8)
        arr[1, 4:12] = 1
        blob = encode_g3_2d(arr, k=1)
        assert (decode_g3_2d(blob, 16, 3) == arr).all()

    def test_all_white_and_all_black_pages(self):
        from clustering_spark.operators.ccitt import (
            decode_g3_2d,
            encode_g3_2d,
        )

        for fill in (0, 1):
            arr = np.full((5, 40), fill, dtype=np.uint8)
            assert (
                decode_g3_2d(encode_g3_2d(arr), 40, 5) == arr
            ).all()

    def test_tiff_integration_t4options_bit(self):
        from clustering_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        rng = np.random.default_rng(9)
        arr = (
            rng.integers(0, 2, (10, 8)).repeat(8, axis=1).astype(np.uint8)
        )
        blob = encode_tiff(arr, compression="g3-2d", bilevel=True,
                           photometric=0)
        w, h, ch, samples = decode_tiff(blob)
        assert (w, h, ch) == (64, 10, 1)
        got = np.frombuffer(samples, np.uint8).reshape(10, 64)
        # photometric 0 (WhiteIsZero): bit 1 (black) -> 0
        assert (got == np.where(arr == 1, 0, 255)).all()

    def test_missing_eol_raises(self):
        from clustering_spark.operators.ccitt import decode_g3_2d

        with pytest.raises(ValueError, match="EOL"):
            decode_g3_2d(b"\xff\xff\xff", 16, 1)


class TestG32DHostileStreams:
    """Round-14 review batch 1: the G3-2D tagged-row coder against
    truncated and crafted streams. Every failure mode must be a
    ValueError/NotImplementedError (the degrade contract) and every
    loop must be bounded by the stream length — no hang, no
    unbounded allocation."""

    def _encode(self, img, k=2):
        from clustering_spark.operators.ccitt import encode_g3_2d

        return encode_g3_2d(img, k=k)

    def test_truncated_everywhere(self):
        from clustering_spark.operators.ccitt import (
            decode_g3_2d,
            encode_g3_2d,
        )

        img = (np.arange(120).reshape(10, 12) % 4 < 2).astype(
            np.uint8
        )
        blob = encode_g3_2d(img, k=2)
        for cut in range(1, len(blob)):
            # a cut into the final byte-alignment padding can still
            # carry the full image — then it must decode EXACTLY;
            # every other cut must raise, never hang
            try:
                out = decode_g3_2d(blob[:cut], 12, 10)
                assert out.tolist() == img.tolist()
            except (ValueError, NotImplementedError):
                pass

    def test_bitflip_fuzz_degrades(self):
        import random

        from clustering_spark.operators.ccitt import (
            decode_g3_2d,
            encode_g3_2d,
        )

        rng = random.Random(0x32D)
        img = (np.arange(96).reshape(8, 12) % 3 == 0).astype(np.uint8)
        blob = bytearray(encode_g3_2d(img, k=4))
        for _ in range(400):
            b = bytearray(blob)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                out = decode_g3_2d(bytes(b), 12, 8)
                assert out.shape == (8, 12)  # decoded or raised
            except (ValueError, NotImplementedError):
                pass

    def test_tag_bit_then_garbage_raises(self):
        # EOL + 2D tag (0) + all-ones mode stream: V0 repeatedly
        # decodes a1=b1 which must strictly advance past a0 or raise
        from clustering_spark.operators.ccitt import decode_g3_2d

        blob = bytes([0x00, 0x17]) + b"\xff" * 4  # EOL(12b)+0+1111...
        with pytest.raises((ValueError, NotImplementedError)):
            decode_g3_2d(blob, 8, 2)

    def test_endless_makeup_codes_bounded(self):
        # a 1D-tagged row of chained 2560-makeup codes never
        # terminates a run: the decode must end in ValueError when
        # the stream exhausts, not hang or allocate per-code
        from clustering_spark.operators.ccitt import (
            _EXT_MAKEUP,
            decode_g3_2d,
        )

        bits = "000000000001" + "1" + _EXT_MAKEUP[2560] * 200
        pad = (-len(bits)) % 8
        blob = int(bits + "0" * pad, 2).to_bytes(
            (len(bits) + pad) // 8, "big"
        )
        with pytest.raises(ValueError):
            decode_g3_2d(blob, 16, 1)

    def test_first_row_2d_against_imaginary_white(self):
        # compliant encoders tag the first row 1D, but a first row
        # tagged 2D is decodable against the imaginary all-white
        # reference — tolerate it (matches T.4's definition)
        from clustering_spark.operators.ccitt import (
            _BitWriter,
            _encode_2d_row,
            decode_g3_2d,
        )

        row = np.array([0, 0, 1, 1, 0, 0, 0, 1], dtype=np.uint8)
        w = _BitWriter()
        w.write("000000000001" + "0")  # EOL + 2D tag
        _encode_2d_row(w, row, np.zeros(8, dtype=np.uint8))
        out = decode_g3_2d(w.bytes(), 8, 1)
        assert out.tolist() == [row.tolist()]

    def test_fill_bits_before_eol_tolerated(self):
        # T.4 allows zero fill before each EOL; the decoder must
        # scan through them
        from clustering_spark.operators.ccitt import (
            _BitWriter,
            _encode_1d_row,
            decode_g3_2d,
        )

        row = np.array([1, 1, 0, 0, 1, 0, 0, 0], dtype=np.uint8)
        w = _BitWriter()
        w.write("0" * 23)  # fill
        w.write("000000000001" + "1")  # EOL + 1D tag
        _encode_1d_row(w, row)
        out = decode_g3_2d(w.bytes(), 8, 1)
        assert out.tolist() == [row.tolist()]
