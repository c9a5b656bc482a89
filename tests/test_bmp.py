"""BMP codec (operators/bmp.py): round-trips through the module's own
encoder across the DIB families (palette-8 bottom-up/top-down, 24/32-
bit RGB, RLE8), the strict mixed-corpus sniff ('BM' text must not
route as corrupt), malformed-input gates, and the multimodal
integration (header routing, decode_image_meta, dHash parity with the
PNG twin).
"""

import struct

import numpy as np
import pytest

from clustering_spark.operators.bmp import (
    bmp_meta,
    decode_bmp,
    encode_bmp,
    looks_like_bmp,
)


class TestRoundTrip:
    @pytest.mark.parametrize("top_down", [False, True])
    def test_gray8(self, top_down):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 256, (37, 53)).astype(np.uint8)
        w, h, ch, s = decode_bmp(encode_bmp(g, bpp=8, top_down=top_down))
        assert (w, h, ch) == (53, 37, 1)
        assert (np.frombuffer(s, np.uint8).reshape(37, 53) == g).all()

    @pytest.mark.parametrize("bpp", [24, 32])
    def test_rgb(self, bpp):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (21, 33, 3)).astype(np.uint8)
        w, h, ch, s = decode_bmp(encode_bmp(img, bpp=bpp))
        assert (w, h, ch) == (33, 21, 3)
        assert (np.frombuffer(s, np.uint8).reshape(21, 33, 3) == img).all()

    def test_rle8(self):
        rng = np.random.default_rng(3)
        # runs + odd width exercise run coding and row padding
        g = np.repeat(rng.integers(0, 256, (15, 9)), 3, axis=1).astype(
            np.uint8
        )
        w, h, ch, s = decode_bmp(encode_bmp(g, rle=True))
        assert (w, h, ch) == (27, 15, 1)
        assert (np.frombuffer(s, np.uint8).reshape(15, 27) == g).all()

    def test_odd_width_row_padding(self):
        g = np.arange(35, dtype=np.uint8).reshape(5, 7)
        w, h, ch, s = decode_bmp(encode_bmp(g, bpp=8))
        assert (np.frombuffer(s, np.uint8).reshape(5, 7) == g).all()

    def test_meta(self):
        g = np.zeros((10, 20), np.uint8)
        assert bmp_meta(encode_bmp(g, bpp=8)) == (20, 10, 8, 0)
        assert bmp_meta(encode_bmp(g, rle=True))[3] == 1
        assert bmp_meta(encode_bmp(g, bpp=8, top_down=True))[1] == 10


class TestSniff:
    def test_text_starting_with_bm_is_not_bmp(self):
        assert not looks_like_bmp(b"BMW cars are a fine subject for text")
        assert not looks_like_bmp(b"BM")
        assert not looks_like_bmp(b"")

    def test_real_bmp_sniffs(self):
        assert looks_like_bmp(encode_bmp(np.zeros((4, 4), np.uint8), bpp=8))


class TestGates:
    def test_unknown_compression_is_named_gate(self):
        b = bytearray(encode_bmp(np.zeros((4, 4), np.uint8), bpp=8))
        b[30:34] = struct.pack("<I", 99)
        with pytest.raises(NotImplementedError, match="compression 99"):
            decode_bmp(bytes(b))

    def test_truncated_pixels_raise(self):
        b = encode_bmp(np.zeros((16, 16), np.uint8), bpp=8)
        with pytest.raises(ValueError, match="truncated|data"):
            decode_bmp(b[: len(b) - 100])

    def test_bomb_budget(self):
        hdr = b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, 60000, 60000, 1, 24, 0, 0, 0, 0, 0, 0
        )
        with pytest.raises(ValueError, match="budget"):
            decode_bmp(hdr + info)

    def test_mutation_fuzz_clean_errors(self):
        import random

        rng = np.random.default_rng(4)
        full = encode_bmp(rng.integers(0, 256, (12, 18, 3)).astype(np.uint8))
        random.seed(13)
        for _ in range(200):
            i = random.randrange(len(full))
            mut = full[:i] + bytes([random.randrange(256)]) + full[i + 1 :]
            try:
                decode_bmp(mut)
            except (ValueError, NotImplementedError):
                pass
        rle = encode_bmp(rng.integers(0, 8, (10, 10)).astype(np.uint8),
                         rle=True)
        for _ in range(200):
            i = random.randrange(len(rle))
            mut = rle[:i] + bytes([random.randrange(256)]) + rle[i + 1 :]
            try:
                decode_bmp(mut)
            except (ValueError, NotImplementedError):
                pass


class TestMultimodalIntegration:
    def test_header_meta_routes_bmp_and_bm_text(self, spark):
        from clustering_spark.operators.multimodal import image_header_meta

        g = encode_bmp(np.zeros((12, 20), np.uint8), bpp=8)
        df = spark.createDataFrame(
            [(1, bytearray(g)),
             (2, bytearray(b"BMW cars are a fine subject for text"))],
            "id long, blob binary",
        )
        got = {
            r["id"]: r.asDict()
            for r in image_header_meta(df, "blob", "id").collect()
        }
        assert got[1]["format"] == "bmp"
        assert (got[1]["width"], got[1]["height"]) == (20, 12)
        assert got[2]["format"] == "unknown"  # the 2-byte-magic trap

    def test_decode_image_meta_bmp(self, spark):
        from clustering_spark.operators.multimodal import decode_image_meta

        g = np.full((10, 10), 90, np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_bmp(g, bpp=8)))], "id long, blob binary"
        )
        r = decode_image_meta(df, "blob", "id").collect()[0]
        assert (r["width"], r["height"]) == (10, 10)
        assert abs(r["mean_intensity"] - 90.0) < 1e-9

    def test_dhash_matches_png_twin(self, spark):
        from clustering_spark.operators.multimodal import (
            image_dhash,
            make_png,
        )

        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (24, 33)).astype(np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_bmp(g, bpp=8))),
             (2, bytearray(make_png(33, 24, g.tobytes(), 0)))],
            "id long, blob binary",
        )
        got = {
            r["id"]: r["dhash"]
            for r in image_dhash(df, "blob", "id").collect()
        }
        assert got[1] is not None and got[1] == got[2]

    def test_media_router_labels_bmp(self, spark):
        from clustering_spark.operators.multimodal import media_header_meta

        g = encode_bmp(np.zeros((6, 9), np.uint8), bpp=8)
        df = spark.createDataFrame(
            [(1, bytearray(g))], "id long, blob binary"
        )
        r = media_header_meta(df, "blob", "id").collect()[0]
        assert (r["media_type"], r["format"]) == ("image", "bmp")
        assert (r["width"], r["height"]) == (9, 6)
