"""Full-spec PNG codec (operators/png.py): round-trip matrix over
every color type x depth x interlace x filter, sub-byte scaling,
palette resolution, Adam7 empty passes, degrade contract + mutation
fuzz, and the Spark dispatch on previously-gated variants.
"""

from __future__ import annotations

import numpy as np
import pytest

from clustering_spark.operators.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
)


def _rt(arr, **kw):
    w, h, ch, s = decode_png(encode_png(arr, **kw))
    return np.frombuffer(s, np.uint8).reshape(h, w, ch)


class TestRoundTrip:
    @pytest.mark.parametrize("color,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
    @pytest.mark.parametrize("depth", [8, 16])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_direct_types(self, color, ch, depth, interlace):
        rng = np.random.default_rng(31)
        a = rng.integers(
            0, 256, (11, 13, ch) if ch > 1 else (11, 13), dtype=np.uint8
        )
        got = _rt(a, color_type=color, depth=depth, interlace=interlace,
                  filter_type=4)
        assert (got == a.reshape(11, 13, ch)).all()

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_all_filters(self, ft):
        rng = np.random.default_rng(32)
        a = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
        assert (_rt(a, color_type=2, filter_type=ft)
                == a).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_subbyte_gray_scales_to_8bit(self, depth):
        rng = np.random.default_rng(33)
        mx = (1 << depth) - 1
        a = rng.integers(0, mx + 1, (9, 17), dtype=np.uint8)
        got = _rt(a, color_type=0, depth=depth, interlace=True)
        assert (got[:, :, 0] == a * (255 // mx)).all()

    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_palette_resolves_to_rgb(self, depth):
        rng = np.random.default_rng(34)
        pal = rng.integers(0, 256, (1 << depth, 3), dtype=np.uint8)
        idx = rng.integers(0, 1 << depth, (10, 12), dtype=np.uint8)
        got = _rt(idx, color_type=3, depth=depth, palette=pal)
        assert (got == pal[idx]).all()

    @pytest.mark.parametrize("dims", [(1, 1), (2, 1), (1, 2), (3, 3), (7, 5)])
    def test_adam7_small_images_skip_empty_passes(self, dims):
        rng = np.random.default_rng(35)
        a = rng.integers(0, 256, dims, dtype=np.uint8)
        got = _rt(a, color_type=0, interlace=True)
        assert (got[:, :, 0] == a).all()

    def test_16bit_keeps_high_byte(self):
        # the encoder writes v*257 so decode == input; a hand-built
        # 16-bit sample with differing bytes keeps the HIGH one
        b = bytearray(encode_png(
            np.array([[0xAB]], dtype=np.uint8), color_type=0, depth=16
        ))
        import zlib

        # raw scanline: filter 0 + 0xAB 0xAB -> patch low byte, re-deflate
        raw = b"\x00\xab\xcd"
        comp = zlib.compress(raw)
        idat_at = bytes(b).index(b"IDAT") - 4
        import struct

        end_at = bytes(b).index(b"IEND") - 4
        new_idat = (
            struct.pack(">I", len(comp)) + b"IDAT" + comp
            + struct.pack(
                ">I", zlib.crc32(b"IDAT" + comp) & 0xFFFFFFFF
            )
        )
        blob = bytes(b)[:idat_at] + new_idat + bytes(b)[end_at:]
        w, h, ch, s = decode_png(blob)
        assert s == b"\xab"


class TestDegrade:
    def test_missing_plte_raises(self):
        b = encode_png(
            np.zeros((2, 2), dtype=np.uint8), color_type=3, depth=8,
            palette=np.zeros((2, 3), dtype=np.uint8),
        )
        blob = b.replace(b"PLTE", b"QLTE")
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(blob)

    def test_illegal_depth_color_combo_raises(self):
        b = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
        idx = bytes(b).index(b"IHDR") + 4 + 8
        b[idx] = 3  # depth 3 is illegal everywhere
        with pytest.raises(ValueError, match="illegal"):
            decode_png(bytes(b))

    def test_truncated_idat_raises(self):
        b = encode_png(np.zeros((8, 8), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_png(b[: len(b) // 2])

    def test_pixel_budget(self):
        import struct

        b = bytearray(encode_png(np.zeros((2, 2), dtype=np.uint8)))
        idx = bytes(b).index(b"IHDR") + 4
        b[idx : idx + 8] = struct.pack(">II", 1 << 20, 1 << 20)
        with pytest.raises(ValueError, match="budget"):
            decode_png(bytes(b))

    def test_mutation_fuzz_degrade_contract(self):
        import random

        rng = random.Random(0x9A6)
        g = np.arange(120, dtype=np.uint8).reshape(10, 12)
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        fixtures = [
            encode_png(g),
            encode_png(g, interlace=True, filter_type=4),
            encode_png(g % 16, color_type=3, depth=4, palette=pal),
            encode_png(g, color_type=0, depth=16),
        ]
        for _ in range(500):
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
                decode_png(bytes(base))
            except ValueError:
                pass


class TestSparkDispatch:
    def test_previously_gated_variants_now_decode(self, spark):
        from clustering_spark.operators import multimodal as mm

        rng = np.random.default_rng(36)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, (12, 20), dtype=np.uint8)
        gray16 = rng.integers(0, 256, (9, 9), dtype=np.uint8)
        rows = [
            (1, encode_png(idx, color_type=3, depth=8, palette=pal)),
            (2, encode_png(gray16, color_type=0, depth=16,
                           interlace=True)),
        ]
        df = spark.createDataFrame(rows, "id long, img binary")
        out = (
            mm.decode_image_meta(df, "img", "id")
            .toPandas()
            .set_index("id")
        )
        assert (out.loc[1, "width"], out.loc[1, "height"]) == (20, 12)
        assert out.loc[1, "mean_intensity"] == pytest.approx(
            float(pal[idx].mean())
        )
        assert out.loc[2, "mean_intensity"] == pytest.approx(
            float(gray16.mean())
        )
        # and the perceptual hash path covers them too
        dh = mm.image_dhash(df, "img", "id").toPandas().set_index("id")
        assert dh.loc[1, "dhash"] is not None


class TestBombGuard:
    """Round-13 ADVICE (medium): the decode budget must bound the
    ALLOCATION, not be checked after zlib has already inflated a
    hostile ~1000:1 stream. The geometry (h rows of stride+1 bytes)
    is known before inflation, so a 1x1 IHDR riding a megabytes-
    inflating IDAT is rejected by bounded_inflate without ever
    materializing the payload."""

    def test_tiny_ihdr_huge_idat_rejected(self):
        import struct
        import zlib as _z

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(
                    ">I", _z.crc32(ctype + data) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # 1x1 gray
        bomb = _z.compress(b"\x00" * (50 * 1024 * 1024), 9)
        blob = (
            PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bomb)
            + chunk(b"IEND", b"")
        )
        assert len(blob) < 1024 * 1024  # the attack is small on disk
        with pytest.raises(ValueError, match="budget"):
            decode_png(blob)

    def test_idat_with_modest_excess_tolerated(self):
        # round-14 ADVICE: libpng tolerates modest trailing surplus
        # with a warning, and sloppy real-world encoders do emit a
        # few extra bytes — such PNGs must DECODE (to the geometric
        # pixels; surplus never reaches the unfilter), not be
        # reclassified corrupt
        import struct
        import zlib as _z

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(
                    ">I", _z.crc32(ctype + data) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        # exact is 2 rows * (2 + 1) = 6 bytes; send 7
        blob = (
            PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(b"\x00" * 7))
            + chunk(b"IEND", b"")
        )
        w, h, ch, samples = decode_png(blob)
        assert (w, h, ch) == (2, 2, 1)
        assert samples == b"\x00" * 4

    def test_idat_surplus_beyond_slack_still_rejected(self):
        # ...but surplus far past the geometry is a bomb, not sloppy
        # encoding: the slack is 64 + expected/256, so a multi-KB
        # surplus on a 2x2 image still raises with the allocation
        # bounded before it materializes
        import struct
        import zlib as _z

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(
                    ">I", _z.crc32(ctype + data) & 0xFFFFFFFF
                )
            )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        blob = (
            PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(b"\x00" * 8192))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="budget"):
            decode_png(blob)

    def test_exact_size_still_decodes(self):
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
        w, h, ch, samples = decode_png(encode_png(arr))
        assert (w, h, ch) == (4, 4, 1)
        assert np.frombuffer(samples, np.uint8).reshape(4, 4).tolist() \
            == arr.tolist()
