"""Progressive JPEG (T.81 Annex G): the decoder is pinned by EXACT
pixel parity against the sequential pipeline — encode_progressive and
encode_baseline share one coefficient-preparation path, so decoding a
progressive file and a baseline file of the same array must produce
identical bytes. Covers DC/AC first+refine scans, EOB runs, spectral
bands, bit-plane ladders, restart intervals, subsampling, and
malformed-stream gates (fuzz: only ValueError/NotImplementedError).
"""

import random

import numpy as np
import pytest

from clustering_spark.operators.jpeg import (
    decode_baseline,
    decode_jpeg,
    encode_baseline,
    encode_progressive,
)


def _parity(arr, subsample=False, **kw):
    base = decode_baseline(encode_baseline(arr, subsample=subsample))
    prog = decode_baseline(
        encode_progressive(arr, subsample=subsample, **kw)
    )
    assert base == prog


class TestPixelParity:
    def test_gray_random(self):
        rng = np.random.default_rng(1)
        _parity(rng.integers(0, 256, (37, 53)).astype(np.uint8))

    def test_gray_flat_is_pure_eob_runs(self):
        # a flat image has zero AC everywhere: every AC scan is one
        # long EOB run across all blocks
        _parity(np.full((32, 48), 130, np.uint8))

    def test_gray_sparse_exercises_zrl_and_refine_runs(self):
        rng = np.random.default_rng(2)
        img = np.zeros((64, 64), np.uint8)
        mask = rng.random((64, 64)) < 0.03
        img[mask] = 255
        _parity(img)

    def test_gradient_smooth(self):
        g = (np.arange(48)[:, None] + np.arange(80)[None, :]).astype(
            np.uint8
        )
        _parity(g)

    def test_rgb_444(self):
        rng = np.random.default_rng(3)
        _parity(rng.integers(0, 256, (40, 56, 3)).astype(np.uint8))

    def test_rgb_420_odd_dims(self):
        rng = np.random.default_rng(4)
        _parity(
            rng.integers(0, 256, (41, 55, 3)).astype(np.uint8),
            subsample=True,
        )

    @pytest.mark.parametrize("ri", [1, 3, 7])
    def test_restart_intervals(self, ri):
        rng = np.random.default_rng(5)
        _parity(
            rng.integers(0, 256, (48, 64)).astype(np.uint8),
            restart_interval=ri,
        )

    def test_restart_with_subsampled_color(self):
        rng = np.random.default_rng(6)
        _parity(
            rng.integers(0, 256, (33, 49, 3)).astype(np.uint8),
            subsample=True,
            restart_interval=2,
        )

    def test_spectral_selection_only_script(self):
        rng = np.random.default_rng(7)
        scans = (
            ((0,), 0, 0, 0, 0),
            ((0,), 1, 5, 0, 0),
            ((0,), 6, 20, 0, 0),
            ((0,), 21, 63, 0, 0),
        )
        _parity(
            rng.integers(0, 256, (48, 64)).astype(np.uint8), scans=scans
        )

    def test_deep_bit_plane_ladder(self):
        rng = np.random.default_rng(8)
        scans = (
            ((0,), 0, 0, 0, 3), ((0,), 0, 0, 3, 2),
            ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 0, 3), ((0,), 1, 63, 3, 2),
            ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
        )
        _parity(
            rng.integers(0, 256, (48, 64)).astype(np.uint8), scans=scans
        )

    def test_decode_jpeg_alias(self):
        g = np.full((16, 16), 99, np.uint8)
        assert decode_jpeg(encode_progressive(g)) == decode_baseline(
            encode_baseline(g)
        )


class TestStreamShape:
    def test_sof2_marker_present(self):
        b = encode_progressive(np.zeros((8, 8), np.uint8))
        assert b"\xff\xc2" in b and b"\xff\xc0" not in b

    def test_multiple_sos_segments(self):
        b = encode_progressive(np.zeros((8, 8), np.uint8))
        assert b.count(b"\xff\xda") == 6  # the default gray script

    def test_missing_eoi_tolerated(self):
        # every scan is complete; the 2-byte EOI is a formality some
        # writers drop — decode what was fully delivered
        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        b = encode_progressive(g)
        assert decode_baseline(b[:-2]) == decode_baseline(b)


class TestGates:
    def test_ac_scan_with_multiple_components_rejected(self):
        rgb = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(ValueError, match="one component"):
            encode_progressive(rgb, scans=(((0, 1), 1, 5, 0, 0),))

    def test_dc_scan_with_nonzero_se_rejected_on_decode(self):
        b = bytearray(encode_progressive(np.zeros((8, 8), np.uint8)))
        # first SOS of the gray script is DC (Ss=0, Se=0): corrupt Se
        at = bytes(b).index(b"\xff\xda")
        (seglen,) = (int.from_bytes(b[at + 2 : at + 4], "big"),)
        se_at = at + 2 + seglen - 2  # ... Ss, Se, AhAl
        assert b[se_at - 1] == 0  # Ss
        b[se_at] = 63
        with pytest.raises(ValueError, match="Se=0"):
            decode_baseline(bytes(b))

    def test_truncation_fuzz_only_clean_errors(self):
        rng = np.random.default_rng(9)
        full = encode_progressive(
            rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
        )
        random.seed(11)
        for _ in range(200):
            cut = full[: random.randrange(2, len(full))]
            try:
                decode_baseline(cut)
            except (ValueError, NotImplementedError):
                pass

    def test_mutation_fuzz_only_clean_errors(self):
        rng = np.random.default_rng(10)
        full = encode_progressive(
            rng.integers(0, 256, (32, 32)).astype(np.uint8)
        )
        random.seed(12)
        for _ in range(200):
            i = random.randrange(len(full))
            mut = full[:i] + bytes([random.randrange(256)]) + full[i + 1 :]
            try:
                decode_baseline(mut)
            except (ValueError, NotImplementedError):
                pass


class TestPipelineIntegration:
    def test_header_pass_labels_progressive_with_dims(self, spark):
        from clustering_spark.operators import multimodal as mm

        b = encode_progressive(np.zeros((12, 20), np.uint8))
        df = spark.createDataFrame([(1, bytearray(b))], "id long, img binary")
        r = mm.image_header_meta(df, "img", "id").collect()[0]
        assert r["format"] == "jpeg-progressive"  # encoding-mix label
        assert (r["width"], r["height"]) == (20, 12)

    def test_decode_image_meta_decodes_progressive(self, spark):
        from clustering_spark.operators import multimodal as mm

        g = np.full((10, 14), 77, np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_progressive(g)))], "id long, img binary"
        )
        r = mm.decode_image_meta(df, "img", "id").collect()[0]
        assert (r["width"], r["height"]) == (14, 10)
        assert abs(r["mean_intensity"] - 77.0) < 2.0

    def test_dhash_now_covers_progressive(self, spark):
        # the same pixels through baseline and progressive encoding
        # must land on the SAME perceptual hash
        from clustering_spark.operators import multimodal as mm

        g = (np.arange(32)[:, None] * 5 + np.arange(48)[None, :]).astype(
            np.uint8
        )
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_progressive(g))),
                (2, bytearray(encode_baseline(g))),
            ],
            "id long, img binary",
        )
        got = {
            r["id"]: r["dhash"]
            for r in mm.image_dhash(df, "img", "id").collect()
        }
        assert got[1] is not None
        assert got[1] == got[2]
