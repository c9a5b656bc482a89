"""GIF codec (operators/gif.py): LZW round-trips through the module's
own encoder (variable code width, table reset, interlace, cScSc), the
block-walk header pass, malformed-input gates, and the multimodal
integration (header routing, decode_image_meta, dHash).
"""

import struct

import numpy as np
import pytest

from clustering_spark.operators.gif import (
    decode_gif,
    encode_gif,
    gif_meta,
)


def _rgb(samples: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(samples, np.uint8).reshape(h, w, 3)


class TestRoundTrip:
    def test_gray_exact(self):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 256, (37, 53)).astype(np.uint8)
        w, h, ch, samples = decode_gif(encode_gif(g))
        assert (w, h, ch) == (53, 37, 3)
        arr = _rgb(samples, w, h)
        assert (arr == g[:, :, None]).all()  # gray palette is identity

    def test_rgb_palette_exact(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (100, 3)).astype(np.uint8)
        img = pal[rng.integers(0, 100, (41, 29))]
        w, h, ch, samples = decode_gif(encode_gif(img))
        assert (_rgb(samples, w, h) == img).all()

    def test_interlaced_exact(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, (50, 20)).astype(np.uint8)
        b = encode_gif(g, interlace=True)
        w, h, ch, samples = decode_gif(b)
        assert (_rgb(samples, w, h)[:, :, 0] == g).all()

    def test_table_reset_big_image(self):
        # enough entropy to fill the 4096-entry LZW table repeatedly
        rng = np.random.default_rng(4)
        g = rng.integers(0, 256, (200, 300)).astype(np.uint8)
        w, h, ch, samples = decode_gif(encode_gif(g))
        assert (_rgb(samples, w, h)[:, :, 0] == g).all()

    def test_constant_image_cscsc_path(self):
        g = np.full((64, 64), 7, np.uint8)
        w, h, ch, samples = decode_gif(encode_gif(g))
        assert (_rgb(samples, w, h)[:, :, 0] == 7).all()

    def test_two_color_small_code_size(self):
        # 2 colors -> 2-entry palette -> min LZW code size 2 (floor)
        img = np.zeros((10, 16, 3), np.uint8)
        img[:, 8:] = (255, 0, 0)
        w, h, ch, samples = decode_gif(encode_gif(img))
        assert (_rgb(samples, w, h) == img).all()

    def test_gif87a_version(self):
        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        b = encode_gif(g, version=b"GIF87a")
        assert b[:6] == b"GIF87a"
        w, h, ch, samples = decode_gif(b)
        assert (_rgb(samples, w, h)[:, :, 0] == g).all()

    def test_too_many_colors_rejected(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="distinct colors"):
            encode_gif(img)


class TestHeaderWalk:
    def test_meta_counts_frames_and_skips_extensions(self):
        g = np.arange(100, dtype=np.uint8).reshape(10, 10)
        b = bytearray(encode_gif(g))
        # splice a graphic-control extension before the image block
        # (descriptor starts after the 13-byte header + 768-byte
        # identity palette — find() would hit 0x2C inside the palette)
        at = 13 + 768
        assert b[at] == 0x2C
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        spliced = bytes(b[:at]) + gce + bytes(b[at:])
        w, h, n = gif_meta(spliced)
        assert (w, h, n) == (10, 10, 1)
        # the decoder also walks past the extension
        ww, hh, _, _ = decode_gif(spliced)
        assert (ww, hh) == (10, 10)

    def test_meta_multi_frame(self):
        g1 = encode_gif(np.zeros((4, 4), np.uint8))
        # append a second image block by splicing before the trailer
        body = g1[:-1]
        second = g1[13 + 768 : -1]  # descriptor+lzw of the first frame
        two = body + second + b"\x3b"
        assert gif_meta(two)[2] == 2

    def test_not_gif_raises(self):
        with pytest.raises(ValueError, match="not a GIF"):
            gif_meta(b"PNG....")
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"JFIF")

    def test_truncated_subblocks_raise(self):
        g = encode_gif(np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            decode_gif(g[: len(g) - 20])

    def test_unknown_block_raises(self):
        g = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
        at = 13 + 768
        assert g[at] == 0x2C
        g[at] = 0x99
        with pytest.raises(ValueError, match="unknown GIF block"):
            decode_gif(bytes(g))

    def test_pixel_budget_guard(self):
        # 65535x65535 logical screen in a 30-byte stream must be
        # rejected before allocating the canvas
        hdr = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
        with pytest.raises(ValueError, match="budget"):
            decode_gif(hdr + b"\x2c" + b"\x00" * 12)

    def test_lzw_underrun_is_loud(self):
        g = bytearray(encode_gif(np.zeros((16, 16), np.uint8)))
        # zero out the last data sub-block length prefix chain: cut
        # pixels by truncating LZW data but keep structure parseable
        b = bytes(g)
        at = 13 + 768
        assert b[at] == 0x2C
        # rebuild with half the lzw payload
        desc_end = at + 10 + 1  # descriptor + min-code byte
        n = b[desc_end]
        cut = b[: desc_end + 1 + n // 4]
        cut += b"\x00\x3b"  # terminator + trailer
        # shrink the sub-block length prefix to match what remains
        cut = bytearray(cut)
        cut[desc_end] = n // 4
        with pytest.raises(ValueError, match="underrun|truncated|end of file"):
            decode_gif(bytes(cut))


class TestMultimodalIntegration:
    def test_header_meta_routes_gif(self, spark):
        from clustering_spark.operators.multimodal import image_header_meta

        g = encode_gif(np.zeros((12, 20), np.uint8))
        g1 = encode_gif(np.zeros((4, 4), np.uint8))
        two = g1[:-1] + g1[13 + 768 : -1] + b"\x3b"  # 2 frames
        df = spark.createDataFrame(
            [(1, bytearray(g)), (2, bytearray(two)),
             (3, bytearray(b"GIF89a" + b"\xff" * 4))],
            "id long, blob binary",
        )
        got = {
            r["id"]: r.asDict()
            for r in image_header_meta(df, "blob", "id").collect()
        }
        assert got[1]["format"] == "gif"
        assert (got[1]["width"], got[1]["height"]) == (20, 12)
        assert got[2]["format"] == "gif-animated"
        assert got[3]["format"] == "corrupt"

    def test_decode_image_meta_gif(self, spark):
        from clustering_spark.operators.multimodal import decode_image_meta

        g = np.full((10, 10), 80, np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif(g)))], "id long, blob binary"
        )
        r = decode_image_meta(df, "blob", "id").collect()[0]
        assert (r["width"], r["height"], r["n_pixels"]) == (10, 10, 100)
        assert abs(r["mean_intensity"] - 80.0) < 1e-9

    def test_dhash_covers_gif_and_matches_png_twin(self, spark):
        # the same pixels through GIF and PNG must produce the SAME
        # perceptual hash — dhash is decode-invariant by construction
        from clustering_spark.operators.multimodal import (
            image_dhash,
            make_png,
        )

        rng = np.random.default_rng(6)
        g = rng.integers(0, 256, (24, 33)).astype(np.uint8)
        png = make_png(33, 24, g.tobytes(), color_type=0)
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif(g))), (2, bytearray(png))],
            "id long, blob binary",
        )
        got = {r["id"]: r["dhash"] for r in image_dhash(df, "blob", "id").collect()}
        assert got[1] is not None
        assert got[1] == got[2]


def test_megapixel_decode_is_linear_time():
    """The LZW bit reader must be O(1) per code (streaming
    accumulator) — a whole-stream bigint shifted per code is quadratic
    and a 1.4 MB stream would take minutes, not sub-second. 5 s is a
    generous CI bound that still fails hard on quadratic behavior."""
    import time

    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (1000, 1000)).astype(np.uint8)
    b = encode_gif(g)
    t0 = time.time()
    w, h, ch, samples = decode_gif(b)
    assert time.time() - t0 < 5.0
    assert (_rgb(samples, w, h)[:, :, 0] == g).all()


def test_dhash_int64_exact_in_mixed_null_batches(spark):
    """A batch mixing undecodable rows (NULL hash) with decodable ones
    must not infer float64 for the hash column — an int64 whose set-bit
    span exceeds the 53-bit mantissa would silently lose low bits
    between pandas and Arrow (found live on a fam-5 gate GIF). Pin
    the exact int through the Spark stage."""
    from clustering_spark.operators.multimodal import (
        _decode_gray,
        _dhash64,
        image_dhash,
        synthetic_media_blob,
    )

    blob = synthetic_media_blob(95)  # fam 5 GIF, non-representable hash
    expect = _dhash64(_decode_gray(blob))
    assert float(expect) != expect  # the value MUST exercise the trap
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not an image")), (3, None)],
        "id long, blob binary",
    ).coalesce(1)  # one batch: int and None share a column
    got = {r["id"]: r["dhash"] for r in image_dhash(df, "blob", "id").collect()}
    assert got[1] == expect
    assert got[2] is None and got[3] is None


class TestAnimation:
    """gif_frames GCE compositing + the gif_frame_sample operator."""

    def test_frames_delays_and_pixels(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        fr = [np.full((10, 12), v, np.uint8) for v in (50, 120, 200)]
        b = encode_gif_animation(fr, delays_cs=[5, 10, 15])
        got = list(gif_frames(b))
        assert [(i, d) for i, d, _ in got] == [(0, 5), (1, 10), (2, 15)]
        for (_, _, rgb), f in zip(got, fr):
            assert (_rgb(rgb, 12, 10)[:, :, 0] == f).all()

    def test_transparency_preserves_canvas(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        f0 = np.full((10, 12), 50, np.uint8)
        f1 = np.full((10, 12), 7, np.uint8)  # 7 = transparent
        f1[:5] = 99
        b = encode_gif_animation([f0, f1], transparent_index=7)
        arr = _rgb(list(gif_frames(b))[1][2], 12, 10)
        assert (arr[:5, :, 0] == 99).all()
        assert (arr[5:, :, 0] == 50).all()  # frame 0 shows through

    def test_disposal_restore_background(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        f0 = np.full((8, 8), 200, np.uint8)
        f1 = np.full((8, 8), 7, np.uint8)  # fully transparent frame
        b = encode_gif_animation(
            [f0, f1], transparent_index=7, disposal=2
        )
        got = list(gif_frames(b))
        # frame 0 shows its pixels; after disposal-2 the canvas is
        # background, so the fully-transparent frame 1 shows bg (0)
        assert (_rgb(got[0][2], 8, 8)[:, :, 0] == 200).all()
        assert (_rgb(got[1][2], 8, 8)[:, :, 0] == 0).all()

    def test_truncated_animation_salvages_prefix(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        fr = [np.full((16, 16), 30 * i, np.uint8) for i in range(4)]
        b = encode_gif_animation(fr)
        got = list(gif_frames(b[: len(b) - 40]))
        assert 1 <= len(got) < 4

    def test_spark_frame_sample_composes_with_dhash(self, spark):
        from clustering_spark.operators.gif import encode_gif_animation
        from clustering_spark.operators.multimodal import (
            gif_frame_sample,
            image_dhash,
        )
        from pyspark.sql import functions as F

        y, x = np.mgrid[0:20, 0:24]
        fr = [((7 * x + 13 * y + 40 * i) % 256).astype(np.uint8)
              for i in range(5)]
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif_animation(fr))),
             (2, bytearray(b"not a gif")), (3, None)],
            "id long, blob binary",
        )
        out = gif_frame_sample(df, "blob", "id", every_n=2).toPandas()
        assert sorted(out.frame_idx) == [0, 2, 4]
        assert (out.width == 24).all() and (out.height == 20).all()
        # frames are standalone PNGs the image stages accept
        sampled = gif_frame_sample(df, "blob", "id").withColumn(
            "fid", F.col("frame_idx").cast("long")
        )
        hashed = image_dhash(sampled, "frame", "fid").toPandas()
        assert hashed.dhash.notna().all()

    def test_spark_frame_sample_cap(self, spark):
        from clustering_spark.operators.gif import encode_gif_animation
        from clustering_spark.operators.multimodal import gif_frame_sample

        fr = [np.full((8, 8), 20 * i, np.uint8) for i in range(6)]
        df = spark.createDataFrame(
            [(1, bytearray(encode_gif_animation(fr)))],
            "id long, blob binary",
        )
        out = gif_frame_sample(df, "blob", "id", max_frames=2).toPandas()
        assert sorted(out.frame_idx) == [0, 1]

    def test_subregion_frame_composites_at_offset_and_clips(self):
        """Frames smaller than the canvas composite at their left/top
        offset; a frame overflowing the canvas edge clips instead of
        crashing (the fixture encoder only emits full-canvas frames,
        so these paths need hand-built descriptors)."""
        import struct

        from clustering_spark.operators.gif import (
            _lzw_encode,
            encode_gif_animation,
            gif_frames,
        )

        base = encode_gif_animation([np.full((8, 8), 10, np.uint8)])

        def with_patch(left, top, w, h, val):
            body = bytearray(base[:-1])
            body += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
            lzw = _lzw_encode(np.full((h, w), val, np.uint8).tobytes(), 8)
            body.append(8)
            body.append(len(lzw))
            body += lzw
            body.append(0)
            body.append(0x3B)
            return bytes(body)

        arr = _rgb(list(gif_frames(with_patch(4, 5, 3, 2, 99)))[1][2], 8, 8)
        assert (arr[5:7, 4:7, 0] == 99).all()
        assert (arr[0:5, :, 0] == 10).all() and (arr[7, :, 0] == 10).all()
        # overflow at the edge: clipped
        arr = _rgb(list(gif_frames(with_patch(6, 6, 5, 2, 77)))[1][2], 8, 8)
        assert (arr[6:8, 6:8, 0] == 77).all()


class TestDisposal3Chains:
    """Round-13 review batch 34: disposal-3 (restore-previous) chains
    — each frame must composite onto the canvas as it was BEFORE the
    previous disposal-3 frame rendered, so a run of transparent-
    patch frames never accumulates."""

    def test_restore_previous_chain_does_not_accumulate(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        base = np.full((4, 4), 50, dtype=np.uint8)
        # three frames each painting a DIFFERENT cell with value 200,
        # transparent elsewhere (index 7), disposal 3
        f1 = np.full((4, 4), 7, dtype=np.uint8); f1[0, 0] = 200
        f2 = np.full((4, 4), 7, dtype=np.uint8); f2[1, 1] = 200
        f3 = np.full((4, 4), 7, dtype=np.uint8); f3[2, 2] = 200
        blob = encode_gif_animation(
            [base, f1, f2, f3], transparent_index=7, disposal=3
        )
        frames = {
            i: np.frombuffer(rgb, np.uint8).reshape(4, 4, 3)
            for i, _d, rgb in gif_frames(blob)
        }
        assert len(frames) == 4
        # frame 0 painted the base; its disposal-3 restore brings back
        # the EMPTY background canvas (index 0), so later frames show
        # exactly one painted cell on black — never base, never the
        # previous frame's cell
        for fi, cell in ((1, (0, 0)), (2, (1, 1)), (3, (2, 2))):
            got = frames[fi][..., 0]  # gray palette: R channel = index
            assert got[cell] == 200, (fi, cell)
            others = got.copy()
            others[cell] = 0
            assert (others == 0).all(), (fi, got)

    def test_offcanvas_frame_descriptor_is_harmless(self):
        from clustering_spark.operators.gif import (
            encode_gif_animation,
            gif_frames,
        )

        # hand-patch a frame's left/top beyond the canvas: compositing
        # must clip to nothing, not wrap or crash
        blob = bytearray(
            encode_gif_animation([np.zeros((4, 4), np.uint8)])
        )
        i = blob.find(b"\x2c")  # image descriptor
        blob[i + 1 : i + 5] = struct.pack("<HH", 100, 100)  # left, top
        out = list(gif_frames(bytes(blob)))
        assert len(out) == 1  # yielded, canvas untouched
        rgb = np.frombuffer(out[0][2], np.uint8)
        assert (rgb == 0).all()
