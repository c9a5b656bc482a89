"""MJPEG-in-AVI frame decode: the one video codec family that is
honestly stdlib+numpy-decodable, composed from the existing AVI RIFF
walk and the repo's own baseline JPEG codec (operators/jpeg.py).
Fixtures are built by make_avi_mjpeg from arrays through
encode_baseline — real JPEG bytes in a spec-shaped container, no
binary assets.
"""

import numpy as np
import pytest

from clustering_spark.operators.multimodal import (
    avi_frame_sample,
    avi_video_frames,
    make_avi_mjpeg,
)


def _gradient_frame(h, w, base):
    # smooth gradients survive JPEG quantization with small error
    y, x = np.mgrid[0:h, 0:w]
    return ((base + x + 2 * y) % 200 + 20).astype(np.uint8)


class TestFrameWalk:
    def test_yields_frames_in_order(self):
        frames = [_gradient_frame(32, 48, 10 * i) for i in range(5)]
        b = make_avi_mjpeg(frames)
        got = list(avi_video_frames(b))
        assert [i for i, _ in got] == [0, 1, 2, 3, 4]
        for _, payload in got:
            assert payload[:2] == b"\xff\xd8"  # each chunk is a JPEG

    def test_rec_list_interleave_layout(self):
        frames = [_gradient_frame(16, 16, 7 * i) for i in range(3)]
        b = make_avi_mjpeg(frames, in_rec_lists=True)
        assert len(list(avi_video_frames(b))) == 3

    def test_not_avi_raises(self):
        with pytest.raises(ValueError, match="not a RIFF/AVI"):
            list(avi_video_frames(b"RIFF\x00\x00\x00\x00WAVE"))

    def test_truncated_movi_salvages_prefix(self):
        frames = [_gradient_frame(16, 16, i) for i in range(4)]
        b = make_avi_mjpeg(frames)
        cut = b[: len(b) - 40]  # chop into the last frame
        got = list(avi_video_frames(cut))
        assert 1 <= len(got) < 4  # earlier frames survive the cut

    def test_header_only_avi_has_no_frames(self):
        from clustering_spark.operators.multimodal import make_avi

        assert list(avi_video_frames(make_avi())) == []

    def test_avi_meta_still_reads_the_mjpeg_fixture(self):
        from clustering_spark.operators.multimodal import _avi_meta

        frames = [_gradient_frame(24, 40, i) for i in range(6)]
        n_streams, w, h, dur = _avi_meta(make_avi_mjpeg(frames, fps=25.0))
        assert (n_streams, w, h) == (1, 40, 24)
        assert abs(dur - 6 / 25.0) < 1e-6


class TestSparkFrameSample:
    def test_decode_every_frame_with_luma(self, spark):
        frames = [
            np.full((24, 32), 40, np.uint8),
            np.full((24, 32), 120, np.uint8),
            np.full((24, 32), 200, np.uint8),
        ]
        df = spark.createDataFrame(
            [(1, bytearray(make_avi_mjpeg(frames))),
             (2, bytearray(b"not a video")),
             (3, None)],
            "id long, blob binary",
        )
        out = avi_frame_sample(df, "blob", "id").toPandas()
        assert set(out.id) == {1}  # non-AVI and NULL yield no rows
        out = out.sort_values("frame_idx")
        assert list(out.frame_idx) == [0, 1, 2]
        assert (out.width == 32).all() and (out.height == 24).all()
        # flat frames decode to their gray level within JPEG tolerance
        assert np.allclose(out.mean_luma, [40, 120, 200], atol=3.0)
        # emitted frame bytes are standalone JPEGs the image stages accept
        from clustering_spark.operators.jpeg import decode_baseline

        w, h, ch, _ = decode_baseline(bytes(out.frame.iloc[0]))
        assert (w, h) == (32, 24)

    def test_every_n_and_cap(self, spark):
        frames = [_gradient_frame(16, 16, 5 * i) for i in range(10)]
        df = spark.createDataFrame(
            [(1, bytearray(make_avi_mjpeg(frames)))], "id long, blob binary"
        )
        out = avi_frame_sample(df, "blob", "id", every_n=3).toPandas()
        assert sorted(out.frame_idx) == [0, 3, 6, 9]
        capped = avi_frame_sample(
            df, "blob", "id", every_n=3, max_frames=2
        ).toPandas()
        assert sorted(capped.frame_idx) == [0, 3]

    def test_undecodable_frame_degrades_to_null_row(self, spark):
        frames = [_gradient_frame(16, 16, 0)]
        b = bytearray(make_avi_mjpeg(frames))
        # corrupt the JPEG payload inside the 00dc chunk (kill the SOI)
        at = bytes(b).find(b"\xff\xd8", 100)
        b[at] = 0x00
        df = spark.createDataFrame([(1, b)], "id long, blob binary")
        out = avi_frame_sample(df, "blob", "id").toPandas()
        assert len(out) == 1
        assert out.width.isna().all() and out.mean_luma.isna().all()
        assert out.frame.iloc[0] is not None  # payload preserved

    def test_rgb_frames(self, spark):
        rgb = np.zeros((16, 24, 3), np.uint8)
        rgb[:, :, 0] = 200  # red-ish
        df = spark.createDataFrame(
            [(1, bytearray(make_avi_mjpeg([rgb])))], "id long, blob binary"
        )
        out = avi_frame_sample(df, "blob", "id").toPandas()
        assert len(out) == 1
        # BT.601 luma of (200, 0, 0) is ~60
        assert abs(out.mean_luma.iloc[0] - 0.299 * 200) < 5.0

    def test_frames_compose_with_image_dhash(self, spark):
        from clustering_spark.operators.multimodal import image_dhash

        frames = [_gradient_frame(32, 48, 0), _gradient_frame(32, 48, 90)]
        df = spark.createDataFrame(
            [(1, bytearray(make_avi_mjpeg(frames)))], "id long, blob binary"
        )
        from pyspark.sql import functions as F

        sampled = avi_frame_sample(df, "blob", "id").withColumn(
            "fid", F.col("frame_idx").cast("long")
        )
        hashed = image_dhash(sampled, "frame", "fid").toPandas()
        assert hashed.dhash.notna().all()


def test_deeply_nested_rec_lists_no_recursion_error():
    """A crafted AVI nesting thousands of LIST 'rec ' levels is
    untrusted-input DoS against a recursive walker — the iterative
    walk must still find the frame."""
    import struct

    inner = b"00dc" + struct.pack("<I", 4) + b"test"
    for _ in range(5000):
        body = b"rec " + inner
        inner = b"LIST" + struct.pack("<I", len(body)) + body
    avi = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert list(avi_video_frames(avi)) == [(0, b"test")]


def test_frames_after_nested_rec_list_keep_file_order():
    """Frames inside a rec group and frames after it must come out in
    file order with consecutive indices."""
    import struct

    def dc(payload):
        return b"00dc" + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    rec_body = b"rec " + dc(b"one")
    movi_body = (
        b"movi"
        + dc(b"zero")
        + b"LIST" + struct.pack("<I", len(rec_body)) + rec_body
        + dc(b"two")
    )
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    avi = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    assert list(avi_video_frames(avi)) == [
        (0, b"zero"), (1, b"one"), (2, b"two")
    ]
