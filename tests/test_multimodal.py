"""Multimodal binary-column plumbing: metadata without decode,
Arrow-batched fake-format decode, data-dependent frame fan-out, and
the explicit stub behavior on unknown formats.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import multimodal as mm


@pytest.fixture
def images(spark):
    rows = [
        (1, mm.make_fake_image(4, 3, fill=10)),
        (2, mm.make_fake_image(8, 2, fill=200)),
        (3, mm.make_fake_image(2, 2, fill=0)),
    ]
    return spark.createDataFrame(rows, "id long, img binary")


def test_media_metadata_native(spark, images):
    out = mm.media_metadata(images, "img", "id").toPandas().set_index("id")
    assert out.loc[1, "n_bytes"] == 8 + 12
    expect = hashlib.sha256(mm.make_fake_image(4, 3, 10)).hexdigest()
    assert out.loc[1, "content_sha256"] == expect


def test_decode_image_meta(spark, images):
    out = mm.decode_image_meta(images, "img", "id").toPandas().set_index("id")
    assert (out.loc[1, "width"], out.loc[1, "height"]) == (4, 3)
    assert out.loc[1, "n_pixels"] == 12
    assert out.loc[1, "mean_intensity"] == 10.0
    assert out.loc[2, "mean_intensity"] == 200.0


def test_decode_unknown_format_is_explicit_stub(spark):
    df = spark.createDataFrame([(1, b"\x89PNG massively real")], "id long, img binary")
    with pytest.raises(Exception) as exc:
        mm.decode_image_meta(df, "img", "id").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_frame_sampling(spark):
    video = b"".join(mm.make_fake_image(2, 2, fill=i * 10) for i in range(6))
    df = spark.createDataFrame([(7, video)], "id long, vid binary")
    frames = mm.sample_frames(df, "vid", "id", every_n=2).toPandas()
    assert list(frames.frame_idx) == [0, 2, 4]
    # each sampled frame is itself a valid decodable container
    sampled = spark.createDataFrame(
        [(int(r.frame_idx), bytes(r.frame)) for r in frames.itertuples()],
        "id long, img binary",
    )
    meta = mm.decode_image_meta(sampled, "img", "id").toPandas()
    assert set(meta.mean_intensity) == {0.0, 20.0, 40.0}
