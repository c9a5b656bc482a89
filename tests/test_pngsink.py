"""S10 PNG sink: distributed rasterization + stdlib PNG encode.
The binned raster (not the point set) is what reaches the driver, and
the written file must round-trip through the stdlib PNG decoder.
"""

from __future__ import annotations

import os

from clustering_spark.operators import multimodal as mm
from clustering_spark.operators import pngsink
from clustering_spark.operators.pngsink import scatter_bins, write_cluster_pngs


def _clustered_df(spark):
    # two segments; seg 'a' has two tight blobs (clusters 0 and 1) at
    # opposite corners, seg 'b' one blob
    rows = []
    for i in range(50):
        rows.append(("m", "a", 0.0 + (i % 5) * 0.01, 0.0 + (i % 7) * 0.01, 0))
        rows.append(("m", "a", 10.0 - (i % 5) * 0.01, 10.0 - (i % 7) * 0.01, 1))
        rows.append(("m", "b", 5.0, 5.0 + (i % 3) * 0.01, 0))
    return spark.createDataFrame(
        rows, "macro string, micro string, x double, y double, prediction int"
    )


def test_scatter_bins_bounded_and_cornered(spark):
    df = _clustered_df(spark)
    binned = scatter_bins(
        df, ["macro", "micro"], "x", "y", "prediction", width=16, height=16
    ).toPandas()
    a = binned[binned.micro == "a"]
    # bounded: never more rows than pixels
    assert len(a) <= 16 * 16
    # cluster 0 sits in the low-x/low-y corner bins, cluster 1 high
    c0, c1 = a[a.cluster == 0], a[a.cluster == 1]
    assert (c0.px <= 1).all() and (c0.py <= 1).all()
    assert (c1.px >= 14).all() and (c1.py >= 14).all()
    # counts preserved: every input point lands in exactly one pixel
    assert a.n.sum() == 100


def test_write_pngs_roundtrip(spark, tmp_path):
    df = _clustered_df(spark)
    binned = scatter_bins(
        df, ["macro", "micro"], "x", "y", "prediction", width=16, height=16
    )
    paths = write_cluster_pngs(
        binned, ["macro", "micro"], str(tmp_path), width=16, height=16
    )
    assert sorted(os.path.basename(p) for p in paths) == ["a.png", "b.png"]
    # reference layout: {out}/{macro}/{micro}.png
    assert paths[0].startswith(os.path.join(str(tmp_path), "m"))
    w, h, ch, samples = mm._png_decode(open(paths[0], "rb").read())
    assert (w, h, ch) == (16, 16, 1)
    shades = sorted(set(samples) - {0})
    # two clusters -> two distinct non-background intensities
    assert len(shades) == 2
    # y grows UPWARD: cluster 0 (low y) must appear in the BOTTOM rows
    bottom = samples[15 * 16 :]
    assert min(shades) in bottom


def test_degenerate_range_single_bin(spark, tmp_path):
    df = spark.createDataFrame(
        [("s", 1.0, 2.0, 0)] * 5, "seg string, x double, y double, prediction int"
    )
    binned = scatter_bins(
        df, ["seg"], "x", "y", "prediction", width=8, height=8
    ).toPandas()
    assert len(binned) == 1
    assert (binned.px[0], binned.py[0], binned.n[0]) == (0, 0, 5)


def test_null_coordinate_rows_do_not_stretch_range(spark):
    # a dropped (NULL-y) row must not stretch the binning range: with
    # stats computed pre-filter, one x=1e9 outlier collapsed every real
    # point into pixel column 0
    rows = [("a", float(x), float(x), 0) for x in range(10)]
    rows.append(("a", 1e9, None, 0))
    df = spark.createDataFrame(rows, "seg string, x double, y double, cl int")
    out = scatter_bins(df, ["seg"], "x", "y", "cl", width=8, height=8).collect()
    assert max(r.px for r in out) == 7  # real points span the raster
    assert len({r.px for r in out}) > 1


def test_null_keyed_segment_gets_png_with_null_clusters(spark, tmp_path):
    # the NULL-keyed segment must survive the stats join (eqNullSafe)
    # and render despite NULL cluster labels (NaN-keyed shade lookup)
    rows = [(None, float(i % 4), float(i % 4), None) for i in range(20)]
    rows += [("s", float(i % 4), float(i % 4), 1) for i in range(20)]
    df = spark.createDataFrame(rows, "seg string, x double, y double, cl int")
    binned = scatter_bins(df, ["seg"], "x", "y", "cl", width=4, height=4)
    paths = write_cluster_pngs(binned, ["seg"], str(tmp_path), width=4, height=4)
    names = sorted(os.path.basename(p) for p in paths)
    assert names == ["None.png", "s.png"]
    for p in paths:
        w, h, _, _ = mm._png_decode(open(p, "rb").read())
        assert (w, h) == (4, 4)


def test_raster_size_mismatch_fails_fast(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [("a", float(i), float(i), 0) for i in range(10)],
        "seg string, x double, y double, cl int",
    )
    binned = scatter_bins(df, ["seg"], "x", "y", "cl", width=64, height=64)
    with pytest.raises(ValueError, match="raster"):
        write_cluster_pngs(binned, ["seg"], str(tmp_path), width=8, height=8)


def test_distinct_segments_cannot_collide_after_sanitization(spark, tmp_path):
    """'a/b' and 'a_b' sanitize to the same base name; the digest
    suffix must keep their PNGs distinct instead of silently
    overwriting (review batch 25)."""
    rows = [(s, float(i), float(i), 0) for s in ("a/b", "a_b") for i in range(3)]
    df = spark.createDataFrame(rows, "seg string, x double, y double, cl int")
    bins = pngsink.scatter_bins(df, ["seg"], "x", "y", "cl", width=4, height=4)
    paths = pngsink.write_cluster_pngs(
        bins, ["seg"], str(tmp_path), width=4, height=4
    )
    assert len(paths) == len(set(paths)) == 2
    # clean values keep their plain name (no digest noise)
    assert pngsink._safe_component("BUILDING") == "BUILDING"
    assert pngsink._safe_component("a/b") != pngsink._safe_component("a_b")


def test_object_dtype_null_cluster_labels_render(spark, tmp_path):
    """String cluster labels with NULLs are object dtype in pandas —
    sorted(unique()) raised TypeError before the batch-25 fix; the
    render must place NULL-cluster pixels at their own shade."""
    rows = [
        ("s", 0.0, 0.0, "k0"),
        ("s", 1.0, 1.0, None),
        ("s", 2.0, 2.0, "k1"),
    ]
    df = spark.createDataFrame(rows, "seg string, x double, y double, cl string")
    bins = pngsink.scatter_bins(df, ["seg"], "x", "y", "cl", width=4, height=4)
    paths = pngsink.write_cluster_pngs(
        bins, ["seg"], str(tmp_path), width=4, height=4
    )
    assert len(paths) == 1
    from clustering_spark.operators.multimodal import _png_decode

    w, h, ch, samples = _png_decode(open(paths[0], "rb").read())
    assert (w, h, ch) == (4, 4, 1)
    assert len({v for v in samples if v != 0}) == 3  # three shades
