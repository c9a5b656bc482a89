"""S10 PNG sink: distributed rasterization + stdlib PNG encode.
The binned raster (not the point set) is what reaches the driver, and
the written file must round-trip through the stdlib PNG decoder.
"""

from __future__ import annotations

import os

from clustering_spark.operators import multimodal as mm
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
