"""M6 wiring: the thresholded seed search early-stops at the cached
quality bar inside the per-segment fit, and still finds a good model
when the bar is unreachable.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.clustering import (
    SegmentedClusterer,
    kmeans_fit,
    squared_euclidean_silhouette,
    thresholded_best_of_seeds,
)


def _ambiguous_data():
    """Data where different seeds land on measurably different local
    optima (4 close blobs, k=3)."""
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0], [3, 0], [0, 3], [3, 3]], dtype=float)
    return np.vstack([c + rng.randn(25, 2) * 0.6 for c in centers])


def _two_divergent_seeds():
    X = _ambiguous_data()
    sils = {}
    for seed in range(30):
        labels, _, _ = kmeans_fit(X, 3, seed)
        sils[seed] = round(squared_euclidean_silhouette(X, labels), 9)
    distinct = {}
    for seed, s in sils.items():
        distinct.setdefault(s, seed)
    vals = sorted(distinct)
    assert len(vals) >= 2, "fixture failed to produce divergent seeds"
    worse, better = distinct[vals[0]], distinct[vals[-1]]
    return X, worse, better, vals[0], vals[-1]


def test_thresholded_stops_at_bar():
    X, worse, better, worse_sil, better_sil = _two_divergent_seeds()
    # bar below the worse seed's quality: stops after seed #1
    got = thresholded_best_of_seeds(
        X, 3, "KMeans", (worse, better), old_silhouette=-1.0
    )
    assert abs(got[2] - worse_sil) < 1e-9
    # unreachable bar: exhausts both seeds, returns the best
    got2 = thresholded_best_of_seeds(
        X, 3, "KMeans", (worse, better), old_silhouette=2.0
    )
    assert abs(got2[2] - better_sil) < 1e-9


def test_clusterer_uses_threshold_when_old_sil_present(spark):
    X, worse, better, worse_sil, better_sil = _two_divergent_seeds()
    rows = [("s", float(a), float(b)) for a, b in X]
    df = spark.createDataFrame(rows, "seg string, fx double, fy double")
    kw = dict(
        segment_cols=["seg"],
        feature_cols=["fx", "fy"],
        default_k=3,
        seeds=(worse, better),
    )
    # trivially-satisfied bar -> early stop -> the worse seed's model
    low_bar = df.withColumn("__old", F.lit(-1.0))
    got = (
        SegmentedClusterer(old_sil_col="__old", **kw)
        .fit_summarize(low_bar.select("seg", "fx", "fy", "__old"))
        .toPandas()
    )
    assert abs(got.silhouette.iloc[0] - worse_sil) < 1e-9
    # no bar column -> full best-of-seeds
    got2 = SegmentedClusterer(**kw).fit_summarize(df).toPandas()
    assert abs(got2.silhouette.iloc[0] - better_sil) < 1e-9
