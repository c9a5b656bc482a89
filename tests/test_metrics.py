"""Metrics block vs numpy on small frames: entropy, cluster summaries
(centers/radius), d3 normalization, native vector expressions.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.functions.entropy import group_entropy
from clustering_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    squared_distance,
)
from clustering_spark.operators.metrics import cluster_summaries, d3_normalize


def test_entropy_matches_numpy(spark):
    # segment s: sizes 4, 3, 1 over labels
    rows = [("s", 0)] * 4 + [("s", 1)] * 3 + [("s", 2)] * 1 + [("t", 0)] * 5
    df = spark.createDataFrame(rows, "seg string, label int")
    out = group_entropy(df, ["seg"], "label").toPandas().set_index("seg").entropy
    p = np.array([4, 3, 1]) / 8
    assert abs(out["s"] - float(-(p * np.log2(p)).sum())) < 1e-9
    # single group -> 0 (with +0.0 sign normalization)
    assert out["t"] == 0.0


def test_cluster_summaries_center_radius(spark):
    pts = {
        0: np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 3.0]]),
        1: np.array([[10.0, 10.0], [12.0, 10.0]]),
    }
    rows = [
        ("s", c, float(x), float(y)) for c, arr in pts.items() for x, y in arr
    ]
    df = spark.createDataFrame(rows, "seg string, prediction int, fx double, fy double")
    out = (
        cluster_summaries(df, ["seg"], ["fx", "fy"])
        .toPandas()
        .set_index("prediction")
    )
    for c, arr in pts.items():
        ctr = arr.mean(axis=0)
        radius = np.sqrt(((arr - ctr) ** 2).sum(axis=1).max())
        assert abs(out.loc[c, "center_0"] - ctr[0]) < 1e-9
        assert abs(out.loc[c, "center_1"] - ctr[1]) < 1e-9
        assert abs(out.loc[c, "radius"] - radius) < 1e-9
        assert out.loc[c, "cluster_size"] == len(arr)


def test_d3_normalize_range_and_degenerate(spark):
    df = spark.createDataFrame([(r,) for r in (0.0, 5.0, 10.0)], "radius double")
    out = d3_normalize(df, "radius", "size", d3_max=50.0).toPandas()
    got = dict(zip(out.radius, out["size"]))
    assert got[0.0] == 1.0 and got[10.0] == 50.0
    assert abs(got[5.0] - 25.5) < 1e-9  # midpoint of [1, 50]
    # degenerate range -> 1.0 (scaleD3 parity, minus the reference's
    # elif bug — SURVEY appendix)
    dg = spark.createDataFrame([(3.0,), (3.0,)], "radius double")
    assert set(d3_normalize(dg, "radius", "size").toPandas()["size"]) == {1.0}


def test_vector_expressions_match_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        squared_distance("a", "b").alias("d2"),
        dot("a", "b").alias("dp"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    na, nb = np.array(a), np.array(b)
    assert abs(row.d2 - ((na - nb) ** 2).sum()) < 1e-12
    assert abs(row.dp - na @ nb) < 1e-12
    assert abs(row.na - np.linalg.norm(na)) < 1e-12
    assert abs(row.cos - na @ nb / np.linalg.norm(na) / np.linalg.norm(nb)) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_similarity("a", "b").alias("c")).collect()[0].c is None


def test_pairdist_moment_identity_vs_numpy(spark):
    """intra/inter mean pairwise squared distance (the one-pass moment
    form) must match numpy's literal O(n²) double loop."""
    import numpy as np

    from clustering_spark.operators.metrics import (
        inter_cluster_mean_pairdist,
        intra_cluster_mean_pairdist,
    )

    rng = np.random.RandomState(3)
    rows = []
    for g, n in [("a", 7), ("b", 4), ("c", 1)]:
        for _ in range(n):
            rows.append((g, float(rng.uniform(-5, 5)), float(rng.uniform(0, 10))))
    df = spark.createDataFrame(rows, "grp string, x double, y double")

    intra = {
        r.grp: (r.n_points, r.mean_pair_dist2)
        for r in intra_cluster_mean_pairdist(df, ["grp"], ["x", "y"]).collect()
    }
    pts = {}
    for g, x, y in rows:
        pts.setdefault(g, []).append((x, y))
    for g, p in pts.items():
        P = np.asarray(p)
        n = len(P)
        assert intra[g][0] == n
        if n < 2:
            assert intra[g][1] is None
        else:
            d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
            expect = d2.sum() / (n * (n - 1))
            assert abs(intra[g][1] - expect) < 1e-9 * max(1.0, abs(expect))

    inter = {
        (r.grp_a, r.grp_b): r.mean_pair_dist2
        for r in inter_cluster_mean_pairdist(df, ["grp"], ["x", "y"]).collect()
    }
    assert set(inter) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), got in inter.items():
        A, B = np.asarray(pts[ga]), np.asarray(pts[gb])
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        expect = d2.mean()
        assert abs(got - expect) < 1e-9 * max(1.0, abs(expect))


def test_cluster_summaries_preserves_null_segment(spark):
    # a NULL segment value is a real group: the null-safe joins must
    # keep it (name-based on=keys equi-joins silently dropped it)
    rows = [
        ("s", 0, 0.0, 0.0),
        ("s", 0, 2.0, 0.0),
        (None, 0, 5.0, 5.0),
        (None, 0, 7.0, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "seg string, prediction int, fx double, fy double"
    )
    out = cluster_summaries(df, ["seg"], ["fx", "fy"]).toPandas()
    assert len(out) == 2
    nul = out[out.seg.isna()]
    assert len(nul) == 1
    assert nul.cluster_size.iloc[0] == 2
    assert abs(nul.center_0.iloc[0] - 6.0) < 1e-9
    assert abs(nul.radius.iloc[0] - 1.0) < 1e-9
