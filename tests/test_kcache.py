"""k-cache scenario tests (SURVEY J4/S6/S9/M10; reference
cluster.py:95-136): miss -> tune -> hit -> regression -> re-tune,
plus latest-wins read semantics.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clustering_spark.config import PipelineConfig
from clustering_spark.operators.kcache import KCache, cluster_with_cache
from tests.test_clustering_invariants import planted_blobs


@pytest.fixture
def seg_df(spark):
    # planted k in (3, 4): away from start_k — the reference's elbow
    # rule gives the chord ENDPOINTS zero distance, so a planted
    # k == start_k legitimately loses to a within-threshold runner-up
    # (reference-faithful; see choose_k)
    rows = []
    for macro, micro, k_true in (("m1", "u1", 3), ("m1", "u2", 3), ("m2", "u1", 4)):
        X, _ = planted_blobs(k=k_true, n_per=25)
        rows += [(macro, micro, float(x), float(y)) for x, y in X]
    return spark.createDataFrame(
        rows, "macro string, micro string, x double, y double"
    )


CFG = PipelineConfig(dont_scale=[], stop_k=6)
ARGS = dict(
    macro_col="macro",
    micro_col="micro",
    x_col="x",
    y_col="y",
    algorithm="KMeans",
    config=CFG,
)


def test_latest_wins_read(spark, tmp_path):
    cache = KCache(str(tmp_path / "kc"))
    entry = spark.createDataFrame(
        [("KMeans", "m", "u", "x", "y", "a", "b")],
        "algorithm string, macro_col string, micro_col string, "
        "x_col string, y_col string, macro_id string, micro_id string",
    )
    cache.append(entry.withColumn("k", F.lit(3)).withColumn("silhouette", F.lit(0.5)), version=1)
    cache.append(entry.withColumn("k", F.lit(5)).withColumn("silhouette", F.lit(0.7)), version=2)
    got = cache.lookup(spark, "KMeans", "m", "u", "x", "y").collect()
    assert len(got) == 1
    assert got[0].k == 5 and got[0].silhouette == 0.7
    # other grid cells don't leak in
    assert cache.lookup(spark, "KMeans", "m", "u", "y", "x").count() == 0


def test_empty_cache_reads(spark, tmp_path):
    cache = KCache(str(tmp_path / "nope"))
    assert cache.read_latest(spark).count() == 0
    assert cache.lookup(spark, "KMeans", "m", "u", "x", "y").count() == 0
    assert cache.version_conflicts(spark).count() == 0


def test_version_conflict_detection(spark, tmp_path):
    """Two writers appending the SAME version for one key (the case the
    single-writer contract forbids) must be visible to the detector;
    distinct versions must not trip it."""
    cache = KCache(str(tmp_path / "kc"))
    entry = spark.createDataFrame(
        [("KMeans", "m", "u", "x", "y", "a", "b")],
        "algorithm string, macro_col string, micro_col string, "
        "x_col string, y_col string, macro_id string, micro_id string",
    )
    e = entry.withColumn("k", F.lit(3)).withColumn("silhouette", F.lit(0.5))
    cache.append(e, version=1)
    cache.append(e.withColumn("k", F.lit(5)), version=2)
    assert cache.version_conflicts(spark).count() == 0  # distinct versions
    cache.append(e.withColumn("k", F.lit(7)), version=2)  # concurrent writer
    bad = cache.version_conflicts(spark).collect()
    assert len(bad) == 1
    assert bad[0].version == 2 and bad[0].n_writers == 2


def test_miss_tune_hit_flow(spark, tmp_path, seg_df):
    cache = KCache(str(tmp_path / "kc"))
    res1, s1 = cluster_with_cache(seg_df, cache=cache, version=1, **ARGS)
    assert s1["misses"] == 3  # all segments tuned on first run
    r1 = res1.toPandas()
    # tuned k recovered per planted segment
    ks = r1.groupby(["macro", "micro"]).cluster_name.nunique().to_dict()
    assert ks == {("m1", "u1"): 3, ("m1", "u2"): 3, ("m2", "u1"): 4}

    res2, s2 = cluster_with_cache(seg_df, cache=cache, version=2, **ARGS)
    assert s2["misses"] == 0 and s2["regressed"] == 0  # warm cache
    assert res2.count() == res1.count()


def test_regression_triggers_retune(spark, tmp_path, seg_df):
    cache = KCache(str(tmp_path / "kc"))
    # poison the cache: claim segment (m1, u2) clusters perfectly with
    # k=2 at silhouette 0.99 — fresh k=2 on 3 blobs scores well below
    # 0.99 * 0.8, tripping the regression gate
    poison = spark.createDataFrame(
        [("KMeans", "macro", "micro", "x", "y", "m1", "u2", 2, 0.99)],
        "algorithm string, macro_col string, micro_col string, x_col string, "
        "y_col string, macro_id string, micro_id string, k int, silhouette double",
    )
    cache.append(poison, version=1)
    res, stats = cluster_with_cache(seg_df, cache=cache, version=2, **ARGS)
    assert stats["misses"] == 2  # the two unpoisoned segments
    assert stats["regressed"] == 1
    pdf = res.toPandas()
    # after re-tune the poisoned segment recovers its true k=3
    k_u2 = pdf[(pdf.macro == "m1") & (pdf.micro == "u2")].cluster_name.nunique()
    assert k_u2 == 3
    # and the cache now holds the corrected entry at the newer version
    fixed = (
        cache.lookup(spark, "KMeans", "macro", "micro", "x", "y")
        .filter((F.col("macro_id") == "m1") & (F.col("micro_id") == "u2"))
        .collect()[0]
    )
    assert fixed.k == 3


def test_cache_read_errors_distinguish_missing_from_broken(spark, tmp_path):
    """Missing cache path -> empty frame; a PRESENT but unreadable
    cache must RAISE (silently re-tuning the grid with default_k is
    the failure mode the ledger test already pins for ingest)."""
    from clustering_spark.operators.kcache import KCache

    missing = KCache(str(tmp_path / "nope"))
    assert missing.read_latest(spark).count() == 0
    assert missing.version_conflicts(spark).count() == 0
    # version_conflicts carries its full schema even before first run
    assert "n_writers" in missing.version_conflicts(spark).columns

    broken_dir = tmp_path / "broken"
    broken_dir.mkdir()
    (broken_dir / "part-0.parquet").write_bytes(b"not a parquet file")
    broken = KCache(str(broken_dir))
    import pytest as _pt

    with _pt.raises(Exception):
        broken.read_latest(spark).count()


def test_null_keyed_segment_is_tuned_and_cached(spark, tmp_path):
    # a NULL macro value is a real group: it must be tuned on run 1
    # (not just counted as a miss) and be a cache HIT on run 2 — the
    # old on=segment_cols semi join null-rejected exactly those rows,
    # re-detecting the miss forever while never caching anything
    rows = []
    for macro, k_true in ((None, 3), ("m1", 4)):
        X, _ = planted_blobs(k=k_true, n_per=25)
        rows += [(macro, "u1", float(x), float(y)) for x, y in X]
    df = spark.createDataFrame(
        rows, "macro string, micro string, x double, y double"
    )
    cache = KCache(str(tmp_path / "kc"))
    res1, s1 = cluster_with_cache(df, cache=cache, version=1, **ARGS)
    assert s1["misses"] == 2
    # the NULL segment really got cached (macro_id NULL row present)
    cached = cache.lookup(spark, "KMeans", "macro", "micro", "x", "y").collect()
    assert any(r.macro_id is None for r in cached)
    # and clustered: its rows appear in the output with a tuned k
    p1 = res1.toPandas()
    assert p1[p1.macro.isna()].cluster_name.nunique() == 3
    res2, s2 = cluster_with_cache(df, cache=cache, version=2, **ARGS)
    assert s2["misses"] == 0 and s2["regressed"] == 0


def test_null_keyed_regression_is_respliced(spark, tmp_path):
    # poison the NULL-keyed segment's cache entry: the re-tune must
    # actually replace its stale summary rows, not just count it
    rows = []
    X, _ = planted_blobs(k=3, n_per=25)
    rows += [(None, "u1", float(x), float(y)) for x, y in X]
    df = spark.createDataFrame(
        rows, "macro string, micro string, x double, y double"
    )
    cache = KCache(str(tmp_path / "kc"))
    poison = spark.createDataFrame(
        [("KMeans", "macro", "micro", "x", "y", None, "u1", 2, 0.99)],
        "algorithm string, macro_col string, micro_col string, x_col string, "
        "y_col string, macro_id string, micro_id string, k int, silhouette double",
    )
    cache.append(poison, version=1)
    res, stats = cluster_with_cache(df, cache=cache, version=2, **ARGS)
    assert stats["misses"] == 0
    assert stats["regressed"] == 1
    pdf = res.toPandas()
    assert pdf.cluster_name.nunique() == 3  # re-tuned, stale k=2 rows gone
    fixed = cache.lookup(spark, "KMeans", "macro", "micro", "x", "y").collect()
    assert any(r.macro_id is None and r.k == 3 for r in fixed)


def test_parity_mode_config_rejected(spark, tmp_path, seg_df):
    # silently fitting scale-mode numerics under a parity config would
    # corrupt parity comparisons with no error
    cfg = PipelineConfig(dont_scale=[], stop_k=6, fit_mode="parity")
    with pytest.raises(ValueError, match="fit_mode"):
        cluster_with_cache(
            seg_df,
            macro_col="macro",
            micro_col="micro",
            x_col="x",
            y_col="y",
            algorithm="KMeans",
            config=cfg,
            cache=KCache(str(tmp_path / "kc")),
            version=1,
        )
