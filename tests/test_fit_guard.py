"""Watchdog coverage for MLlib fits (fit_guard) and the parity-mode
GaussianMixture hang fix: injected-hang termination, error relay,
all-seeds-timeout clarity, tight-blob conditioning, and the >=20
consecutive-fit stress the hang reproduced under.
"""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from clustering_spark.operators.clustering import SegmentedClusterer
from clustering_spark.operators.fit_guard import FitTimeout, guarded_fit

from tests.test_clustering_invariants import blobs_recovered, planted_blobs


class _HangingEstimator:
    """Fake estimator whose fit blocks until released — simulates the
    F2J LAPACK spin without burning a real MLlib job."""

    def __init__(self):
        self.release = threading.Event()
        self.started = threading.Event()

    def fit(self, df):
        self.started.set()
        self.release.wait()
        return "too-late"


class _FailingEstimator:
    def fit(self, df):
        raise ValueError("synthetic fit failure")


class _InstantEstimator:
    def fit(self, df):
        return ("model", df.count())


def _tiny_df(spark):
    return spark.createDataFrame([(1.0,), (2.0,)], "x double")


def test_guarded_fit_passes_through_model(spark):
    model = guarded_fit(_InstantEstimator(), _tiny_df(spark), timeout=60.0)
    assert model == ("model", 2)


def test_guarded_fit_relays_fit_exception(spark):
    with pytest.raises(ValueError, match="synthetic fit failure"):
        guarded_fit(_FailingEstimator(), _tiny_df(spark), timeout=60.0)


def test_guarded_fit_terminates_injected_hang(spark):
    est = _HangingEstimator()
    t0 = time.monotonic()
    with pytest.raises(FitTimeout, match="cancelled"):
        guarded_fit(est, _tiny_df(spark), timeout=1.0, desc="injected hang")
    # terminated at the driver well before any "wait it out" horizon;
    # generous bound to keep CI-noise immunity (1s timeout + grace)
    assert time.monotonic() - t0 < 30.0
    assert est.started.is_set()
    est.release.set()  # unblock the daemon thread for hygiene


def test_guarded_fit_real_mllib_fit(spark):
    """A real MLlib KMeans through the guard returns a usable model —
    the guard is a watchdog, not a semantic layer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    X, _ = planted_blobs(k=2, n_per=20)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in X], "fx double, fy double"
    )
    vec = VectorAssembler(inputCols=["fx", "fy"], outputCol="feat").transform(df)
    model = guarded_fit(
        KMeans(featuresCol="feat", k=2, seed=7), vec, timeout=120.0
    )
    assert len(model.clusterCenters()) == 2


def test_parity_all_seeds_timeout_is_clear_error(spark, monkeypatch):
    """When EVERY seed hits the watchdog the parity loop must raise a
    clear, terminating error — never hang, never unpack None."""
    import clustering_spark.operators.fit_guard as fg

    def always_timeout(est, df, timeout=0.0, desc=""):
        raise FitTimeout(f"injected: {desc}")

    monkeypatch.setattr(fg, "guarded_fit", always_timeout)
    df = spark.createDataFrame(
        [("a", float(i), float(i % 3)) for i in range(12)],
        "seg string, fx double, fy double",
    )
    clusterer = SegmentedClusterer(
        segment_cols=["seg"], feature_cols=["fx", "fy"],
        default_k=2, seeds=(1, 2, 3), mode="parity",
    )
    with pytest.raises(RuntimeError, match="timed out for all 3 seed"):
        clusterer.fit_predict(df)


def _tight_blob_df(spark, sigma=0.1, n_per=50, seed=13):
    """The hazardous regime from the round-7 live hang: tight
    (sigma~0.1) well-separated blobs whose near-singular covariances
    used to send F2J Dsyev into the NaN spin."""
    X, truth = planted_blobs(k=3, n_per=n_per, spread=sigma, seed=seed)
    rows = [
        ("s", float(x), float(y), int(t)) for (x, y), t in zip(X, truth)
    ]
    return (
        spark.createDataFrame(rows, "seg string, fx double, fy double, truth int"),
        truth,
    )


def test_parity_gmm_tight_blobs_recovers(spark):
    """Standardized parity GMM on the hazardous sigma=0.1 blobs: fits
    without hanging and still recovers the planted structure on the
    ORIGINAL feature scale (predictions permute the truth labels)."""
    df, truth = _tight_blob_df(spark)
    # several seeds: GMM EM can merge two blobs from a bad init (a
    # local optimum, not a bug); best-of-seeds silhouette picks the
    # separated fit like the reference's seed search does
    clusterer = SegmentedClusterer(
        segment_cols=["seg"], feature_cols=["fx", "fy"],
        algorithm="GaussianMixture", default_k=3, seeds=(42, 1, 2, 3, 4),
        mode="parity", fit_timeout=120.0,
    )
    pdf = clusterer.fit_predict(df).toPandas().sort_values("truth", kind="stable")
    assert blobs_recovered(
        pdf.prediction.to_numpy(),
        pdf.truth.to_numpy(),
        3,
    )
    # helper columns never leak into the output contract
    assert not [c for c in pdf.columns if c.startswith("__")]
    # silhouette/wssse computed on original features: finite + sane
    assert -1.0 <= pdf.silhouette.iloc[0] <= 1.0
    assert np.isfinite(pdf.wssse.iloc[0]) and pdf.wssse.iloc[0] >= 0.0


def test_parity_gmm_stress_20_consecutive_fits(spark):
    """>=20 consecutive parity-mode MLlib GaussianMixture fits in the
    historically hazardous regime, each under the watchdog. Before the
    standardization fix this loop had a per-fit probability of hanging
    forever; now it must simply finish. 20 seeds on one segment with no
    cached-silhouette early-stop = 20 consecutive est.fit calls."""
    df, _ = _tight_blob_df(spark, n_per=40, seed=29)
    clusterer = SegmentedClusterer(
        segment_cols=["seg"], feature_cols=["fx", "fy"],
        algorithm="GaussianMixture", default_k=3,
        seeds=tuple(range(1, 21)),  # 20 fits, no early-stop configured
        mode="parity", fit_timeout=120.0,
    )
    pdf = clusterer.fit_predict(df).toPandas()
    assert len(pdf) == 120
    assert pdf.prediction.nunique() <= 3


def test_no_bare_mllib_fit_outside_guard():
    """Source pin: every MLlib ``.fit(`` in the package goes through
    fit_guard. The only unguarded fits allowed are the numpy-based
    IVFIndex (no JVM job to watchdog) and fit_guard itself."""
    import pathlib

    import clustering_spark

    pkg = pathlib.Path(clustering_spark.__file__).parent
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name == "fit_guard.py":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".fit(" in line and "IVFIndex" not in line:
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, f"unguarded .fit( call sites: {offenders}"
