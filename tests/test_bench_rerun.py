"""Pin bench.py's steal-rerun guard (round-17, additions-only contract):

* a query whose warm-run spread exceeds STEAL_RATIO is re-run and both
  readings land in the artifact;
* first-pass fields (`queries`, `queries_warm`, `warm_total`) keep
  their original semantics — the rerun never overwrites them;
* `warm_total_steal_resolved` takes min(first pass, rerun) per suspect
  and is never above `warm_total`;
* a clean run emits the new fields as EMPTY maps (keys always present
  so the driver's tail parse sees a stable schema).
"""

from __future__ import annotations

import contextlib
import io
import json

import pytest


@pytest.fixture(scope="module")
def bench_mod(spark):  # noqa: ARG001 — session must exist for getOrCreate
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench


def _run(bench, monkeypatch, ratio, headline, gate):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "3")
    monkeypatch.setenv("SPARK_GRAFT_GATE_RUNS", "3")
    monkeypatch.setattr(bench, "STEAL_RATIO", ratio)
    monkeypatch.setattr(bench, "HEADLINE", headline)
    monkeypatch.setattr(bench, "GATE_QUERIES", gate)
    monkeypatch.setattr(bench, "RUNS", 3)
    monkeypatch.setattr(bench, "GATE_RUNS", 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    full, compact = (json.loads(l) for l in buf.getvalue().strip().splitlines())
    return full, compact


def test_forced_rerun_records_both_readings(bench_mod, monkeypatch):
    # ratio ~1 flags every query: the rerun path must fire for all
    full, compact = _run(
        bench_mod, monkeypatch, 1.0000001,
        ["pricing_summary"], ["warc_crawl"],
    )
    assert full["steal_suspect"] == ["pricing_summary"]
    assert set(full["steal_rerun_warm"]) == {"pricing_summary"}
    assert set(full["steal_rerun_spread"]) == {"pricing_summary"}
    assert full["gate_steal_suspect"] == ["warc_crawl"]
    assert set(full["gate_steal_rerun_warm"]) == {"warc_crawl"}
    # first-pass fields untouched by the rerun: warm_total is the sum
    # of the first-pass warm medians, resolved is never above it
    assert full["warm_total"] == round(
        sum(full["queries_warm"].values()), 3
    )
    assert full["warm_total_steal_resolved"] <= full["warm_total"]
    expected = round(
        sum(
            min(v, full["steal_rerun_warm"].get(k, v))
            for k, v in full["queries_warm"].items()
        ),
        3,
    )
    assert full["warm_total_steal_resolved"] == expected
    # the compact (tail-proof) line carries the same rerun signals
    assert compact["steal_rerun_warm"] == full["steal_rerun_warm"]
    assert compact["warm_total_steal_resolved"] == (
        full["warm_total_steal_resolved"]
    )


def test_clean_run_emits_empty_rerun_maps(bench_mod, monkeypatch):
    # a huge ratio flags nothing: fields still present, empty, and
    # resolved == warm_total exactly
    full, compact = _run(
        bench_mod, monkeypatch, 1e9, ["pricing_summary"], ["warc_crawl"]
    )
    assert full["steal_suspect"] == []
    assert full["steal_rerun_warm"] == {}
    assert full["steal_rerun_spread"] == {}
    assert full["gate_steal_rerun_warm"] == {}
    assert full["warm_total_steal_resolved"] == full["warm_total"]
    assert compact["steal_rerun_warm"] == {}
