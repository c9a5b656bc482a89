"""Golden-document parity vs the reference's shipped mongodump files —
its ONLY golden output (mongobackup/dump/clusterDatabase/*.bson).

The dumps mix two reference versions (cluster.py evolved while the
Mongo data accumulated):
- OLD docs: per-cluster ``silhouette`` (cluster.py:166 now comments it
  out of clusterInfo), and the d3 leaf's ``radius`` renamed to
  ``size`` holding the RAW radius (cluster.py:207, now commented out).
- NEW docs: ``silhouette`` at the micro level
  (cluster.py:148 ``...[microIndex]['silhouette'] = silhouette``), d3
  leaves keep ``radius`` AND gain ``size`` normalized to
  [1, d3NormalizeMax=50] by metrics.py:151-171 ``scaleD3``.

Our sinks (operators/sinks.py:57-162) implement the CURRENT reference
code, so the parity contract is bidirectional against the dump's key-
path union:
- every key path we emit must exist somewhere in the dump (we invent
  nothing), and
- every dump key path must be ours, except ``_id`` (added by Mongo on
  insert, not by the pipeline) and the two old-version shapes above.

A third check pins the d3 size contract against the NEW-version dump
leaves themselves: wherever the dump has both radius and size, size is
inside [1, 50] — same bound our d3_normalize enforces.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bson_lite import key_paths, load_bson  # noqa: E402

from clustering_spark.operators import sinks  # noqa: E402

DUMP_DIR = Path("/root/reference/mongobackup/dump/clusterDatabase")

pytestmark = pytest.mark.skipif(
    not DUMP_DIR.is_dir(), reason="reference mongodump not present"
)


def _dump_paths(name: str) -> set[str]:
    paths: set[str] = set()
    for doc in load_bson(DUMP_DIR / f"{name}.bson"):
        paths |= key_paths(doc)
    return paths


@pytest.fixture(scope="module")
def results(spark):
    """Flat results in pipeline.RESULT_COLUMNS shape, with enough
    macro/micro/cluster fan-out to exercise every nesting level, using
    the reference's own column names (conf.json: customer_id /
    application_id over cpu_percent x ram_usage)."""
    from pyspark.sql import functions as F  # noqa: F401

    from clustering_spark.operators.metrics import d3_normalize

    rows = []
    for macro, micros in (("cust1", ["app1", "app2"]), ("cust2", ["app1"])):
        for micro in micros:
            for c in (0, 1):
                rows.append(
                    (
                        "KMeans", "customer_id", "application_id",
                        "cpu_percent", "ram_usage",
                        macro, micro, 0.9, 0.7, c,
                        float(c), float(c) * 2, 10 + c, 1.0 + c,
                    )
                )
    df = spark.createDataFrame(
        rows,
        "algorithm string, macro_col string, micro_col string, x_col string, "
        "y_col string, macro_id string, micro_id string, entropy double, "
        "silhouette double, cluster_name int, center_x double, center_y double, "
        "cluster_size long, radius double",
    )
    return d3_normalize(df, "radius", "size", 50.0)


def test_original_document_matches_dump_structure(results):
    dump = _dump_paths("daily_originalCollection")
    ours: set[str] = set()
    for row in sinks.original_documents(
        results, "customer_id", "application_id", run_date="2026-08-14"
    ).collect():
        ours |= key_paths(json.loads(row.doc))

    # we invent no keys the reference never wrote
    invented = ours - dump
    assert not invented, f"keys absent from the golden dump: {sorted(invented)}"

    # we drop nothing the CURRENT reference writes; the two allowed
    # gaps are Mongo's _id and the old-version per-cluster silhouette
    missing = dump - ours - {
        "_id",
        "list[].application_id_List[].clusters[].silhouette",
    }
    assert not missing, f"dump keys our sink never emits: {sorted(missing)}"


def test_d3_document_matches_dump_structure(results):
    dump = _dump_paths("daily_d3Collection")
    ours: set[str] = set()
    docs = [
        json.loads(row.doc)
        for row in sinks.d3_documents(
            results, "customer_id", "application_id", run_date="2026-08-14"
        ).collect()
    ]
    for doc in docs:
        ours |= key_paths(doc)

    invented = ours - dump
    assert not invented, f"keys absent from the golden dump: {sorted(invented)}"

    missing = dump - ours - {
        "_id",
        # old-version per-cluster silhouette (cluster.py:166, removed)
        "children[].children[].children[].silhouette",
    }
    assert not missing, f"dump keys our sink never emits: {sorted(missing)}"

    # nesting contract: root name is the literal 'clusters' in both
    for doc in docs:
        assert doc["name"] == "clusters"
    root = next(iter(load_bson(DUMP_DIR / "daily_d3Collection.bson")))
    assert root["name"] == "clusters"


def test_dump_itself_obeys_the_d3_size_contract():
    """Where the dump has NEW-version leaves (radius AND size), size is
    normalized into [1, d3NormalizeMax=50] — the same bound our
    d3_normalize enforces, pinned here against the reference's own
    output rather than our reimplementation of its formula."""
    sizes = []
    for doc in load_bson(DUMP_DIR / "daily_d3Collection.bson"):
        for mac in doc.get("children", []):
            for mic in mac.get("children", []):
                for leaf in mic.get("children", []):
                    if "radius" in leaf and "size" in leaf:
                        sizes.append(leaf["size"])
    assert sizes, "expected new-version leaves in the dump"
    assert all(1.0 <= s <= 50.0 for s in sizes)


def test_center_shape_matches_dump(results):
    """Centers are 2-element numeric arrays in dump and sink alike —
    the x/y pair the GUI scatterplots."""
    doc = next(iter(load_bson(DUMP_DIR / "daily_originalCollection.bson")))
    dump_center = doc["list"][0]["application_id_List"][0]["clusters"][0]["center"]
    assert len(dump_center) == 2
    assert all(isinstance(v, (int, float)) for v in dump_center)

    row = sinks.original_documents(
        results, "customer_id", "application_id", run_date="2026-08-14"
    ).collect()[0]
    ours = json.loads(row.doc)
    our_center = ours["list"][0]["application_id_List"][0]["clusters"][0]["center"]
    assert len(our_center) == 2
    assert all(isinstance(v, (int, float)) for v in our_center)
