"""Sink contract tests (SURVEY §1.4): nested document key names and
shape, size bounds, writer round-trip, latest-wins + swapped-pair GUI
read, dropdown sources.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators import sinks


@pytest.fixture
def results(spark):
    """Hand-made flat results: 1 grid cell, 2 macros x 1-2 micros,
    2 clusters each (matches pipeline.RESULT_COLUMNS + size)."""
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
    from clustering_spark.operators.metrics import d3_normalize

    return d3_normalize(df, "radius", "size", 50.0)


def test_original_document_shape(results):
    docs = sinks.original_documents(
        results, "customer_id", "application_id", run_date="2026-08-13"
    ).collect()
    assert len(docs) == 1
    doc = json.loads(docs[0].doc)
    # §1.4 key names
    assert set(doc) == {
        "algorithm", "macro", "micro", "firstColumn", "secondColumn",
        "date", "list",
    }
    assert doc["macro"] == "customer_id"
    macros = {m["customer_id"]: m for m in doc["list"]}
    assert set(macros) == {"cust1", "cust2"}
    micros = macros["cust1"]["application_id_List"]
    assert {m["application_id"] for m in micros} == {"app1", "app2"}
    m = micros[0]
    assert {"entropy", "silhouette", "clusters"} <= set(m)
    cl = m["clusters"][0]
    assert set(cl) == {"name", "center", "clusterSize", "radius"}
    assert isinstance(cl["center"], list) and len(cl["center"]) == 2
    # clusters sorted by name
    assert [c["name"] for c in m["clusters"]] == [0, 1]


def test_d3_document_shape_and_size_bounds(results):
    docs = sinks.d3_documents(
        results, "customer_id", "application_id", run_date="2026-08-13"
    ).collect()
    doc = json.loads(docs[0].doc)
    assert doc["name"] == "clusters"
    assert doc["firstColumn"] == "cpu_percent"
    level1 = doc["children"]
    assert {n["name"] for n in level1} == {"cust1", "cust2"}
    leaf = level1[0]["children"][0]["children"][0]
    assert {"name", "center", "clusterSize", "radius", "size"} <= set(leaf)
    # every leaf size within [1, 50]
    sizes = [
        c["size"]
        for mac in level1
        for mic in mac["children"]
        for c in mic["children"]
    ]
    assert all(1.0 <= s <= 50.0 for s in sizes)
    assert min(sizes) == 1.0 and max(sizes) == 50.0


def test_no_value_corruption_when_value_contains_column_name(spark, results):
    """The reference's JSON string-replace would corrupt a macro_id
    VALUE equal to the column name; the relational build must not."""
    weird = results.withColumn(
        "macro_id", F.lit("customer_id")  # value == column name
    )
    doc = json.loads(
        sinks.original_documents(weird, "customer_id", "application_id", "d")
        .collect()[0]
        .doc
    )
    assert doc["list"][0]["customer_id"] == "customer_id"


def test_write_and_latest_document_roundtrip(spark, results, tmp_path):
    path = str(tmp_path / "docs")
    d1 = sinks.d3_documents(results, "customer_id", "application_id", "d1", version=1)
    d2 = sinks.d3_documents(results, "customer_id", "application_id", "d2", version=2)
    sinks.write_documents(d1, path, "daily")
    sinks.write_documents(d2, path, "daily")
    docs = spark.read.parquet(f"{path}/daily")
    got = sinks.latest_document(
        docs, "KMeans", "customer_id", "application_id", "cpu_percent", "ram_usage"
    ).collect()
    assert len(got) == 1
    assert got[0].date == "d2"  # latest version wins


def test_latest_document_swapped_pair_fallback(spark, results, tmp_path):
    path = str(tmp_path / "docs")
    d1 = sinks.d3_documents(results, "customer_id", "application_id", "d1", version=1)
    sinks.write_documents(d1, path, "daily")
    docs = spark.read.parquet(f"{path}/daily")
    # query with the column pair REVERSED: falls back to the stored doc
    got = sinks.latest_document(
        docs, "KMeans", "customer_id", "application_id", "ram_usage", "cpu_percent"
    ).collect()
    assert len(got) == 1 and got[0].x_col == "cpu_percent"
    # nonexistent cell -> empty
    none = sinks.latest_document(
        docs, "KMeans", "customer_id", "application_id", "io_usage", "pids"
    )
    assert none.count() == 0


def test_dropdown_options(results):
    docs = sinks.d3_documents(results, "customer_id", "application_id", "d")
    opts = sinks.dropdown_options(docs).toPandas()
    got = {
        (r.field, r.value) for r in opts.itertuples()
    }
    assert ("macro", "customer_id") in got
    assert ("algorithm", "KMeans") in got
    assert ("firstColumn", "cpu_percent") in got


def test_document_json_is_deterministic_across_runs(spark, results):
    """Every collect_list level is sorted, so two runs over a
    multi-partition frame emit byte-identical document JSON."""
    shuffled = results.repartition(16)
    a = sorted(
        r.doc
        for r in sinks.original_documents(
            shuffled, "customer_id", "application_id", run_date="r"
        ).collect()
    )
    b = sorted(
        r.doc
        for r in sinks.original_documents(
            shuffled.repartition(7), "customer_id", "application_id", run_date="r"
        ).collect()
    )
    assert a == b
    da = sorted(
        r.doc
        for r in sinks.d3_documents(
            shuffled, "customer_id", "application_id", run_date="r"
        ).collect()
    )
    db = sorted(
        r.doc
        for r in sinks.d3_documents(
            shuffled.repartition(7), "customer_id", "application_id", run_date="r"
        ).collect()
    )
    assert da == db


def test_latest_document_equal_versions_latest_date_wins(spark, results, tmp_path):
    """run_interval appends version=0 every run, so equal versions are
    the NORMAL case across daily reruns: the newest date must win (the
    version-only ordering picked an arbitrary row)."""
    path = str(tmp_path / "docs")
    day1 = sinks.d3_documents(
        results, "customer_id", "application_id", "2026-08-01", version=0
    )
    day2 = sinks.d3_documents(
        results, "customer_id", "application_id", "2026-08-02", version=0
    )
    sinks.write_documents(day1, path, "daily")
    sinks.write_documents(day2, path, "daily")
    docs = spark.read.parquet(f"{path}/daily")
    got = sinks.latest_document(
        docs, "KMeans", "customer_id", "application_id", "cpu_percent", "ram_usage"
    ).collect()
    assert len(got) == 1
    assert got[0].date == "2026-08-02"
