"""profile_table: one-scan report correctness on a hand-built frame
and single-aggregation plan shape on real testdata.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.profiling import profile_table
from clustering_spark.plans import plan_tree

from tests.conftest import SF_DIR


def test_profile_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1.0, 2.0]),
            (2, None, -3.0, [0.5]),
            (3, "b", None, None),
            (4, "a", 2.5, [1.0, 2.0, 3.0]),
        ],
        "id long, s string, v double, arr array<double>",
    )
    p = {r.column: r for r in profile_table(df).collect()}
    assert p["id"].n_rows == 4 and p["id"].n_nulls == 0
    assert p["id"].min == "1" and p["id"].max == "4"
    assert p["s"].n_nulls == 1 and abs(p["s"].null_frac - 0.25) < 1e-9
    assert p["s"].approx_distinct == 2
    assert p["v"].min == "-3.0" and p["v"].max == "2.5"
    # arrays report length bounds, no distinct
    assert p["arr"].min == "1" and p["arr"].max == "3"
    assert p["arr"].approx_distinct == 3  # HLL hashes array values too


def test_profile_empty_frame(spark):
    df = spark.createDataFrame([], "id long, s string")
    p = {r.column: r for r in profile_table(df).collect()}
    assert p["id"].n_rows == 0 and p["id"].null_frac == 0.0


def test_profile_is_single_scan_single_aggregate(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = profile_table(df)
    tree = plan_tree(out)
    assert tree.count("Scan parquet") == 1
    assert "Join" not in tree
    rows = out.collect()
    assert len(rows) == len(df.columns)


def test_profile_table_handles_dotted_column_names(spark):
    """Flattened-JSON headers like 'cpu.percent' must profile — F.col
    would parse the dot as nested-field access."""
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, None)], ["cpu.percent", "node.name"]
    )
    out = profile_table(df).toPandas().set_index("column")
    assert set(out.index) == {"cpu.percent", "node.name"}
    assert out.loc["cpu.percent", "n_nulls"] == 0
    assert out.loc["node.name", "n_nulls"] == 1


def test_profile_survives_duplicate_column_names(spark):
    # repeated headers (CSV re-reads, sloppy joins) must not make the
    # report crash with AMBIGUOUS_REFERENCE
    df = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long").toDF("a", "a")
    rep = profile_table(df).collect()
    assert [r.column for r in rep] == ["a", "a"]
    assert {r["min"] for r in rep} == {"1", "2"}


def test_profile_array_and_binary_distincts(spark):
    df = spark.createDataFrame(
        [([1, 2], bytearray(b"xy")), ([1, 2], bytearray(b"zz")), ([3], bytearray(b"xy"))],
        "arr array<long>, blob binary",
    )
    rep = {r.column: r for r in profile_table(df).collect()}
    assert rep["arr"].approx_distinct is not None and rep["arr"].approx_distinct >= 2
    assert rep["blob"].approx_distinct is not None and rep["blob"].approx_distinct >= 2
