"""Dirty-CSV parity replay (VERDICT r2 #6; SURVEY §1.1).

``tests/fixtures/daily_data_dirty_sample.csv`` is a BYTE-ACCURATE
subset of the reference's ``data/daily_data.csv`` (UTF-8 BOM + LF
preserved; every line occurs verbatim in the original): the header,
every 10th clean row (1438 rows — all ten customer x application
segments represented), and ALL 17 malformed rows. The malformation is
an Excel-mangled ``container_id`` of ``4,14E+31`` whose embedded comma
shifts every later field right by one, landing the customer string
``Teknosa`` in the numeric ``time`` column (reference
data/daily_data.csv; SURVEY §1.1/§4.3.9).

The reference survives these rows only via inferSchema type demotion
(``time`` becomes string). The engine's PERMISSIVE explicit-schema mode
must instead quarantine exactly those 17 rows in ``_corrupt_record``,
keep declared types, agree row-for-row with the inferSchema survivors,
and run the full interval pipeline on the clean rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clustering_spark.config import PipelineConfig
from clustering_spark.pipeline import run_interval
from clustering_spark.sources import (
    CONTAINER_STATS_SCHEMA,
    read_csv,
    read_csv_inferred,
    split_corrupt,
)

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "daily_data_dirty_sample.csv"
)
N_CLEAN = 1438
N_DIRTY = 17


@pytest.fixture(scope="module")
def replay(spark):
    clean, corrupt = split_corrupt(read_csv(spark, FIXTURE))
    return clean, corrupt


def test_replay_quarantines_the_17_reference_rows(replay):
    clean, corrupt = replay
    raws = [r["_corrupt_record"] for r in corrupt.collect()]
    assert len(raws) == N_DIRTY
    # the verbatim raw record preserves the mangled container_id and the
    # shifted customer string for quarantine/debugging
    assert all("4,14E+31" in r and "Teknosa" in r for r in raws)
    assert clean.count() == N_CLEAN
    # declared types survive the dirt (no inferSchema demotion)
    types = {f.name: f.dataType.simpleString() for f in clean.schema.fields}
    assert types["time"] == "bigint"
    assert types["ram_usage"] == "double"
    # no shifted value leaked into the clean relation
    assert clean.filter(F.col("customer_id") == "4").count() == 0


def test_replay_matches_inferschema_survivors(spark, replay):
    """The clean relation must equal the rows the reference's
    inferSchema mode would have parsed correctly, value-for-value,
    once those survivors are cast back to the declared types."""
    clean, _ = replay
    inferred = read_csv_inferred(spark, FIXTURE)
    # demotion happened (this is what the engine mode avoids) ...
    assert dict(
        (f.name, f.dataType.simpleString()) for f in inferred.schema.fields
    )["time"] == "string"
    # ... and the survivors are the rows whose `time` is numeric
    survivors = inferred.filter(
        F.expr("try_cast(time AS bigint)").isNotNull()
    ).select(
        *[F.col(f.name).cast(f.dataType) for f in CONTAINER_STATS_SCHEMA.fields]
    )
    assert survivors.count() == N_CLEAN
    assert clean.exceptAll(survivors).count() == 0
    assert survivors.exceptAll(clean).count() == 0


def test_replay_run_interval_end_to_end(replay, tmp_path):
    """Clean rows drive the full reference flow (cap -> grid ->
    document sinks) with the reference's segment columns; the 17
    quarantined rows must not perturb segmentation."""
    clean, _ = replay
    cfg = PipelineConfig(
        filtering_columns={"customer_id": ["application_id"]},
        columns={"cpu_percent": ["ram_usage"]},
        algorithms=["KMeans"],
        dont_scale=["cpu_percent"],
        limits={"daily": 10_000},
    )
    out = str(tmp_path / "results")
    results = run_interval(clean, "daily", cfg, out, run_date="2026-08-13", k=2)
    pdf = results.toPandas()
    segs = set(zip(pdf.macro_id, pdf.micro_id))
    # exactly the ten clean (customer, application) segments — the
    # shifted rows ('Teknosa' in time, '4' in customer_id) formed none
    expected = {
        ("Bimeks", "WebServer"), ("Bimeks", "APPLV001"), ("Bimeks", "Prelive"),
        ("Teknosa", "Dev02"), ("Teknosa", "SalesLive1"),
        ("Teknosa", "OracleSiebel"), ("Vatan", "SAP_FIORI"),
        ("Vatan", "E-Commerce"), ("Vatan", "SalesLIVE001"), ("a", "a"),
    }
    assert segs == expected
    assert pdf.cluster_size.sum() == N_CLEAN
    # document sinks written for the grid pair
    assert os.path.isdir(f"{out}/original/daily")
    assert os.path.isdir(f"{out}/d3/daily")
