"""Scaling semantics (reference preprocess.py:73-111; SURVEY P5/P6).

Pins the reference conventions: prefix-derived scaled names with
collision fallback, sibling ``_limit`` detection, min-max to [0,100],
constant-column -> 0.0, percent-of-limit, dont_scale passthrough.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from clustering_spark.functions.scaling import (
    limit_col_for,
    scale_segments,
    scaled_name,
)


def test_scaled_name_prefix_convention():
    # ram_usage -> ram_scaled (prefix before first underscore)
    assert scaled_name("ram_usage") == "ram_scaled"
    assert scaled_name("cpu_percent") == "cpu_scaled"
    # no underscore: whole name is the prefix
    assert scaled_name("pids") == "pids_scaled"


def test_scaled_name_collision_fallback():
    # c_acctbal / c_custkey share prefix 'c' -> full-name fallback
    sib = ["c_acctbal", "c_custkey"]
    assert scaled_name("c_acctbal", sib) == "c_acctbal_scaled"
    assert scaled_name("c_custkey", sib) == "c_custkey_scaled"
    # no collision -> prefix form even with siblings present
    sib2 = ["ram_usage", "cpu_percent"]
    assert scaled_name("ram_usage", sib2) == "ram_scaled"


def test_limit_col_detection():
    cols = ["ram_usage", "ram_limit", "cpu_percent"]
    assert limit_col_for("ram_usage", cols) == "ram_limit"
    assert limit_col_for("cpu_percent", cols) is None


def test_minmax_scale_and_constant_column(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 7.0), ("a", 5.0, 7.0), ("a", 10.0, 7.0), ("b", 3.0, 1.0)],
        "seg string, x double, const double",
    )
    out = scale_segments(df, ["x", "const"], ["seg"]).toPandas()
    a = out[out.seg == "a"].sort_values("x")
    # min-max to [0, 100] within segment
    assert list(a.x_scaled) == [0.0, 50.0, 100.0]
    # constant column (max == min) -> 0.0 (preprocess.py:105)
    assert set(a.const_scaled) == {0.0}
    # single-row segment is degenerate too
    b = out[out.seg == "b"]
    assert list(b.x_scaled) == [0.0]


def test_percent_of_limit_scale(spark):
    df = spark.createDataFrame(
        [("a", 50.0, 200.0), ("a", 100.0, 200.0)],
        "seg string, ram_usage double, ram_limit double",
    )
    out = scale_segments(df, ["ram_usage"], ["seg"]).toPandas()
    # X * 100 / X_limit, NOT min-max (preprocess.py:95-97)
    assert sorted(out.ram_scaled) == [25.0, 50.0]


def test_dont_scale_passthrough(spark):
    df = spark.createDataFrame(
        [("a", 4.0), ("a", 8.0)], "seg string, cpu_percent double"
    )
    out = scale_segments(df, ["cpu_percent"], ["seg"], dont_scale=["cpu_percent"])
    pdf = out.toPandas()
    assert sorted(pdf.cpu_scaled) == [4.0, 8.0]


def test_scale_no_segment_cols(spark):
    df = spark.createDataFrame([(0.0,), (4.0,)], "x double")
    out = scale_segments(df, ["x"], []).toPandas()
    assert sorted(out.x_scaled) == [0.0, 100.0]


def test_null_segment_rows_scale_within_their_own_group(spark):
    """groupBy keeps a NULL-segment group; the stats join must be
    null-safe so those rows get THEIR group's [0,100] scaling instead
    of NULL features."""
    from clustering_spark.functions.scaling import scale_segments

    df = spark.createDataFrame(
        [(None, 1.0), (None, 3.0), ("a", 10.0), ("a", 20.0)],
        "seg string, x double",
    )
    out = {
        (r.seg, r.x): r.x_scaled
        for r in scale_segments(df, ["x"], ["seg"]).collect()
    }
    assert out[(None, 1.0)] == 0.0
    assert out[(None, 3.0)] == 100.0
    assert out[("a", 10.0)] == 0.0
    assert out[("a", 20.0)] == 100.0


def test_limit_scale_zero_and_null_limits_yield_null(spark):
    """A zero limit (the cgroup 'unlimited' convention) or NULL limit
    must yield NULL scaled values, not abort the job under ANSI mode's
    DIVIDE_BY_ZERO (DuckDB's x/0 is NULL too, so oracles agree)."""
    df = spark.createDataFrame(
        [
            ("a", 50.0, 100.0),
            ("a", 50.0, 0.0),
            ("a", 50.0, None),
        ],
        "seg string, ram_usage double, ram_limit double",
    )
    out = scale_segments(df, ["ram_usage"], ["seg"]).toPandas()
    vals = out.ram_scaled.tolist()
    assert vals[0] == 50.0
    assert pd.isna(vals[1]) and pd.isna(vals[2])


def test_limit_mapping_skips_prefix_collisions(spark):
    """Two metrics sharing a prefix: the limit column cannot be
    attributed to either, so BOTH min-max instead of one silently
    scaling as percent of the other's capacity."""
    df = spark.createDataFrame(
        [
            ("a", 0.0, 10.0, 100.0),
            ("a", 50.0, 20.0, 100.0),
        ],
        "seg string, net_usage double, net_errors double, net_limit double",
    )
    out = scale_segments(
        df, ["net_usage", "net_errors"], ["seg"]
    ).toPandas().sort_values("net_usage")
    # min-max within segment, NOT percent of net_limit
    assert out.net_usage_scaled.tolist() == [0.0, 100.0]
    assert out.net_errors_scaled.tolist() == [0.0, 100.0]


def test_segment_stats_distinct_ignores_null_tuples(spark):
    """n_distinct_points must count only the rows drop_null_metrics
    keeps — a NULL-bearing tuple let viable_segments pass a segment
    with one usable point."""
    from clustering_spark.operators.segmentation import (
        segment_stats,
        viable_segments,
    )

    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", 2.0, 1.0), ("b", 3.0, 1.0), ("b", 4.0, 2.0)],
        "seg string, x double, y double",
    )
    stats = segment_stats(df, ["seg"], ["x", "y"]).toPandas().set_index("seg")
    assert stats.loc["a", "n_distinct_points"] == 1
    assert stats.loc["b", "n_distinct_points"] == 2
    viable = viable_segments(
        segment_stats(df, ["seg"], ["x", "y"]), min_distinct=2
    )
    assert [r.seg for r in viable.collect()] == ["b"]
