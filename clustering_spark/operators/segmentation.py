"""Segmentation engine (reference: preprocess.py:114-170
`macroDFs`/`filteredDFs`).

The reference materializes the two-level segment hierarchy as a nested
list-of-dicts of *filtered DataFrames* — two ``distinct().collect()``
driver round-trips plus one ``where(col==v)`` DataFrame per segment
value (SURVEY §4.3.1: O(C·A·K) Spark jobs per grid cell). That is a
driver-side emulation of ``groupBy``.

Here a "segment" is just a group key tuple. This module provides the
one-pass segment statistics aggregation that drives:
  * the degenerate-segment skip (``distinct (x,y) >= 2`` —
    cluster.py:115, optimal_k.py:297),
  * scaling bounds (min/max per metric — preprocess.py:99-100),
  * segment sizes.

One shuffle on the segment keys, map-side partially aggregated; the
output is #segments rows — broadcastable at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_stats(
    df: DataFrame,
    segment_cols: list[str],
    metric_cols: list[str],
) -> DataFrame:
    """Per-segment: row count, distinct metric-tuple count, min/max of
    every metric. Columns: ``segment_cols..., n_rows, n_distinct_points,
    {c}_min, {c}_max ...``"""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.struct(*[F.col(c) for c in metric_cols])).alias(
            "n_distinct_points"
        ),
    ]
    for c in metric_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(*segment_cols).agg(*aggs)


def viable_segments(stats: DataFrame, min_distinct: int = 2) -> DataFrame:
    """Degenerate-segment guard (cluster.py:115-119): a segment is
    clusterable only with >= ``min_distinct`` distinct metric points."""
    return stats.filter(F.col("n_distinct_points") >= min_distinct)


def drop_null_metrics(df: DataFrame, metric_cols: list[str]) -> DataFrame:
    """``df.na.drop(subset=clusteringColumns)`` (preprocess.py:89)."""
    return df.na.drop(subset=metric_cols)
