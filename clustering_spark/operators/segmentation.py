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


def spread_groups(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Hash-partition ``df`` by the group keys at the session's default
    parallelism — the pre-shuffle for every compute-heavy
    ``groupBy(keys).applyInPandas`` in this engine.

    Why it exists: AQE's partition coalescing sizes shuffle partitions
    by BYTES, and an Arrow-task stage over small segments is compute-
    bound, not byte-bound — at sf0.01 the tuner's 125 segments total a
    few hundred KB, so AQE folded them into ONE partition and ran
    ~22 s of per-segment numpy on a single Python worker (measured:
    optimal_k 18.5 s -> 2.3 s with this spread). A user-specified
    repartition count is exempt from coalescing, and because
    HashPartitioning(keys, n) satisfies the Arrow stage's required
    ClusteredDistribution, the groupBy adds NO second exchange — same
    wire, different partition count. At 100 TB the same holds: model
    fitting per segment is CPU-dominated, so partition count should
    track cores, not shuffle bytes.

    Width is exactly defaultParallelism, NOT an over-decomposition
    multiple: 2x/4x tasks-per-core was A/B'd (round 17) to smooth the
    balls-in-bins tail of whole-group hash placement (125 tuner
    segments over 32 partitions -> expected max ~8 groups on one task)
    and measured consistently WORSE (optimal_k min 1.75 -> 2.04 s at
    4x, cluster_fit 0.96 -> 1.25 s; 2x flat-to-worse) — the per-task
    Arrow setup floor outweighs the balance gain at gate scale."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in group_cols])


def segment_stats(
    df: DataFrame,
    segment_cols: list[str],
    metric_cols: list[str],
) -> DataFrame:
    """Per-segment: row count, distinct metric-tuple count, min/max of
    every metric. Columns: ``segment_cols..., n_rows, n_distinct_points,
    {c}_min, {c}_max ...``"""
    # n_distinct_points counts only tuples with NO NULL metric — the
    # rows drop_null_metrics keeps. struct() is never NULL, so a plain
    # count_distinct kept NULL-bearing tuples and viable_segments
    # could pass a segment that holds < min_distinct usable points
    # after the null drop (k-means on a single point).
    usable = F.lit(True)
    for c in metric_cols:
        usable = usable & F.col(c).isNotNull()
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(
            F.when(usable, F.struct(*[F.col(c) for c in metric_cols]))
        ).alias("n_distinct_points"),
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
