"""Cluster metrics block (reference: metrics.py; SURVEY §2.3, §7.3).

Reference pathologies NOT copied (SURVEY §4.3.4):
  * per-cluster ``where(pred==c).count()`` loops for entropy
    (metrics.py:131-133) — here ONE groupBy;
  * per-cluster ``Summarizer.mean`` jobs for centers (metrics.py:50-53)
    — here avg() per feature column in the same groupBy;
  * python UDF squared distance (metrics.py:26-27) — here a native
    column expression.

Everything in this module is a constant number of Spark jobs regardless
of segment count or k: one groupBy(segment, prediction) for cluster
summaries + one groupBy(segment) rollup. Both partial-aggregate
map-side, so at 100 TB the shuffle carries #segments×k rows, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustering_spark.config import PREDICTION_COL
from clustering_spark.functions.entropy import shannon_entropy_agg


def cluster_summaries(
    labeled: DataFrame,
    segment_cols: list[str],
    feature_cols: list[str],
    prediction_col: str = PREDICTION_COL,
    extra_first_cols: tuple[str, ...] = ("silhouette", "wssse"),
) -> DataFrame:
    """One row per (segment, cluster): size, center as SCALAR columns
    ``center_0..center_{d-1}`` (per-dim means — A6), radius = sqrt(max
    squared distance to center) (A7). Centers are flat columns, not an
    array, so the result sorts/hashes cleanly downstream.

    Radius needs the center first, so this is two passes over the
    *labeled* data: (1) groupBy centers, (2) broadcast-join centers back
    and max-aggregate distances. Both map-side combine; no wide shuffle
    of the fact table (the join is broadcast: #segments×k rows).
    """
    keys = [*segment_cols, prediction_col]

    aggs = [F.count(F.lit(1)).alias("cluster_size")]
    for c in feature_cols:
        aggs.append(F.avg(c).alias(f"__ctr_{c}"))
    for c in extra_first_cols:
        if c in labeled.columns:
            aggs.append(F.first(c).alias(c))
    centers = labeled.groupBy(*keys).agg(*aggs)

    joined = labeled.select(*keys, *feature_cols).join(
        F.broadcast(centers), on=keys, how="inner"
    )
    dist2 = None
    for c in feature_cols:
        term = (F.col(c) - F.col(f"__ctr_{c}")) * (F.col(c) - F.col(f"__ctr_{c}"))
        dist2 = term if dist2 is None else dist2 + term
    radii = joined.groupBy(*keys).agg(F.sqrt(F.max(dist2)).alias("radius"))

    out = centers.join(radii, on=keys, how="inner")
    center_flat = [
        F.col(f"__ctr_{c}").alias(f"center_{i}") for i, c in enumerate(feature_cols)
    ]
    keep = (
        [F.col(k) for k in keys]
        + [F.col("cluster_size"), *center_flat, F.col("radius")]
        + [F.col(c) for c in extra_first_cols if c in centers.columns]
    )
    return out.select(*keep)


def segment_entropy(
    labeled: DataFrame,
    segment_cols: list[str],
    prediction_col: str = PREDICTION_COL,
) -> DataFrame:
    """Shannon entropy (base 2) of the cluster-size distribution per
    segment (metrics.py:113-137 `calculateEntropy`), one aggregation."""
    sizes = labeled.groupBy(*segment_cols, prediction_col).count()
    return sizes.groupBy(*segment_cols).agg(
        shannon_entropy_agg("count").alias("entropy")
    )


def d3_normalize(
    summaries: DataFrame,
    value_col: str = "radius",
    out_col: str = "size",
    d3_max: float = 50.0,
) -> DataFrame:
    """Affine-normalize ``value_col`` into [1, d3_max] across the whole
    result set (metrics.py:151-171 `scaleD3`); degenerate range -> 1.0.

    The reference computes min/max with a driver-side nested loop (and a
    bug: its `elif` skips the max update when a value also won the min —
    metrics.py:159; SURVEY appendix).

    Implementation: an UNPARTITIONED min/max window. That is normally a
    scale trap (all rows through one partition) but is the right plan
    here BY CONTRACT: the input is the summaries frame, #segments x k
    rows, never fact data. The alternative (1-row aggregate +
    crossJoin-back) re-evaluates the summaries subtree twice — for a
    clustering pipeline that means fitting every model twice, which
    benchmarking showed dominates the flagship query's cost.
    """
    from pyspark.sql import Window

    w = Window.partitionBy()
    mn = F.min(value_col).over(w)
    mx = F.max(value_col).over(w)
    scaled = F.when(mx == mn, F.lit(1.0)).otherwise(
        (F.col(value_col) - mn) / (mx - mn) * (F.lit(d3_max) - 1.0) + 1.0
    )
    return summaries.withColumn(out_col, scaled)
