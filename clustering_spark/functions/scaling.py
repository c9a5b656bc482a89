"""Per-segment metric scaling (reference: preprocess.py:73-111 `scale`).

Reference semantics, preserved exactly:
  * for metric ``X`` with a sibling ``X_limit`` column (prefix before the
    first underscore + ``_limit``): ``X_scaled = X * 100 / X_limit``
    (preprocess.py:95-97) — percent-of-capacity;
  * otherwise min-max to [0, 100] *within the segment*:
    ``(X - min) / (max - min) * 100`` (preprocess.py:103);
  * degenerate segment (max == min): ``X_scaled = 0.0``
    (preprocess.py:105);
  * columns listed in ``dont_scale`` pass through unscaled but are
    still emitted as ``X_scaled`` so downstream is uniform
    (preprocess.py:90-91 semantics: excluded from scaling, still used).

Reference anti-pattern NOT copied: two ``agg().collect()[0][0]`` driver
round-trips per column per segment (preprocess.py:99-100; SURVEY §4.3.3).
Here the per-segment min/max of ALL metric columns is ONE groupBy over
the segment keys, producing a tiny (#segments × #metrics) stats frame
that is broadcast-joined back — the fact table is never shuffled. At
100 TB: one scan + one broadcast hash join, zero sort, zero wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clustering_spark.config import LIMIT_SUFFIX


def scaled_name(col: str, sibling_cols: list[str] | None = None) -> str:
    """``X_usage`` -> ``X_scaled``: prefix before the first underscore +
    '_scaled' (preprocess.py:92,96) — e.g. ``ram_usage`` -> ``ram_scaled``.

    The reference convention collides when two metrics share a prefix
    (e.g. ``c_acctbal``/``c_custkey`` -> ``c_scaled``); when
    ``sibling_cols`` shows a collision we fall back to the full column
    name + ``_scaled`` for every collider."""
    prefix = col.split("_")[0] if "_" in col else col
    if sibling_cols is not None:
        prefixes = [(s.split("_")[0] if "_" in s else s) for s in sibling_cols]
        if prefixes.count(prefix) > 1:
            return f"{col}_scaled"
    return f"{prefix}_scaled"


def limit_col_for(
    col: str, all_columns: list[str], sibling_cols: list[str] | None = None
) -> str | None:
    """Sibling capacity column: ``ram_usage`` -> ``ram_limit`` if present
    (preprocess.py:95: ``prop + limitSuffix in df.columns``).

    When ``sibling_cols`` shows two metrics sharing the prefix (the
    same collision ``scaled_name`` disambiguates), the limit cannot be
    attributed to either metric — returning it would silently scale
    one metric as percent of ANOTHER metric's capacity. Colliders fall
    back to min-max (None)."""
    prefix = col.split("_")[0] if "_" in col else col
    if sibling_cols is not None:
        prefixes = [(s.split("_")[0] if "_" in s else s) for s in sibling_cols]
        if prefixes.count(prefix) > 1:
            return None
    cand = prefix + LIMIT_SUFFIX
    return cand if cand in all_columns else None


def scale_segments(
    df: DataFrame,
    metric_cols: list[str],
    segment_cols: list[str],
    dont_scale: list[str] | None = None,
) -> DataFrame:
    """Append ``{prefix}_scaled`` per metric, scaled within each segment.

    Single-pass plan: groupBy(segment).agg(min/max of every min-max
    column) -> broadcast join back -> one withColumns projection.
    """
    dont_scale = dont_scale or []
    all_columns = df.columns

    minmax_cols = [
        c
        for c in metric_cols
        if c not in dont_scale
        and limit_col_for(c, all_columns, metric_cols) is None
    ]

    out = df
    if minmax_cols:
        aggs = []
        for c in minmax_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
        if segment_cols:
            # eqNullSafe join keys: groupBy keeps a NULL-segment group,
            # but an on=cols join is null-rejecting — NULL-segment rows
            # would get NULL bounds and NULL scaled values instead of
            # their own group's [0,100] scaling
            stats = df.groupBy(*segment_cols).agg(*aggs)
            renamed = stats
            for c in segment_cols:
                renamed = renamed.withColumnRenamed(c, f"__sk_{c}")
            cond = None
            for c in segment_cols:
                e = F.col(c).eqNullSafe(F.col(f"__sk_{c}"))
                cond = e if cond is None else (cond & e)
            out = df.join(F.broadcast(renamed), cond, how="left").drop(
                *[f"__sk_{c}" for c in segment_cols]
            )
        else:
            stats = df.agg(*aggs)
            out = df.crossJoin(F.broadcast(stats))

    exprs = {}
    for c in metric_cols:
        name = scaled_name(c, metric_cols)
        limit_c = limit_col_for(c, all_columns, metric_cols)
        if c in dont_scale:
            # excluded from scaling; passes through (preprocess.py:90-91)
            exprs[name] = F.col(c).cast("double")
        elif limit_c is not None:
            # try_divide: a zero limit (the cgroup 'unlimited'
            # convention) yields NULL instead of aborting the job under
            # Spark 4's default ANSI mode (DIVIDE_BY_ZERO); NULL limits
            # yield NULL too. DuckDB's x/0 is also NULL, so the oracle
            # agrees; un-scalable rows then fall to the caller's
            # null-metric policy instead of crashing the fit.
            exprs[name] = F.try_divide(F.col(c) * 100.0, F.col(limit_c))
        else:
            mn, mx = F.col(f"__min_{c}"), F.col(f"__max_{c}")
            exprs[name] = F.when(mx == mn, F.lit(0.0)).otherwise(
                (F.col(c) - mn) / (mx - mn) * 100.0
            )
    out = out.withColumns(exprs)
    drop = [f"__min_{c}" for c in minmax_cols] + [f"__max_{c}" for c in minmax_cols]
    return out.drop(*drop)
