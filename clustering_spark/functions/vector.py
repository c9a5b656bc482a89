"""Native vector math over ``array<double>`` / ``array<float>`` columns.

The reference's only UDF is a row-at-a-time python
``udf(lambda v: v.squared_distance(center))`` (metrics.py:26-27) — the
slow path. Every function here is a pure Column expression built from
``F.zip_with`` / ``F.aggregate`` / ``F.transform``: it stays JVM-side,
participates in whole-stage codegen, and never crosses into Python.

At 100 TB this is the difference between a scan-speed pipeline and one
bottlenecked on Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def squared_distance(a: Column | str, b: Column | str) -> Column:
    """sum_i (a_i - b_i)^2 — replaces the reference's python UDF
    (metrics.py:26-27) with a codegen-able expression."""
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = _as_col(a)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); NULL-safe on zero-norm vectors (returns NULL
    rather than NaN so filters behave predictably).

    DIMENSION CONTRACT (applies to dot/squared_distance too): arrays
    of different lengths yield NULL, not an error — zip_with pads the
    shorter side with NULLs, which poisons the aggregate. Callers are
    expected to guarantee a single embedding dimension per column
    (schema-level invariant); validate upstream if a join can mix
    dimensions, because a NULL here silently drops rows from
    threshold filters."""
    a, b = _as_col(a), _as_col(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > F.lit(0.0), dot(a, b) / denom)
