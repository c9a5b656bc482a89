"""Round-to-6dp helpers with Spark/DuckDB HALF_UP tie semantics.

One home for the engine's three deliberate variants — they differ in
speed/exactness trade, NOT by accident, and every scoring kernel must
pick from here instead of re-deriving the rule (three independent
copies drifted apart once; see PERFORMANCE.md round-7 continuation):

* :func:`np_round6_half_up` — vectorized numpy float form for full
  score matrices. Matches Spark/DuckDB on dyadic .5 ties (where
  ``np.round``'s banker's half-even diverges) but can disagree on
  shortest-repr boundary values (see spark_round6_exact); use it where
  the oracle applies the same float math or values can't hit those
  boundaries.
* :func:`round6_half_up` — the same float form for a Python scalar
  (streaming state kernels, one value per emitted row).
* :func:`spark_round6_exact` — EXACT emulation of Spark's
  ``round(double, 6)`` via ``Decimal(repr(x))``; scalar and slower, so
  only for bounded candidate sets (per-query partial top-k), never a
  full matrix.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def np_round6_half_up(x: np.ndarray) -> np.ndarray:
    """round(x, 6) with Spark/DuckDB semantics — HALF_UP, i.e. ties go
    away from zero. ``np.round`` is banker's half-even, which diverges
    on exact .5 ties (dyadic values like 0.4140625 -> 414062.5): the
    oracle would emit ...063 while half-even emits ...062, breaking the
    value-hash gate."""
    return np.where(x >= 0, np.floor(x * 1e6 + 0.5), np.ceil(x * 1e6 - 0.5)) / 1e6


def np_round_half_up_int(x: np.ndarray) -> np.ndarray:
    """round-to-INTEGER with Spark semantics (HALF_UP, ties away from
    zero) — the integer-precision sibling of :func:`np_round6_half_up`.
    For quantization kernels that must match a Spark-side ``F.round``
    (e.g. int8 SQ8: query and corpus must share one tie rule, or
    scores near the candidate cut are asymmetrically biased)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def round6_half_up(x: float) -> float:
    """Scalar form of :func:`np_round6_half_up` (HALF_UP, ties away
    from zero); Python's ``round()`` is banker's half-even and
    diverges on dyadic .5 ties."""
    return (
        math.floor(x * 1e6 + 0.5) / 1e6
        if x >= 0
        else math.ceil(x * 1e6 - 0.5) / 1e6
    )


def spark_round6_exact(x: float) -> float:
    """EXACT emulation of Spark's ``round(double, 6)``: Spark goes
    through ``BigDecimal.valueOf`` — the double's SHORTEST-repr decimal
    string — then HALF_UP. A float-arithmetic emulation
    (floor(x*1e6+0.5)) disagrees on shortest-repr boundary values:
    0.1260295 rounds to 0.126030 in Spark but 0.126029 under the
    float form (x*1e6 lands just below the .5 boundary). Python's
    ``repr`` implements the same shortest-round-trip rule as Java's
    ``Double.toString``, so Decimal(repr(x)) sees the identical
    decimal value Spark rounds. Call only on bounded candidate sets
    (per-query partial top-k), never on full score matrices."""
    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
