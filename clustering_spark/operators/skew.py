"""Skew-mitigation utilities (beyond-reference scope).

AQE's skew-join split handles most hot-key joins at runtime; explicit
SALTING remains the tool when the optimizer can't help — a hot key
whose build-side rows exceed one task's memory, forced co-partitioning
for a downstream stage, or engines/configs without AQE. The utility is
semantics-preserving: results are identical to the plain join, only the
physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where a hot key's probe rows spread over
    ``salt_buckets`` tasks: the big side gets a per-row salt (hash of a
    per-row id — deterministic within a run, and ANY assignment yields
    the same join result), the small side is replicated once per salt
    value, and the join key becomes (key..., salt). Output = exactly
    ``big.join(small, on, how)``; replication costs
    salt_buckets × |small|, so keep the small side genuinely small.

    ``how`` is restricted to the joins where replica rows cannot leak:
    inner/left/left_semi/left_anti preserve semantics because every
    output row is driven by exactly one big-side row (whose single salt
    matches exactly one replica). right/full-outer would emit one
    null-padded row PER UNMATCHED REPLICA of a small-side record (up to
    salt_buckets duplicates) — so they raise instead of corrupting."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving under "
            f"small-side replication; use one of {sorted(allowed)} or a "
            "plain join for right/full outer"
        )
    if salt_buckets < 1:
        # salt_buckets=0 would explode the small side to ZERO replicas:
        # inner/semi silently empty, anti silently returns EVERY big
        # row — wrong answers, not an error, without this guard
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    # pick a salt column name absent from both inputs: overwriting a
    # real '__salt' column (and dropping it at the end) would silently
    # change the output schema vs the promised plain-join equivalence
    salt = "__salt"
    while salt in big.columns or salt in small.columns:
        salt += "_"
    b = big.withColumn(
        salt,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    s = small.withColumn(
        salt,
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt_buckets)])),
    )
    return b.join(s, on=on + [salt], how=how).drop(salt)
