"""Binned time-range join (beyond-reference scope): pair every left
row with the right rows whose timestamp falls in
(left_ts + lower, left_ts + upper] — the "events within an hour after
the signup" shape. Spark has no native range join; the naive form is a
cross join with a BETWEEN filter, O(n·m).

Scale design — bucketize both sides by the window span: a right row
lands in exactly ONE bucket of width (upper - lower); a left interval
spans at most TWO consecutive buckets, so the left side explodes 2×
and the join becomes an EQUI-join on the bucket id followed by the
exact range filter. Join volume collapses from n·m to pairs sharing a
~window-sized bucket, each (left, right) pair can match in at most one
bucket (no dedup needed), and AQE handles hot buckets like any skewed
equi key. Optional extra equi keys (e.g. user_id) compose — they join
alongside the bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join pairs with right_ts in (left_ts + lower_us,
    left_ts + upper_us]. Timestamps are integer microseconds columns
    (cast upstream). Output: all left columns + all right columns
    (names must not collide except ``extra_keys``)."""
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    for side, name in ((left, "left"), (right, "right")):
        if "__bucket" in side.columns:
            # withColumn would silently REPLACE and the final drop
            # would delete the caller's column — fail fast like
            # asof_join's collision check
            raise ValueError(
                f"{name} frame already has a '__bucket' column — drop "
                "or rename it before time_range_join"
            )
    span = upper_us - lower_us
    keys = list(extra_keys or [])

    lts: Column = F.col(left_ts)
    rts: Column = F.col(right_ts)
    # interval (lts+lower, lts+upper] spans at most 2 consecutive
    # buckets of width span. Bucket ids are computed with EXACT long
    # `div`, not floor(double division): at microsecond epoch scale
    # the double quotient's ulp error (~k*2^-52, k = ts/span) is the
    # same order as the 1/span distance to the next integer, so a
    # boundary timestamp could misbucket and silently DROP a matching
    # pair (the float-ceiling class the ngram PPJoin bounds were cured
    # of). `div` truncates toward zero where floor rounds down, but
    # the two-bucket covering argument only needs a monotone rounding
    # applied identically to BOTH sides, which this is — and
    # stream_interval_join already uses SQL DIV, so batch and stream
    # now share exact bucket math.
    b0 = F.expr(
        f"(CAST(`{left_ts}` AS BIGINT) + {int(lower_us)}) div {int(span)}"
    )
    l2 = left.withColumn("__bucket", F.explode(F.array(b0, b0 + 1)))
    r2 = right.withColumn(
        "__bucket", F.expr(f"CAST(`{right_ts}` AS BIGINT) div {int(span)}")
    )
    joined = l2.join(r2, on=keys + ["__bucket"]).filter(
        (rts > lts + F.lit(lower_us)) & (rts <= lts + F.lit(upper_us))
    )
    return joined.drop("__bucket")
