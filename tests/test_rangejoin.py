"""time_range_join: the binned equi-join must reproduce the naive
BETWEEN cross join exactly, including boundary semantics (exclusive
lower, inclusive upper) and bucket-boundary straddles."""

from __future__ import annotations

from clustering_spark.operators.rangejoin import time_range_join


def test_range_join_matches_bruteforce(spark):
    # spans chosen so intervals straddle bucket boundaries
    left = spark.createDataFrame(
        [(i, 1000 * i + 17) for i in range(50)], "lid long, lts long"
    )
    right = spark.createDataFrame(
        [(j, 137 * j) for j in range(400)], "rid long, rts long"
    )
    lower, upper = 0, 750  # bucket span 750
    got = {
        (r.lid, r.rid)
        for r in time_range_join(left, right, "lts", "rts", lower, upper).collect()
    }
    lrows = [(i, 1000 * i + 17) for i in range(50)]
    rrows = [(j, 137 * j) for j in range(400)]
    expect = {
        (li, rj)
        for li, lt in lrows
        for rj, rt in rrows
        if lt + lower < rt <= lt + upper
    }
    assert got == expect and len(expect) > 0


def test_range_join_boundaries(spark):
    left = spark.createDataFrame([(1, 100)], "lid long, lts long")
    right = spark.createDataFrame(
        [(10, 100), (11, 101), (12, 200), (13, 201)], "rid long, rts long"
    )
    got = sorted(
        r.rid
        for r in time_range_join(left, right, "lts", "rts", 0, 100).collect()
    )
    # (100, 200]: 100 excluded, 101 and 200 in, 201 out
    assert got == [11, 12]


def test_range_join_is_equi_join(spark):
    from clustering_spark.plans.audit import join_strategies

    left = spark.createDataFrame([(1, 100)], "lid long, lts long")
    right = spark.createDataFrame([(10, 150)], "rid long, rts long")
    df = time_range_join(left, right, "lts", "rts", 0, 100)
    js = join_strategies(df)
    assert js and "BroadcastNestedLoopJoin" not in js and "CartesianProduct" not in js


def test_bucket_column_collision_raises(spark):
    import pytest as _pytest

    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, __bucket long")
    right = spark.createDataFrame([(1, 12)], "k long, rts long")
    with _pytest.raises(ValueError, match="__bucket"):
        time_range_join(left, right, "ts", "rts", 0, 100, extra_keys=["k"])


def test_range_join_exact_buckets_at_nanosecond_scale(spark):
    """Round-10 review batch: bucket ids used floor(double division),
    whose quotient ulp exceeds the 1/span boundary margin once
    ts/span > 2^53/span — i.e. TODAY for nanosecond-integer
    timestamps. Concrete repro: at 1 h-in-ns span, a left interval
    starting 100 ns below a bucket boundary misrounded its first
    bucket UP and silently dropped the matching right row in the
    bucket below. Exact long `div` keeps it."""
    s = 3_600_000_000_000  # 1 hour in NANOSECONDS
    m = 472_222
    a = m * s - 100  # left ts (lower=0): interval (a, a+s]
    left = spark.createDataFrame([(1, a)], "lid long, lts long")
    right = spark.createDataFrame(
        [(10, m * s - 50), (11, m * s + 50), (12, a + s + 1)],
        "rid long, rts long",
    )
    got = sorted(
        r.rid
        for r in time_range_join(left, right, "lts", "rts", 0, s).collect()
    )
    # rid 10 is the pair the double-floor math dropped; 12 is out of range
    assert got == [10, 11]
