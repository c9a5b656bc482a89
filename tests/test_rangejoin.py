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
