"""salted_join must be result-identical to the plain join, including
duplicate keys on both sides and a pathological hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from clustering_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # hot key 7 carries 5000 of 6000 big rows; small has duplicate keys
    big = spark.createDataFrame(
        [(7 if i % 6 else i % 40, i) for i in range(6000)], "k long, payload long"
    )
    small = spark.createDataFrame(
        [(7, "hot"), (7, "hot2"), (3, "cold"), (99, "nomatch")], "k long, tag string"
    )
    got = salted_join(big, small, ["k"], salt_buckets=8)
    plain = big.join(small, on=["k"])
    assert got.count() == plain.count()
    ga = got.groupBy("k", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    pa = plain.groupBy("k", "tag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, ga.collect())) == sorted(map(tuple, pa.collect()))


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(7, i) for i in range(1000)], "k long, v long")
    small = spark.createDataFrame([(7, "x")], "k long, tag string")
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
    )
    n_salts = b.select("__salt").distinct().count()
    assert n_salts > 1  # the hot key's rows really do spread
    assert salted_join(big, small, ["k"], salt_buckets=8).count() == 1000


def test_zero_salt_buckets_rejected(spark):
    # 0 replicas would silently empty inner/semi joins and turn
    # left_anti into "return everything" — must raise instead
    big = spark.createDataFrame([(1, 1)], "k long, v long")
    small = spark.createDataFrame([(1, "a")], "k long, tag string")
    import pytest

    with pytest.raises(ValueError, match="salt_buckets"):
        salted_join(big, small, ["k"], salt_buckets=0)


def test_preexisting_salt_column_survives(spark):
    # a user column literally named __salt must come through unchanged
    big = spark.createDataFrame([(1, "keepme")], "k long, __salt string")
    small = spark.createDataFrame([(1, "t")], "k long, tag string")
    out = salted_join(big, small, ["k"], salt_buckets=4).collect()
    assert len(out) == 1
    assert out[0]["__salt"] == "keepme" and out[0]["tag"] == "t"
