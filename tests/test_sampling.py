"""hash_sample / hash_split: deterministic, partition-independent,
pushdown-friendly membership."""

from __future__ import annotations

import pytest

from clustering_spark.operators.sampling import hash_sample, hash_split


def test_sample_deterministic_and_stable_under_growth(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    s1 = sorted(r.id for r in hash_sample(df, "id", 0.3).collect())
    s2 = sorted(r.id for r in hash_sample(df, "id", 0.3).collect())
    assert s1 == s2
    # roughly the requested fraction
    assert 0.25 < len(s1) / 2000 < 0.35
    # growing the corpus never changes an existing row's membership
    bigger = spark.createDataFrame([(i,) for i in range(4000)], "id long")
    s3 = set(r.id for r in hash_sample(bigger, "id", 0.3).collect())
    assert set(s1) == {i for i in s3 if i < 2000}
    # different salt -> different sample
    s4 = sorted(r.id for r in hash_sample(df, "id", 0.3, salt="x").collect())
    assert s4 != s1


def test_sample_edge_fractions(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    assert hash_sample(df, "id", 1.0).count() == 10
    assert hash_sample(df, "id", 0.0).count() == 0


def test_split_partitions_everything_disjointly(spark):
    df = spark.createDataFrame([(i,) for i in range(3000)], "id long")
    out = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert sum(counts.values()) == 3000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # split == sample prefix property: the 0.8 sample IS the train split
    train_ids = {r.id for r in out.filter("split = 'train'").collect()}
    sample_ids = {r.id for r in hash_sample(df, "id", 0.8).collect()}
    assert train_ids == sample_ids


def test_split_fractions_must_sum_to_one(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        hash_split(df, "id", {"a": 0.5, "b": 0.4})
