"""Bucketed co-located joins: the pre-shuffled layout must plan a join
with NO Exchange on either side (the whole point of bucketing at
scale), and results must match the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.sources.bucketed import drop_table, write_bucketed


@pytest.fixture
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_buck_a", ["k"], 4, str(tmp_path / "a"), sort_cols=["k"])
    write_bucketed(b, "t_buck_b", ["k"], 4, str(tmp_path / "b"), sort_cols=["k"])
    yield spark.table("t_buck_a"), spark.table("t_buck_b")
    drop_table(spark, "t_buck_a")
    drop_table(spark, "t_buck_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ta.join(tb, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # same-key, same-count buckets: co-located scan, zero shuffles
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = ta.join(tb, "k").selectExpr("k", "va", "vb").toPandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert (got.va == got.k * 2).all()
    assert (got.vb == got.k * 3).all()
    assert len(got) == 2000


def test_drop_table_quotes_non_identifier_names(spark):
    """write_bucketed creates names like 'events-2026' via the writer
    API; drop_table must quote them instead of failing to parse."""
    from clustering_spark.sources.bucketed import drop_table

    # must not raise even though the table does not exist
    drop_table(spark, "events-2026")
    drop_table(spark, "some db.wei`rd")
