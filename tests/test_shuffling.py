"""Deterministic epoch shuffle / sharding: reproducibility against an
independent hashlib-md5 reference, per-epoch independence, within-shard
ordering, balance stats, and the one-shuffle plan shape.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from clustering_spark.operators.shuffling import (
    epoch_shuffle,
    shard_stats,
    shuffle_key,
)


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"doc-{i}", 10 + (i * 7) % 90) for i in range(n)],
        "doc_id long, text string, n_tokens long",
    )


def _expect_key(doc_id, epoch, salt):
    raw = f"{doc_id}\x1f{epoch}\x1f{salt}".encode()
    return hashlib.md5(raw).hexdigest()


def test_shard_and_order_match_hashlib_reference(spark):
    """Shard assignment and order key must equal an independent
    implementation of the same spec — the property that makes the
    permutation replayable by a non-Spark reader."""
    out = (
        epoch_shuffle(_docs(spark), "doc_id", n_shards=7, epoch=3, salt="s")
        .select("doc_id", "shard", "shuffle_order")
        .collect()
    )
    assert len(out) == 400
    for r in out:
        k = _expect_key(r.doc_id, 3, "s")
        assert r.shuffle_order == k
        assert r.shard == int(k[:8], 16) % 7


def test_null_key_is_deterministic_and_distinct_from_empty(spark):
    """A NULL key must hash to the '\\x00' sentinel (stable across
    runs) and must NOT collide with the empty-string key — concat_ws
    skipping the NULL would have produced exactly that collision."""
    df = spark.createDataFrame([(None,), ("",), ("a",)], "k string")
    got = {
        ("NULL" if r.k is None else r.k): r.h
        for r in df.select("k", shuffle_key("k", epoch=2, salt="s").alias("h"))
        .collect()
    }
    assert got["NULL"] == hashlib.md5("\x00\x1f2\x1fs".encode()).hexdigest()
    assert got[""] == hashlib.md5("\x1f2\x1fs".encode()).hexdigest()
    assert got["NULL"] != got[""]
    assert len(set(got.values())) == 3


def test_shuffle_is_deterministic_across_runs(spark):
    a = epoch_shuffle(_docs(spark), "doc_id", 4, epoch=1).collect()
    b = epoch_shuffle(_docs(spark), "doc_id", 4, epoch=1).collect()
    assert a == b


def test_epochs_give_different_permutations(spark):
    order0 = [
        r.doc_id
        for r in epoch_shuffle(_docs(spark), "doc_id", 1, epoch=0)
        .select("doc_id")
        .collect()
    ]
    order1 = [
        r.doc_id
        for r in epoch_shuffle(_docs(spark), "doc_id", 1, epoch=1)
        .select("doc_id")
        .collect()
    ]
    assert sorted(order0) == sorted(order1)  # same corpus
    assert order0 != order1  # different permutation


def test_rows_sorted_within_each_partition(spark):
    """sortWithinPartitions must leave every task's rows in order-key
    order — checked against the physical partition id, not the logical
    shard column, so a repartition regression can't hide."""
    out = (
        epoch_shuffle(_docs(spark), "doc_id", 5, epoch=2)
        .withColumn("pid", F.spark_partition_id())
        .select("pid", "shuffle_order", "shard")
        .collect()
    )
    by_pid: dict[int, list] = {}
    for r in out:
        by_pid.setdefault(r.pid, []).append(r)
    assert len([p for p, rows in by_pid.items() if rows]) <= 5
    for rows in by_pid.values():
        # rows sort by (shard, order): each shard's block is
        # contiguous and internally ordered, so even a direct write
        # keeps shard boundaries
        pairs = [(r.shard, r.shuffle_order) for r in rows]
        assert pairs == sorted(pairs)
        shards_in_order = [s for s, _ in pairs]
        seen = []
        for s in shards_in_order:  # contiguity: no shard reappears
            if not seen or seen[-1] != s:
                assert s not in seen
                seen.append(s)
    # a shard is never SPLIT across tasks (hash partitioning is a
    # function of the shard value); two shards may share a task at
    # tiny n_shards — write.partitionBy still separates their files
    shard_pids: dict[int, set] = {}
    for r in out:
        shard_pids.setdefault(r.shard, set()).add(r.pid)
    assert all(len(pids) == 1 for pids in shard_pids.values())


def test_shards_are_balanced(spark):
    stats = shard_stats(
        epoch_shuffle(_docs(spark, n=2000), "doc_id", 8), weight_col="n_tokens"
    ).collect()
    assert len(stats) == 8
    assert sum(r.n_rows for r in stats) == 2000
    assert abs(sum(r.row_share for r in stats) - 1.0) < 1e-4
    # md5 is uniform: no shard should be wildly off 1/8 of the corpus
    for r in stats:
        assert 0.06 < r.row_share < 0.20
        assert r.total_weight > 0


def test_one_shuffle_plan(spark):
    """Exactly one Exchange (the hash repartition) and no global Sort:
    the scale contract — a SortExec ABOVE the exchange would mean a
    global sort snuck in."""
    plan = epoch_shuffle(_docs(spark), "doc_id", 4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


def test_bad_shard_count_rejected(spark):
    with pytest.raises(ValueError):
        epoch_shuffle(_docs(spark), "doc_id", 0)


def test_shuffle_key_separator_prevents_collisions(spark):
    """(key='a1', epoch=1) and (key='a', epoch=11) concatenate to the
    same bytes without a separator; the unit separator keeps them
    distinct permutation streams."""
    df = spark.createDataFrame([("a1",), ("a",)], "k string")
    k_a1_e1 = df.filter("k = 'a1'").select(
        shuffle_key("k", epoch=1).alias("h")
    ).collect()[0].h
    k_a_e11 = df.filter("k = 'a'").select(
        shuffle_key("k", epoch=11).alias("h")
    ).collect()[0].h
    assert k_a1_e1 != k_a_e11


def test_empty_input_ok(spark):
    """Empty corpora flow through (scheduled pipelines hit empty
    batches): shuffle yields 0 rows with the right schema, stats
    yields 0 shards."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = epoch_shuffle(empty, "doc_id", 4)
    assert out.count() == 0
    assert "shard" in out.columns and "shuffle_order" in out.columns
    assert shard_stats(out).count() == 0


def test_existing_shard_or_order_column_rejected(spark):
    # re-shuffling a frame that kept a previous epoch's assignment
    # must be explicit, not a silent withColumn overwrite
    import pytest

    from clustering_spark.operators.shuffling import epoch_shuffle

    df = spark.range(10).withColumnRenamed("id", "k").withColumn(
        "shard", F.lit(0)
    )
    with pytest.raises(ValueError, match="shard"):
        epoch_shuffle(df, "k", 4)
    ok = epoch_shuffle(df.drop("shard"), "k", 4)
    assert ok.count() == 10
