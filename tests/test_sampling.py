"""hash_sample / hash_split: deterministic, partition-independent,
pushdown-friendly membership."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clustering_spark.operators.sampling import (
    hash_sample,
    hash_split,
    hash_topn_sample,
    stratified_hash_sample,
)


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


def test_stratified_per_stratum_fraction(spark):
    df = spark.range(20000).withColumn(
        "lang", F.when(F.col("id") % 4 == 0, "de").otherwise("en")
    )
    out = stratified_hash_sample(df, "id", "lang", {"en": 0.1, "de": 1.0})
    counts = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["de"] == 5000  # fraction 1.0 keeps the whole stratum
    assert 1200 < counts["en"] < 1800  # ~10% of 15000
    # per-stratum membership == plain hash_sample at that fraction
    en_only = hash_sample(df.filter("lang = 'en'"), "id", 0.1)
    assert sorted(r.id for r in out.filter("lang = 'en'").collect()) == sorted(
        r.id for r in en_only.collect()
    )


def test_stratified_unknown_stratum_default(spark):
    df = spark.range(1000).withColumn("s", F.lit("other"))
    assert stratified_hash_sample(df, "id", "s", {"en": 0.5}).count() == 0
    assert (
        stratified_hash_sample(
            df, "id", "s", {"en": 0.5}, default_fraction=1.0
        ).count()
        == 1000
    )


def test_topn_exact_and_stable(spark):
    df = spark.range(10000)
    s1 = sorted(r.id for r in hash_topn_sample(df, "id", 100).collect())
    assert len(s1) == 100
    s2 = sorted(
        r.id for r in hash_topn_sample(df.repartition(17), "id", 100).collect()
    )
    assert s1 == s2
    # growing the corpus only swaps members across the hash boundary:
    # the new sample is NOT disjoint from the old one
    s3 = sorted(
        r.id for r in hash_topn_sample(spark.range(20000), "id", 100).collect()
    )
    assert len(set(s1) & set(s3)) > 30


def test_plan_mixture_fractions(spark):
    from clustering_spark.operators.sampling import plan_mixture

    df = spark.createDataFrame(
        [(i, "web", 100) for i in range(100)]
        + [(i + 1000, "code", 100) for i in range(10)],
        "id long, src string, n_tok long",
    )
    plan = plan_mixture(df, "src", "n_tok", {"web": 2000, "code": 5000})
    assert abs(plan["web"] - 0.2) < 1e-9  # 10000 actual -> 2000 target
    assert plan["code"] == 1.0            # under budget -> keep all
    # absent stratum with a budget but no data -> keep-all is harmless
    plan2 = plan_mixture(df, "src", "n_tok", {"books": 100})
    assert plan2["books"] == 1.0


def test_apply_mixture_hits_budget(spark):
    from clustering_spark.operators.sampling import apply_mixture

    df = spark.range(5000).select(
        F.col("id"),
        F.lit("web").alias("src"),
        F.lit(100).alias("n_tok"),
    )
    out = apply_mixture(df, "id", "src", "n_tok", {"web": 100_000})
    kept = out.agg(F.sum("n_tok")).collect()[0][0]
    # 500k actual, 100k target -> fraction 0.2; doc-level hash noise
    assert 80_000 < kept < 120_000
    # unbudgeted strata are dropped
    df2 = df.union(
        spark.range(100).select(
            (F.col("id") + 10_000).alias("id"),
            F.lit("junk").alias("src"),
            F.lit(100).alias("n_tok"),
        )
    )
    out2 = apply_mixture(df2, "id", "src", "n_tok", {"web": 100_000})
    assert out2.filter("src = 'junk'").count() == 0


def test_fraction_one_keeps_every_row_incl_ffffffff(spark):
    """A keep-whole stratum must keep ALL rows — the old 'ffffffff'
    threshold dropped rows whose md5 prefix is exactly ffffffff. The
    threshold for 1.0 is now 'g', above every hex bucket."""
    from clustering_spark.operators.sampling import (
        _hex_threshold,
        stratified_hash_sample,
    )

    assert _hex_threshold(1.0) == "g"
    df = spark.createDataFrame(
        [(i, "keep") for i in range(500)], "k long, s string"
    )
    out = stratified_hash_sample(df, "k", "s", {"keep": 1.0})
    assert out.count() == 500


def test_null_keys_sample_and_split_deterministically(spark):
    """NULL keys must get ONE deterministic hash decision (the \\x00
    sentinel), not be silently dropped from samples / shunted into the
    last split."""
    from clustering_spark.operators.sampling import hash_sample, hash_split

    df = spark.createDataFrame(
        [(str(i),) for i in range(200)] + [(None,)] * 4, "k string"
    )
    kept = hash_sample(df, "k", 0.999, salt="s")
    n_null_kept = kept.filter("k IS NULL").count()
    assert n_null_kept in (0, 4)  # one decision for the class
    # at 0.999 the sentinel hash keeps them (and deterministically so)
    again = hash_sample(df, "k", 0.999, salt="s").filter("k IS NULL").count()
    assert again == n_null_kept

    splits = hash_split(df, "k", {"a": 0.5, "b": 0.5}, salt="s")
    labels = {r.split for r in splits.filter("k IS NULL").collect()}
    assert len(labels) == 1  # all NULLs together, wherever they hash


def test_stratified_sample_can_target_null_stratum(spark):
    # fractions={None: 1.0} must keep every NULL-stratum row; the old
    # `strata == lit(None)` branch was never true, so they all fell to
    # the default fraction (0.0) and were silently dropped
    from clustering_spark.operators.sampling import stratified_hash_sample

    df = spark.createDataFrame(
        [(i, None if i % 2 else "en") for i in range(200)],
        "id long, lang string",
    )
    kept = stratified_hash_sample(
        df, "id", "lang", fractions={None: 1.0}, default_fraction=0.0
    ).collect()
    assert len(kept) == 100
    assert all(r.lang is None for r in kept)
    # and a fraction for a real stratum still composes with it
    both = stratified_hash_sample(
        df, "id", "lang", fractions={None: 1.0, "en": 1.0}, default_fraction=0.0
    )
    assert both.count() == 200


def test_composed_stages_need_distinct_salts(spark):
    """Round-16 review: every operator here reads the SAME
    md5(key||salt) bucket, so a sample composed with a split at the
    SAME salt is fully correlated — every survivor of
    hash_sample(0.5) sits below train's 0.9 threshold, so val/test
    come back EMPTY. Distinct salts decorrelate. This pins the
    documented hazard (module docstring) in executable form."""
    df = spark.range(400).withColumnRenamed("id", "k")
    sampled = hash_sample(df, "k", 0.5)
    same = hash_split(
        sampled, "k", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    labels_same = {r.split for r in same.select("split").distinct().collect()}
    assert labels_same == {"train"}  # the correlated trap, pinned
    salted = hash_split(
        sampled, "k", {"train": 0.9, "val": 0.05, "test": 0.05},
        salt="stage2",
    )
    labels = {r.split for r in salted.select("split").distinct().collect()}
    assert labels == {"train", "val", "test"}


def test_plan_mixture_null_weights_refused_zero_target_drops(spark):
    """Round-16 review: NULL weights silently bypassed the budget
    (sum skips them; all-NULL read as 'keep whole'). They now raise;
    an explicit zero budget yields fraction 0.0."""
    from clustering_spark.operators.sampling import plan_mixture

    ok = spark.createDataFrame(
        [("web", 10.0), ("web", 10.0), ("code", 5.0)],
        "src string, w double",
    )
    plan = plan_mixture(ok, "src", "w", {"web": 5.0, "code": 0.0})
    assert plan["web"] == 0.25 and plan["code"] == 0.0
    nulls = spark.createDataFrame(
        [("web", None), ("web", 10.0)], "src string, w double"
    )
    with pytest.raises(ValueError, match="NULL 'w'"):
        plan_mixture(nulls, "src", "w", {"web": 5.0})


def test_split_rejects_out_of_range_fractions_and_collisions(spark):
    """Round-16 review: {'a': 1.1, 'b': -0.1} sums to 1 but silently
    labelled every row 'a'; an existing out_col was silently
    reassigned. Both now raise."""
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="out of"):
        hash_split(df, "k", {"a": 1.1, "b": -0.1})
    labelled = hash_split(df, "k", {"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match="already exists"):
        hash_split(labelled, "k", {"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match="out of"):
        stratified_hash_sample(df, "k", "k", {0: 1.5})
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_hash_sample(df, "k", "k", {}, default_fraction=-0.2)


def test_cap_per_group_refuses_rn_collision(spark):
    from clustering_spark.operators.sampling import cap_per_group

    df = spark.range(10).select(
        F.col("id").alias("k"), F.lit("g").alias("grp"),
        F.lit(1).alias("__rn"),
    )
    with pytest.raises(ValueError, match="__rn"):
        cap_per_group(df, "grp", "k", 3)
