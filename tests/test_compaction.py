"""Compacted-writer behavior: file count tracks the size target,
round-trip fidelity, range-sorted file pruning stats, and hive
partitioning composition.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from clustering_spark.sources import compaction

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def _files(path):
    return [
        f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]


def test_estimate_bytes_sane(spark, lineitem):
    est = compaction.estimate_bytes(lineitem)
    n = lineitem.count()
    # lineitem rows are ~100-200 logical bytes
    assert est > n * 50 and est < n * 1000


def test_file_count_tracks_target(spark, lineitem, tmp_path):
    est = compaction.estimate_bytes(lineitem)
    target = est // 4 + 1
    n = compaction.write_compacted(lineitem, str(tmp_path / "a"), target)
    assert n == 4
    assert len(_files(str(tmp_path / "a"))) == 4
    back = spark.read.parquet(str(tmp_path / "a"))
    assert back.count() == lineitem.count()


def test_single_file_when_target_large(spark, lineitem, tmp_path):
    n = compaction.write_compacted(
        lineitem, str(tmp_path / "b"), 10 * 1024 * 1024 * 1024
    )
    assert n == 1
    assert len(_files(str(tmp_path / "b"))) == 1


def test_range_sorted_files_disjoint(spark, lineitem, tmp_path):
    est = compaction.estimate_bytes(lineitem)
    compaction.write_compacted(
        lineitem, str(tmp_path / "c"), est // 4 + 1, sort_col="l_orderkey"
    )
    spark_ = lineitem.sparkSession
    ranges = []
    for f in _files(str(tmp_path / "c")):
        r = (
            spark_.read.parquet(f)
            .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
            .collect()[0]
        )
        if r.lo is not None:
            ranges.append((r.lo, r.hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # files cover disjoint key ranges -> pruning works


def test_hive_partitioning(spark, tmp_path):
    df = spark.range(1000).withColumn("part", (F.col("id") % 3).cast("int"))
    compaction.write_compacted(
        df, str(tmp_path / "d"), 1 << 30, partition_cols=["part"]
    )
    dirs = sorted(os.listdir(str(tmp_path / "d")))
    assert [d for d in dirs if d.startswith("part=")] == [
        "part=0", "part=1", "part=2"
    ]


def test_bad_target_raises(spark, lineitem):
    with pytest.raises(ValueError):
        compaction.plan_file_count(100, 0)


def test_partitioned_write_clusters_files_per_directory(spark, tmp_path):
    """partition_cols without sort_col must cluster rows by the
    partition values before the hive write — round-robin would emit
    (tasks x values) tiny files."""
    import os

    from clustering_spark.sources.compaction import write_compacted

    df = (
        spark.range(4000)
        .withColumn("date", (F.col("id") % 4).cast("string"))
        .withColumn("payload", F.concat(F.lit("x" * 100), F.col("id")))
    )
    out = str(tmp_path / "ds")
    write_compacted(
        df, out, target_file_bytes=10_000_000, partition_cols=["date"]
    )
    for d in range(4):
        files = [
            f
            for f in os.listdir(os.path.join(out, f"date={d}"))
            if f.endswith(".parquet")
        ]
        assert len(files) <= 2, f"date={d} fragmented into {len(files)} files"


def test_explicit_n_files_skips_estimate(spark, tmp_path):
    # callers with expensive lineage pass n_files to avoid the sizing
    # pass running the whole pipeline twice
    from clustering_spark.sources.compaction import write_compacted

    p = str(tmp_path / "nf")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    n = write_compacted(df, p, n_files=3)
    assert n == 3
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 3
    import pytest

    with pytest.raises(ValueError, match="n_files"):
        write_compacted(df, p, n_files=0)


class TestRound16CompactionReview:
    def test_null_arrays_never_shrink_the_estimate(self, spark):
        """Round-16 review (verified live): under non-ANSI configs
        size(NULL) is -1, not NULL, so the old coalesce-around-the-
        product never fired and every null array contributed -4
        bytes — a mostly-null array column planned ONE giant file.
        The size() result is now floored inside the product."""
        df = spark.createDataFrame(
            [(i, None) for i in range(10)],
            "id long, emb array<double>",
        )
        old = spark.conf.get("spark.sql.ansi.enabled")
        try:
            spark.conf.set("spark.sql.ansi.enabled", "false")
            est_legacy = compaction.estimate_bytes(df)
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)
        est_ansi = compaction.estimate_bytes(df)
        # 8B id + 4B array overhead per row, both modes, never negative
        assert est_legacy == est_ansi == 120

    def test_dotted_column_names_size_and_write(self, spark, tmp_path):
        """Round-16 review (verified live): F.col parses dots as
        struct paths, so a column named 'col.dotted' crashed the
        sizing aggregate. Backticked refs fix sizing AND the
        range-write path."""
        df = spark.createDataFrame(
            [("abc", 1), ("defg", 2)], "`col.dotted` string, `k.x` int"
        )
        assert compaction.estimate_bytes(df) > 0
        out = str(tmp_path / "dotted")
        n = compaction.write_compacted(df, out, sort_col="k.x")
        assert n >= 1
        back = spark.read.parquet(out)
        assert sorted(r["col.dotted"] for r in back.collect()) == [
            "abc", "defg",
        ]

    def test_uncorrelated_sort_with_partitions_stays_clustered(
        self, spark, tmp_path
    ):
        """Round-16 review: ranging on sort_col alone with hive
        partition_cols spread every directory value across all n
        tasks (n x #values tiny files). The range keys are now
        (partition_cols..., sort_col): file count stays near one per
        directory even when sort_col is uncorrelated."""
        import glob as _glob

        rows = [(i, f"r{i % 4}", (i * 7919) % 1000) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, region string, ts long")
        out = str(tmp_path / "parts")
        compaction.write_compacted(
            df, out, n_files=8, sort_col="ts",
            partition_cols=["region"],
        )
        files = _glob.glob(f"{out}/region=*/*.parquet")
        # old behavior: up to 8 tasks x 4 regions = 32 files; new:
        # each range task sits inside ~one region
        assert len(files) <= 12, len(files)
        back = spark.read.parquet(out)
        assert back.count() == 400
