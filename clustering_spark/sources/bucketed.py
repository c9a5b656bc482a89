"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated big-big equi-join (fact ⋈
fact, or fact ⋈ large dim) is re-shuffling both sides on the join key
every query. Spark's bucketed tables pre-shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and a join between
two tables bucketed on the same key with the same bucket count reads
co-located buckets directly — the plan contains NO Exchange on either
side (pinned by tests/test_bucketed.py).

Bucketing lives at the catalog layer (``saveAsTable``), not plain
``parquet(path)`` — Spark needs the table metadata to trust the file
layout. ``write_bucketed`` writes an EXTERNAL table (explicit
``path``) so data files sit where the caller says and dropping the
table never deletes data silently.

Sizing rule of thumb: pick ``n_buckets`` so a bucket of the LARGER
table is ~128-512 MB (one task's comfortable working set); both sides
must use the SAME count — Spark does not coalesce mismatched buckets
(a 4-vs-8 bucket join shuffles one side again).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external bucketed table. ``sort_cols``
    additionally sorts within each bucket file, upgrading downstream
    joins to shuffle-free AND sort-free sort-merge joins."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry (external table: data files remain).
    Each dot-separated part is backtick-quoted: write_bucketed happily
    creates names like 'events-2026' through the DataFrameWriter API,
    which unquoted SQL then fails to parse."""
    quoted = ".".join(
        "`" + part.replace("`", "``") + "`" for part in table.split(".")
    )
    spark.sql(f"DROP TABLE IF EXISTS {quoted}")
