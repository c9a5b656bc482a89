"""Output manifests for parquet datasets (beyond-reference scope; the
reference's only "sink bookkeeping" is a Mongo upsert of one document,
cluster.py:176-235 — nothing records what files a run produced).

A 100 TB pipeline hands its output to OTHER systems (training readers,
downstream Spark jobs, replication). Those consumers need an authori-
tative answer to "which files make up this dataset and how many rows
should each contain" that does not depend on re-listing the directory
and hoping no partial write is lying around. The manifest is that
answer: one row per data file with its row count and byte size,
written UNDER the dataset as ``_manifest`` — Spark's scan layer
ignores ``_``-prefixed paths, so the dataset stays readable as plain
parquet while carrying its own inventory.

Row counts come from ONE distributed scan grouped by
``input_file_name()`` (no per-file driver loop — the file count can be
large); byte sizes come from a driver-side Hadoop FileSystem listing
(#files rows, bounded, and listing is the operation being notarized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SUBDIR = "_manifest"


def _fs_list_files(spark: SparkSession, path: str):
    """(path, bytes) for every data file under ``path`` via the Hadoop
    FileSystem API (works on any Hadoop-compatible FS, not just
    local). ``_``/``.``-prefixed entries are skipped — they are
    metadata (this manifest, _SUCCESS, streaming _spark_metadata), not
    data."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    stack = [jpath]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            elif name.endswith(".parquet"):
                out.append((st.getPath().toString(), st.getLen()))
    return out


def _norm_path(col):
    """Normalize a file URI to a bare path so the scan side
    (``input_file_name`` → ``file:///a/b``) and the listing side
    (Hadoop ``Path.toString`` → ``file:/a/b``) join on equal keys."""
    return F.regexp_replace(col, r"^[a-zA-Z0-9.+-]+:/+", "/")


def build_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest frame for the parquet dataset at ``path``: one row per
    file with (file, n_rows, bytes). One scan for the counts; counts
    use a metadata-only column so parquet footers satisfy the scan."""
    counts = (
        spark.read.parquet(path)
        .groupBy(_norm_path(F.input_file_name()).alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sizes = spark.createDataFrame(
        _fs_list_files(spark, path), "file string, bytes long"
    ).select(_norm_path(F.col("file")).alias("file"), "bytes")
    # outer join: a file missing from either side is itself a finding
    # (0-row file, or a file the scan saw that listing didn't)
    return counts.join(sizes, on="file", how="full").select(
        "file",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("bytes", F.lit(0)).alias("bytes"),
    )


def write_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Build and persist the manifest under ``path/_manifest`` (single
    small parquet file — #files rows). Returns the manifest frame."""
    m = build_manifest(spark, path)
    m.coalesce(1).write.mode("overwrite").parquet(f"{path}/{MANIFEST_SUBDIR}")
    return m


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{MANIFEST_SUBDIR}")


def verify_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Diff the stored manifest against the dataset's CURRENT state.
    Empty result = dataset intact. Non-empty rows carry a ``problem``
    label: 'missing' (manifested file gone), 'unexpected' (file not in
    the manifest — e.g. a stray partial write), 'changed' (row count
    or size drifted). This is the consumer-side integrity gate to run
    before trusting a handed-over dataset."""
    stored = read_manifest(spark, path).select(
        "file",
        F.col("n_rows").alias("m_rows"),
        F.col("bytes").alias("m_bytes"),
    )
    current = build_manifest(spark, path)
    j = stored.join(current, on="file", how="full")
    return j.select(
        "file",
        F.when(F.col("n_rows").isNull(), F.lit("missing"))
        .when(F.col("m_rows").isNull(), F.lit("unexpected"))
        .when(
            (F.col("n_rows") != F.col("m_rows"))
            | (F.col("bytes") != F.col("m_bytes")),
            F.lit("changed"),
        )
        .alias("problem"),
        F.col("m_rows"),
        F.col("n_rows"),
        F.col("m_bytes"),
        F.col("bytes"),
    ).filter(F.col("problem").isNotNull())
