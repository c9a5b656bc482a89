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

The ``file`` column stores the FULL resolvable URI (consumers must be
able to open it). Two normalizations reconcile the scan side with the
listing side: ``input_file_name`` percent-encodes URIs while
``Path.toString`` does not (decoded, with ``+`` protected — file URIs
never use ``+`` for space), and the local file scheme prints as
``file:/p`` from Path vs ``file:///p`` from the scan (canonicalized to
the three-slash empty-authority form; remote schemes like hdfs/s3a
print identically on both sides and pass through untouched).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clustering_spark.sources.filesource import _fs

MANIFEST_SUBDIR = "_manifest"


def _fs_list_files(spark: SparkSession, path: str):
    """(path, bytes) for every data file under ``path`` via the Hadoop
    FileSystem API (works on any Hadoop-compatible FS, not just
    local). ``_``/``.``-prefixed entries are skipped — they are
    metadata (this manifest, _SUCCESS, streaming _spark_metadata), not
    data."""
    fs, jpath, _ = _fs(spark, path)
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


def _norm_uri(col: Column) -> Column:
    """Canonical full-URI join key (module docstring): percent-decode
    (protecting literal '+', which URLDecoder would turn into a
    space), then collapse the local file scheme to the three-slash
    form. Non-file schemes keep their authority untouched.

    The decode uses ``try_url_decode`` with a raw-string fallback: the
    listing side feeds RAW ``Path.toString()`` values, and a filename
    containing a bare '%' that isn't a valid %XX escape (e.g.
    ``report 50%.parquet``) is a malformed URL — a plain ``url_decode``
    would throw and break the whole manifest for that dataset. On
    decode failure the raw path is used verbatim, which matches the
    scan side: ``input_file_name()`` percent-ENCODES the bare '%'
    (``%25``), so its decode succeeds and yields the same raw
    characters the listing fallback kept. (Residual
    caveat: a filename that is itself a VALID %XX sequence taken
    literally decodes differently on the two sides — unresolvable
    without replicating Hadoop's exact encoder, and not a shape real
    ingest pipelines emit.)"""
    protected = F.regexp_replace(col, r"\+", "%2B")
    decoded = F.coalesce(F.try_url_decode(protected), col)
    return F.regexp_replace(decoded, r"^file:/+", "file:///")


def build_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest frame for the parquet dataset at ``path``: one row per
    file with (file, n_rows, bytes). One scan for the counts; counts
    use a metadata-only column so parquet footers satisfy the scan."""
    counts = (
        spark.read.parquet(path)
        .groupBy(_norm_uri(F.input_file_name()).alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sizes = spark.createDataFrame(
        _fs_list_files(spark, path), "file string, bytes long"
    ).select(_norm_uri(F.col("file")).alias("file"), "bytes")
    # outer join: a file missing from either side is itself a finding
    # (0-row file, or a file the scan saw that listing didn't)
    return counts.join(sizes, on="file", how="full").select(
        "file",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("bytes", F.lit(0)).alias("bytes"),
    )


def write_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Build and persist the manifest under ``path/_manifest`` (single
    small parquet file — #files rows). Returns the STORED manifest
    (read back from the written file), so evaluating the return value
    costs one tiny read — never a second full-dataset scan."""
    build_manifest(spark, path).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{MANIFEST_SUBDIR}"
    )
    return read_manifest(spark, path)


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
