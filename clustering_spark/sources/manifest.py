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
``Path.toString`` does not (so the SCAN side is decoded back to the
raw path characters and the LISTING side is used verbatim — decoding
the listing side too would corrupt on-disk names that legitimately
contain ``%XX``, e.g. Hive-style partition directories where Spark's
``escapePathName`` writes ``ts=00%3A00%3A00``), and the local file
scheme prints as ``file:/p`` from Path vs ``file:///p`` from the scan
(canonicalized to the three-slash empty-authority form; remote schemes
like hdfs/s3a print identically on both sides and pass through
untouched).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clustering_spark.sources.filesource import _fs

MANIFEST_SUBDIR = "_manifest"


def _fs_list_files(spark: SparkSession, path: str):
    """(path, bytes) for every data file under ``path`` via the Hadoop
    FileSystem API (works on any Hadoop-compatible FS, not just
    local). ``_``/``.``-prefixed entries are skipped — they are
    metadata (this manifest, _SUCCESS, streaming _spark_metadata), not
    data. No extension filter: the parquet SCAN reads every non-hidden
    file regardless of suffix (Hive/Impala writers emit extension-less
    part files like ``000000_0``), so the listing must mirror that or
    those files would get bytes=0 in the manifest."""
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
            else:
                out.append((st.getPath().toString(), st.getLen()))
    return out


def _norm_scan_uri(col: Column) -> Column:
    """Canonical join key for the SCAN side (``input_file_name()``):
    percent-decode (protecting literal '+', which URLDecoder would
    turn into a space), then collapse the local file scheme to the
    three-slash form. ``input_file_name`` percent-ENCODES every
    reserved byte of the on-disk name (a literal '%' becomes ``%25``,
    a space ``%20``), so decoding recovers exactly the raw path
    characters ``Path.toString()`` reports — including names that
    themselves contain literal ``%XX`` sequences (Hive partition
    escaping writes ``ts=00%3A00%3A00`` on disk, which the scan
    reports as ``00%253A...`` and this decode returns to
    ``00%3A...``). ``try_url_decode`` is belt-and-braces: if an
    engine ever emits a malformed escape the raw value passes through
    instead of nulling the join key."""
    protected = F.regexp_replace(col, r"\+", "%2B")
    decoded = F.coalesce(F.try_url_decode(protected), col)
    return _norm_file_scheme(decoded)


def _norm_file_scheme(col: Column) -> Column:
    """Collapse the EMPTY-AUTHORITY file-URI slash forms (``file:/p``,
    ``file:////p``) to canonical ``file:///p``. A non-empty authority
    (``file://host/p``) is left alone (round-16 review: the old
    ``file:/+`` rewrite folded the host into a leading path segment,
    splitting scan/listing join keys for host-addressed datasets)."""
    one = F.regexp_replace(col, r"^file:/(?!/)", "file:///")
    return F.regexp_replace(one, r"^file:///+", "file:///")


def _norm_list_uri(col: Column) -> Column:
    """Canonical join key for the LISTING side (``Path.toString()``):
    the value is already the raw path characters — decoding it would
    CORRUPT names containing literal ``%XX`` (the Hive-escape shape
    above decoded to ``:``, splitting every such file into two
    half-rows) — so only the file-scheme slash form is normalized."""
    return _norm_file_scheme(col)


def build_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest frame for the parquet dataset at ``path``: one row per
    file with (file, n_rows, bytes). One scan for the counts; counts
    use a metadata-only column so parquet footers satisfy the scan."""
    counts = (
        spark.read.parquet(path)
        .groupBy(_norm_scan_uri(F.input_file_name()).alias("file"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sizes = spark.createDataFrame(
        _fs_list_files(spark, path), "file string, bytes long"
    ).select(_norm_list_uri(F.col("file")).alias("file"), "bytes")
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
    try:
        current = build_manifest(spark, path)
    except AnalysisException:
        # the exact scenario this gate exists for: every data file is
        # gone, so the parquet reader can't even infer a schema. If the
        # listing confirms there are no data files, diff against an
        # empty current state (=> every manifested file reports
        # 'missing'); if files exist but the read still failed, that's
        # corruption, not absence — propagate it.
        if _fs_list_files(spark, path):
            raise
        current = spark.createDataFrame([], "file string, n_rows long, bytes long")
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
