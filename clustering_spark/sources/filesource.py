"""File-lifecycle helpers (SURVEY S2/S11; reference preprocess.py:50-56
HDFS existence probe, cluster.py:292-308 post-run delete).

Both use the JVM Hadoop FileSystem through the active session, so the
same code serves local paths in the harness and HDFS/S3A URIs on a
cluster. The reference DELETES the consumed interval file (at-most-once
consumption); the engine default is the safer move-to-processed —
downstream reruns and audits keep the raw input.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hadoop_path, jvm


def source_exists(spark: SparkSession, path: str) -> bool:
    """S2: existence probe before reading (preprocess.py:50-56)."""
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def acknowledge(
    spark: SparkSession, path: str, processed_dir: str | None = None
) -> bool:
    """S11: consume the input exactly once. With ``processed_dir``,
    rename into it (engine default); without, delete (reference
    behavior, cluster.py:299-303). Returns success."""
    fs, p, jvm = _fs(spark, path)
    if not fs.exists(p):
        return False
    if processed_dir is None:
        return bool(fs.delete(p, False))
    dest_dir = jvm.org.apache.hadoop.fs.Path(processed_dir)
    if not fs.exists(dest_dir):
        fs.mkdirs(dest_dir)
    dest = jvm.org.apache.hadoop.fs.Path(processed_dir + "/" + p.getName())
    if fs.exists(dest):
        # Hadoop rename to an existing destination returns false, which
        # would leave the input in place FOREVER (every scan re-detects
        # and reprocesses it). Fixed-name interval files (daily.csv)
        # collide on every run — uniquify with a timestamp suffix.
        import time

        dest = jvm.org.apache.hadoop.fs.Path(
            f"{processed_dir}/{p.getName()}.{int(time.time() * 1000)}"
        )
    return bool(fs.rename(p, dest))
