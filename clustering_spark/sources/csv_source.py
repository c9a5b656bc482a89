"""CSV ingestion (SURVEY §1.1, S3/S4; reference preprocess.py:31-71).

The reference reads dirty CSV with ``inferSchema=True`` and survives
only because type demotion turns mixed columns into strings
(SURVEY §4.3.9). The engine's ingestion mode is the opposite: an
EXPLICIT schema + PERMISSIVE mode + ``columnNameOfCorruptRecord``, so
malformed rows are observable rows, not silent type changes.

At 100 TB this is also the performance-correct choice: inferSchema
costs an extra full scan of the data before the real one; an explicit
schema reads once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# FIXTURES.md §1 / reference data/daily_data.csv header — the container
# telemetry schema the reference pipeline ingests.
CONTAINER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("ram_usage", T.DoubleType(), True),
        T.StructField("cpu_percent", T.DoubleType(), True),
        T.StructField("node_id", T.StringType(), True),
        T.StructField("io_usage", T.DoubleType(), True),
        T.StructField("application_id", T.StringType(), True),
        T.StructField("ram_limit", T.DoubleType(), True),
        T.StructField("container_id", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("time", T.LongType(), True),
        T.StructField("network_usage", T.DoubleType(), True),
        T.StructField("pids", T.DoubleType(), True),
    ]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CONTAINER_STATS_SCHEMA,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Engine ingestion mode: explicit schema, PERMISSIVE, corrupt rows
    captured verbatim in ``corrupt_col`` (NULL for clean rows)."""
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("header", "true")
        # default enforceSchema=true SKIPS the header and binds columns
        # by POSITION — a producer writing the same columns in another
        # order would silently cross-map same-typed fields (cpu into
        # ram) with nothing landing in the corrupt column. false makes
        # Spark validate header names against the schema instead.
        .option("enforceSchema", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """Reference-parity mode (preprocess.py:57): header + inferSchema.
    Dirty rows silently demote column types — kept only for behavioral
    comparison; the engine path is ``read_csv``."""
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, corrupt raw records).

    Spark REQUIRES the scan to be cached before the corrupt column can
    be queried on its own (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN — column pruning would otherwise re-parse the file
    with a corrupt-only schema, under which nothing is corrupt). The
    cache is the documented pattern, scoped to the ingest batch; both
    branches share one parse of the file. A lazy localCheckpoint (not
    cache) backs the share: its storage is freed by the ContextCleaner
    when the returned frames are garbage-collected, so a long-lived
    session ingesting many batches does not accumulate pinned cache
    entries nobody can unpersist.

    DURABILITY TRADE (explicit): localCheckpoint TRUNCATES lineage, so
    on a multi-executor cluster a lost/preempted executor after
    materialization makes its partitions unrecomputable and fails the
    ingest job ('Checkpoint block not found') — where cache() would
    silently recompute from the file scan. On preemptible/spot fleets
    prefer re-running the (idempotent) ingest batch on failure, or
    swap in cache() + an explicit unpersist at the batch boundary.
    """
    df = df.localCheckpoint(eager=False)
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    corrupt = df.filter(F.col(corrupt_col).isNotNull())
    return clean, corrupt


def sample_cap(df: DataFrame, limit: int, seed: int = 42) -> DataFrame:
    """S4/T4: the reference's row cap (preprocess.py:59-63) — if the
    input exceeds ``limit`` rows, Bernoulli-sample down to ~limit.
    Differences from the reference, on purpose: the sample is SEEDED
    (reproducible runs; SURVEY §4.3.7). The count is one necessary
    action (same as the reference); output size is approximate, like
    ``df.sample`` itself."""
    n = df.count()
    if n <= limit:
        return df
    return df.sample(fraction=limit / n, seed=seed)
