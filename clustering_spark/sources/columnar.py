"""Columnar source/sink breadth beyond parquet (SURVEY §1.1 scope
extension): ORC natively, Avro behind an honest availability gate.

The reference ingests CSV only; a 100 TB lakehouse ingests whatever
the upstream teams already write. ORC ships inside Spark (same
vectorized reader, predicate pushdown and column pruning as parquet —
`spark.read.orc` / `df.write.orc`), so supporting it is contract,
not code. Avro requires the external spark-avro package, which this
container does not bake in — the reader probes for it and raises a
clear actionable error instead of Spark's opaque
FAILED_FIND_DATA_SOURCE stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """ORC scan; pass ``columns`` to prune at the reader (same
    ReadSchema pruning parquet gets — pinned in tests)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink with zstd (Spark 4 default-supported) — mirrors the
    compaction writer's parquet layout options."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro DATA SOURCE actually resolves. Probed
    through the real lookup path (a schema'd load of a nonexistent
    dir): a Class.forName ping can see stray avro classes on the
    driver classpath while the ServiceLoader-based source registry
    still can't resolve format 'avro' — the only check that matters
    is the one the read would perform."""
    try:
        spark.read.format("avro").schema("x int").load(
            "/nonexistent_avro_capability_probe"
        )
        return True  # unreachable path existed?! lookup succeeded anyway
    except Exception as e:
        return "Failed to find data source" not in str(e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — honest gate: spark-avro is an EXTERNAL package
    (org.apache.spark:spark-avro_2.13) not baked into this container,
    so absence raises a clear error naming the dependency instead of
    Spark's opaque data-source-lookup failure."""
    if not avro_available(spark):
        raise NotImplementedError(
            "Avro support needs the spark-avro package on the classpath "
            "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
            "it is not bundled in this environment"
        )
    return spark.read.format("avro").load(path)
