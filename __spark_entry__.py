"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship segment→scale→cluster→metrics pipeline on
sf0.001 (smoke). ``queries()`` / ``oracle_sql()`` — the operator
inventory from SURVEY.md §2 re-expressed Spark-first, with DuckDB
oracles for every SQL-expressible operator. Implementations live in
``clustering_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clustering_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Kept on the KMeans leg alone (q_cluster_kmeans, not the merged
    cluster_fit registry entry) so the smoke schema and cost stay
    stable across rounds."""
    from clustering_spark.queries import q_cluster_kmeans

    return q_cluster_kmeans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # csv_ingest's oracle reads a generated file; materialize it now so
    # the oracle is runnable even if the driver runs SQL before Spark
    from clustering_spark.queries import _write_ingest_csv

    _write_ingest_csv()
    return dict(ORACLES)
