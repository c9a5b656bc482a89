"""Input sources: explicit-schema PERMISSIVE CSV ingestion (S3) and
file-lifecycle helpers (S2 existence probe, S11 acknowledgment)."""

from clustering_spark.sources.csv_source import (  # noqa: F401
    CONTAINER_STATS_SCHEMA,
    read_csv,
    read_csv_inferred,
    sample_cap,
    split_corrupt,
)
from clustering_spark.sources.filesource import (  # noqa: F401
    acknowledge,
    source_exists,
)
