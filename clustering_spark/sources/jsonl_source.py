"""JSONL (newline-delimited JSON) document ingestion — the de-facto
wire format of web-scale text corpora (one document object per line).

Same ingestion doctrine as csv_source: EXPLICIT schema + PERMISSIVE +
``columnNameOfCorruptRecord``, so truncated/malformed lines become
observable rows instead of silent drops, and the file is parsed once
(schema inference over JSON costs a full extra scan and types drift
with whatever the sampled lines happened to contain).

100 TB notes: json lines split cleanly on newlines, so the source is
fully splittable (unlike multiline JSON, which is one-task-per-file —
``multiLine`` is deliberately NOT exposed here); compression should be
a splittable codec (zstd with seekable frames / bzip2) or files sized
to one task each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from clustering_spark.sources.csv_source import CORRUPT_COL, split_corrupt

# The engine's document-corpus wire schema: matches the testdata
# documents table (id, text + provenance fields commonly present in
# public corpus dumps).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """One parse, malformed lines captured verbatim in ``corrupt_col``
    (NULL for clean rows). Use csv_source.split_corrupt (re-exported
    here) to fork clean/corrupt branches off the single parse."""
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


__all__ = ["DOCUMENT_SCHEMA", "read_jsonl", "split_corrupt"]
