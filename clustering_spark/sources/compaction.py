"""Size-targeted parquet writer: the small-files / giant-files fix.

A 100 TB pipeline lives or dies on file sizing: a stage that ends with
10,000 shuffle partitions writes 10,000 files per partition directory
(NameNode pressure, open-file storms, per-file scheduling overhead on
every later scan), while a stage that coalesced too far writes 2 GB
row groups one task each (no scan parallelism, executor OOM on wide
rows). ``write_compacted`` sizes the file count from the data itself —
one cheap aggregate over the in-memory columnar size estimate — and
optionally range-sorts so downstream range-predicates prune files via
parquet min/max stats (the poor man's Z-order for one key). The size
estimate is an extra action over the frame's lineage — see the cost
note on ``write_compacted`` for when to persist upstream or pass
``n_files`` instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_bytes(df: DataFrame) -> int:
    """Uncompressed logical size estimate: sum of per-row column
    widths (fixed widths from the schema, measured lengths for
    strings/binaries/arrays). One narrow aggregate job — acceptable
    for a writer (the write itself is a full pass anyway); parquet
    compression then shrinks the files, so treat the target as
    pre-compression and size it generously."""
    # backtick-escaped refs (round-16 review): F.col parses dots as
    # struct paths, so a legal column named 'col.dotted' crashed the
    # sizing aggregate with UNRESOLVED_COLUMN
    def _q(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    acc = F.lit(0).cast("long")
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("tinyint", "boolean"):
            acc = acc + 1
        elif t == "smallint":
            acc = acc + 2
        elif t in ("int", "float", "date"):
            acc = acc + 4
        elif t in ("bigint", "double", "timestamp", "timestamp_ntz"):
            acc = acc + 8
        elif t == "string":
            acc = acc + F.coalesce(F.octet_length(_q(f.name)), F.lit(0)) + 4
        elif t == "binary":
            acc = acc + F.coalesce(F.octet_length(_q(f.name)), F.lit(0)) + 4
        elif t.startswith("array"):
            # element width is type-dependent; 8B/element covers the
            # numeric arrays this engine ships (embeddings, signatures).
            # size() is coalesced and floored INSIDE the product:
            # under non-ANSI configs size(NULL) is -1, not NULL, so
            # the old coalesce around the product never fired and
            # every null array contributed NEGATIVE bytes — a mostly-
            # null array column drove the whole estimate negative and
            # the plan to ONE giant file (round-16 review, verified)
            acc = (
                acc
                + F.greatest(
                    F.coalesce(F.size(_q(f.name)), F.lit(0)), F.lit(0)
                ) * 8
                + 4
            )
        else:  # structs/maps/decimals: flat 16B guess
            acc = acc + 16
    row = df.agg(F.sum(acc).alias("b")).collect()[0]
    return int(row.b or 0)


def plan_file_count(total_bytes: int, target_file_bytes: int) -> int:
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    return max(1, math.ceil(total_bytes / target_file_bytes))


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_col: str | None = None,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> int:
    """Write ``df`` as parquet with files sized toward
    ``target_file_bytes`` (pre-compression estimate). Returns the
    planned file count.

    COST NOTE: without ``n_files`` the sizing estimate is a full extra
    action over ``df``'s lineage — the frame's entire upstream pipeline
    runs twice (once to size, once to write). Cheap for a frame read
    straight off storage; for the tail of an expensive pipeline either
    ``persist()``/``localCheckpoint()`` upstream first, or pass
    ``n_files`` explicitly (e.g. from a known row count × row width)
    to skip the estimate pass entirely.

    - no ``sort_col``: round-robin ``repartition(n)`` — uniform file
      sizes regardless of input skew.
    - with ``sort_col``: ``repartitionByRange(n, col)`` +
      ``sortWithinPartitions`` — globally range-clustered files whose
      parquet min/max footer stats let any later range filter on that
      column skip whole files.
    - with ``partition_cols``: hive-style directory partitioning on
      top. The pre-write distribution must CLUSTER rows by the
      partition values: a plain round-robin repartition(n) would
      spread every directory value across all n tasks and emit up to
      n x #values tiny files — the explosion this writer exists to
      prevent. Without a sort_col the frame is hash-repartitioned on
      the partition columns (one task per value cluster: ~1 file per
      directory; a single huge value lands in one file — range-sort on
      the partition column when values are heavily skewed). With a
      sort_col, the range keys are (partition_cols..., sort_col) so
      the clustering property holds REGARDLESS of whether sort_col
      correlates with the directory layout (round 16; previously an
      uncorrelated sort_col silently re-created the tiny-file
      explosion).
    """
    if n_files is not None:
        if n_files < 1:
            raise ValueError(f"n_files must be >= 1, got {n_files}")
        n = n_files
    else:
        n = plan_file_count(estimate_bytes(df), target_file_bytes)
    def _q(name: str):
        return F.col("`" + name.replace("`", "``") + "`")

    if sort_col is not None:
        # range keys are PREFIXED with the partition columns when both
        # are given (round-16 review): ranging on sort_col alone with
        # an uncorrelated directory layout spread every partition
        # value across all n tasks — up to n x #values tiny files,
        # the explosion this writer exists to prevent. Prefixing keeps
        # each task inside few directory values while files stay
        # range-clustered (and min/max-prunable) on sort_col within
        # each directory.
        keys = [_q(c) for c in (partition_cols or [])] + [_q(sort_col)]
        out = df.repartitionByRange(n, *keys).sortWithinPartitions(
            *[c.asc() for c in keys]
        )
    elif partition_cols:
        out = df.repartition(n, *[_q(c) for c in partition_cols])
    else:
        out = df.repartition(n)
    w = out.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    return n
