"""One-pass table profiling: the data-quality report a pipeline runs
on every new corpus drop before anything else touches it.

Everything folds into a SINGLE aggregation over a single scan — at
100 TB the profile costs exactly one pass regardless of column count
(per-column jobs would cost one scan each). Distinct counts are
HyperLogLog++ (``approx_count_distinct``) — exact distincts would add
a shuffle per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, null_frac,
    approx_distinct, min, max). min/max are stringified so every
    column type fits one report schema. Size-based min/max stand in
    for value order where it doesn't exist: arrays report element
    count, binary reports byte length; approx_distinct covers arrays
    and binary too (HLL hashes the value), while structs and maps
    report NULL for all three (no cheap one-pass size, and maps are
    unhashable — documented, not a bug).

    The frame is first renamed POSITIONALLY (``toDF`` with synthetic
    names, report labels keep the originals): messy corpus headers are
    exactly what this report runs on first, and name-based references
    break on them twice over — ``F.col('cpu.percent')`` parses the dot
    as nested-field access, and a repeated header (duplicate column
    names after a CSV re-read or a sloppy join) makes ANY name
    reference an AMBIGUOUS_REFERENCE error."""
    names = [f.name for f in df.schema.fields]
    safe = df.toDF(*[f"__c{i}" for i in range(len(names))])
    aggs = []
    for i, f in enumerate(safe.schema.fields):
        c = F.col(f.name)
        t = f.dataType.simpleString()
        if t.startswith(("array", "struct", "map")) or t == "binary":
            lo = F.min(F.size(c)) if t.startswith("array") else F.min(F.octet_length(c)) if t == "binary" else F.lit(None)
            hi = F.max(F.size(c)) if t.startswith("array") else F.max(F.octet_length(c)) if t == "binary" else F.lit(None)
            distinct = (
                F.approx_count_distinct(c, rsd)
                if t.startswith("array") or t == "binary"
                else F.lit(None).cast("long")
            )
        else:
            lo, hi = F.min(c), F.max(c)
            distinct = F.approx_count_distinct(c, rsd)
        aggs += [
            F.count(c).alias(f"__nn_{i}"),
            distinct.alias(f"__d_{i}"),
            lo.cast("string").alias(f"__lo_{i}"),
            hi.cast("string").alias(f"__hi_{i}"),
        ]
    row = safe.agg(F.count(F.lit(1)).alias("__n"), *aggs)

    # unpivot the single wide row into one report row per column —
    # driver never sees the data, only the 1-row aggregate result
    cols = []
    for i, name in enumerate(names):
        cols.append(
            F.struct(
                F.lit(name).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
                F.when(
                    F.col("__n") > 0,
                    F.round(
                        (F.col("__n") - F.col(f"__nn_{i}"))
                        / F.col("__n").cast("double"),
                        6,
                    ),
                )
                .otherwise(0.0)
                .alias("null_frac"),
                F.col(f"__d_{i}").alias("approx_distinct"),
                F.col(f"__lo_{i}").alias("min"),
                F.col(f"__hi_{i}").alias("max"),
            )
        )
    return row.select(F.explode(F.array(*cols)).alias("p")).select("p.*")
