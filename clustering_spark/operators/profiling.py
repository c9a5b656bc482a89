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
    count, binary reports byte length; structs and maps report NULL
    (no cheap one-pass size exists — documented, not a bug).

    Column references are backtick-quoted and internal aliases are
    INDEX-based: an unquoted ``F.col('cpu.percent')`` parses the dot
    as nested-field access, breaking the report on flattened-JSON-
    style headers — the exact corpora this report runs on first."""
    aggs = []
    names = []
    for i, f in enumerate(df.schema.fields):
        c = F.col("`" + f.name.replace("`", "``") + "`")
        t = f.dataType.simpleString()
        if t.startswith(("array", "struct", "map")) or t == "binary":
            lo = F.min(F.size(c)) if t.startswith("array") else F.min(F.octet_length(c)) if t == "binary" else F.lit(None)
            hi = F.max(F.size(c)) if t.startswith("array") else F.max(F.octet_length(c)) if t == "binary" else F.lit(None)
            distinct = F.lit(None).cast("long")
        else:
            lo, hi = F.min(c), F.max(c)
            distinct = F.approx_count_distinct(c, rsd)
        aggs += [
            F.count(c).alias(f"__nn_{i}"),
            distinct.alias(f"__d_{i}"),
            lo.cast("string").alias(f"__lo_{i}"),
            hi.cast("string").alias(f"__hi_{i}"),
        ]
        names.append(f.name)
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)

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
