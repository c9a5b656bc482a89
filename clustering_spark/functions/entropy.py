"""Shannon entropy of group-size distributions.

Reference (metrics.py:113-137) launches k+1 Spark jobs per segment —
one ``where(prediction==c).count()`` per cluster plus the total. Here
entropy is a single aggregation pipeline:

    groupBy(keys, prediction).count()          -- partial-aggregated
    groupBy(keys).agg(-sum(p * log2(p)))       -- tiny second stage

which is O(1) jobs regardless of k, and map-side combines at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shannon_entropy_agg(count_col: Column | str = "count") -> Column:
    """Aggregate expression: entropy (base 2) of the distribution whose
    per-group sizes are in ``count_col``. Use after a first-level
    groupBy(...).count(). -p*log2(p) with the 0*log(0)=0 convention."""
    c = F.col(count_col) if isinstance(count_col, str) else count_col
    total = F.sum(c)
    # sum(c*log2(c))/total - log2(total) == sum(p*log2(p)); negate.
    plogp = F.sum(c.cast("double") * F.log2(c.cast("double")))
    ent = -(plogp / total - F.log2(total))
    # single group (p==1) -> -(log2(n)-log2(n)) == -0.0; normalize sign
    return F.abs(ent)


def group_entropy(
    df: DataFrame, segment_cols: list[str], label_col: str, out_col: str = "entropy"
) -> DataFrame:
    """Per-segment entropy of the label distribution, one pass."""
    sizes = df.groupBy(*segment_cols, label_col).count()
    return sizes.groupBy(*segment_cols).agg(
        shannon_entropy_agg("count").alias(out_col)
    )
