"""Physical-plan audit helpers — assertions for the properties the
100 TB design depends on (pushdown, broadcast, shuffle counts)."""

from clustering_spark.plans.audit import (  # noqa: F401
    count_shuffles,
    exchange_blocks,
    formatted_plan,
    join_strategies,
    plan_tree,
    pushed_filters,
    scan_schema_columns,
)
