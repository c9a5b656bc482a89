"""Physical-plan introspection: parse ``explain('formatted')`` output
so tests can PIN the plan properties the scale design relies on —
filters reaching the parquet scan, dims broadcast not shuffled, no
surprise extra exchanges. A correctness-green query with a wrong plan
is a 100 TB incident waiting; these checks fail it in CI instead.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_tree(df: DataFrame) -> str:
    """Only the operator TREE of the formatted plan. The details
    section below it repeats every node name, so counting over the
    full text double-counts operators."""
    plan = formatted_plan(df)
    cut = re.search(r"\n\n\(\d+\)", plan)
    return plan[: cut.start()] if cut else plan


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators in the physical plan. AQE may
    later coalesce partitions, but every Exchange is a
    materialization barrier and a wire transfer."""
    return len(re.findall(r"\bExchange\b", plan_tree(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters the parquet/CSV scan accepted (``PushedFilters``)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_schema_columns(df: DataFrame) -> list[list[str]]:
    """Per scan: the columns actually read (``ReadSchema``) — column
    pruning evidence. A 2-column projection reading 16 columns fails
    review."""
    plan = formatted_plan(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    plan = plan_tree(df)
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )


def exchange_blocks(df: DataFrame) -> list[str]:
    """Detail blocks of every Exchange / BroadcastExchange node (its
    Input/Arguments lines) — lets tests pin WHAT crosses each wire,
    not just how many wires exist."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(
        r"\(\d+\) (?:Broadcast)?Exchange\n((?:.+\n)+?)\n", plan + "\n\n"
    ):
        out.append(m.group(1))
    return out
