"""Connected components over near-duplicate pair graphs
(beyond-reference scope): pairs are only EDGES — a dedup pipeline needs
GROUPS (one canonical doc kept per component, e.g. the classic
MinHash-cluster dedup stage of LLM corpus pipelines).

Algorithm: iterative hash-min label propagation. Every node starts
labelled with its own id; each round every node adopts the minimum
label among itself and its neighbors; at the fixpoint each component
carries its minimum member id as the component id. Rounds needed =
graph diameter (near-dup components are small and dense — single
digits in practice).

Scale design:
* each round is ONE shuffle pair (join edges⋈labels + groupBy dst) on
  (node, label) longs — never document payloads;
* lineage is cut per round with ``localCheckpoint`` — without it the
  plan doubles every iteration and the job dies by round ~15 (this is
  the standard iterative-algorithm pattern; the eager materialization
  is inherent to a driver-controlled fixpoint loop, unlike the
  mid-operator actions we avoid in single-pass operators);
* convergence is detected with a 1-row sum aggregate: labels only ever
  decrease, so an unchanged sum(label) IS the fixpoint — no
  full-column old-vs-new comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of its connected component.
    Undirected: edges are symmetrized. Raises if the fixpoint is not
    reached within ``max_iter`` rounds (pathological diameter — use a
    doubling scheme before raising the cap)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint()

    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        labels = (
            labels.join(prop, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def assign_components(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    out_col: str = "component",
) -> DataFrame:
    """Every row of ``df`` labelled with its component id; rows whose
    id appears in no edge are singletons (component = own id)."""
    return (
        df.join(components, df[id_col] == components.node, "left")
        .select(
            *df.columns,
            F.coalesce(F.col("comp"), F.col(id_col)).alias(out_col),
        )
    )


def dedup_by_component(
    df: DataFrame, id_col: str, components: DataFrame
) -> DataFrame:
    """The dedup stage: keep ONE row per component — the minimum id,
    i.e. the component id itself. Singletons survive unconditionally."""
    labelled = assign_components(df, id_col, components)
    return labelled.filter(F.col(id_col) == F.col("component")).drop("component")
