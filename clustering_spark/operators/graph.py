"""Connected components over near-duplicate pair graphs
(beyond-reference scope): pairs are only EDGES — a dedup pipeline needs
GROUPS (one canonical doc kept per component, e.g. the classic
MinHash-cluster dedup stage of LLM corpus pipelines).

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
O(log n)-round replacement for hash-min label propagation, whose round
count is the graph DIAMETER. Near-dup graphs are usually shallow, but
quote-chains and boilerplate families at 100 TB can be arbitrarily
long paths; this converges on a path graph of n nodes in ~log2(n)
rounds where hash-min needs n rounds.

* large-star: every node u links each STRICTLY LARGER neighbor to
  m(u) = min(N(u) ∪ {u}) — long chains collapse toward small ids
  without ever creating an edge pointing "up".
* small-star: orient edges (big, small); every node u links its
  smaller neighbors AND ITSELF to m(u) — flattens local trees into
  stars.
At the fixpoint the edge set IS the component map: every non-minimum
node carries exactly one edge (node, component-min).

Scale design:
* each round is two groupBy-join passes over (long, long) edges —
  never document payloads; shuffle volume is O(|E|) per round and |E|
  shrinks monotonically toward one edge per non-root node;
* lineage is cut per round with ``localCheckpoint`` — without it the
  plan doubles every iteration (the standard iterative-algorithm
  pattern; the eager materialization is inherent to a
  driver-controlled fixpoint loop);
* convergence is detected EXACTLY: same edge count + empty anti-join
  against the previous round (two tiny jobs over checkpointed edges —
  no fingerprint-collision risk on a correctness-gated operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Emit (v, min(N(u) ∪ {u})) for every neighbor v > u."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    m = F.least(F.col("u"), F.col("mv"))
    return (
        sym.join(mins, on="u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient (big, small); emit (v, m) for v ∈ N(u) ∪ {u}, v ≠ m,
    where m = min(N(u) ∪ {u}) = min neighbor under the orientation."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of its connected component.
    Undirected; self-loops contribute their node but no linkage.
    Converges in O(log n) large-star/small-star rounds independent of
    graph diameter; ``max_iter`` is a defensive cap only."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = e.count()

    converged = prev_cnt == 0
    for _ in range(max_iter):
        if converged:
            break
        nxt = _small_star(_large_star(e)).localCheckpoint()
        cnt = nxt.count()
        # exact fixpoint test: equal cardinality + no edge outside the
        # previous set (both sets are distinct by construction)
        if cnt == prev_cnt and nxt.join(e, on=["u", "v"], how="left_anti").isEmpty():
            converged = True
        e, prev_cnt = nxt, cnt
    else:
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds"
            )

    # fixpoint edges are star edges (node -> component min); roots and
    # isolated/self-loop-only nodes label themselves
    star = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return (
        nodes.join(star, on="node", how="left")
        .select("node", F.coalesce(F.col("comp"), F.col("node")).alias("comp"))
    )


def assign_components(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    out_col: str = "component",
) -> DataFrame:
    """Every row of ``df`` labelled with its component id; rows whose
    id appears in no edge are singletons (component = own id).

    Raises on a name collision with ``out_col`` (e.g. re-labelling a
    frame that already came through assign_components): silently
    emitting two 'component' columns would make every downstream
    reference an AMBIGUOUS_REFERENCE error far from the cause. The
    join side's (node, comp) columns are renamed internally, so a df
    already carrying 'node'/'comp' columns is fine."""
    if out_col in df.columns:
        raise ValueError(
            f"df already has a {out_col!r} column — drop or rename it "
            "before assign_components"
        )
    comp = components.select(
        F.col("node").alias("__cc_node"), F.col("comp").alias("__cc_comp")
    )
    return (
        df.join(comp, df[id_col] == F.col("__cc_node"), "left")
        .select(
            *df.columns,
            F.coalesce(F.col("__cc_comp"), F.col(id_col)).alias(out_col),
        )
    )


def dedup_by_component(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    keep_label: str | None = None,
) -> DataFrame:
    """The dedup stage: keep ONE row per component — the minimum id
    PRESENT IN ``df``. The survivor is computed over the rows actually
    in ``df``, not assumed to be the component id: when the component-
    min doc was filtered out between pair generation and dedup (a
    quality/length gate in the middle of the chain), the next-smallest
    member survives instead of the whole component silently vanishing.
    Singletons survive unconditionally — including NULL-id rows: a
    NULL id can never appear in an edge (pair generators hash/compare
    non-null ids), so such rows are provably not duplicates of
    anything and pass through. (Without the explicit isNull branch
    they would be dropped silently: all NULL-id rows share the one
    NULL label, min() over that group is NULL, and NULL == NULL is
    NULL under SQL semantics — filtered, i.e. data loss one operator
    after every upstream guard deliberately preserved them.)

    "ONE row" holds even when ``df`` carries DUPLICATE ids (the same
    doc ingested twice with no exact-dedup upstream): survivor
    selection is ``row_number`` ordered by id, so ties at the
    component-minimum id keep exactly one row (which duplicate wins is
    arbitrary — they share the id — but the count is deterministic; a
    min-id filter instead kept every tied row, leaking duplicates
    through the dedup stage).

    ``keep_label`` (round-16 review) keeps the internal component
    label on the survivors under that column name instead of dropping
    it — callers that need survivors WITH their label (trainprep.
    media_survivors) previously re-joined the components frame via a
    second assign_components, a redundant full-width join."""
    from pyspark.sql import Window

    # internal label column: df may legitimately already carry a
    # 'component' column (e.g. the output of assign_components fed
    # through a gate) — dedup must still work on it unchanged
    labelled = assign_components(df, id_col, components, out_col="__cc_label")
    w = Window.partitionBy("__cc_label").orderBy(F.col(id_col).asc_nulls_last())
    kept = (
        labelled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col(id_col).isNull() | (F.col("__rn") == 1))
        .drop("__rn")
    )
    if keep_label is None:
        return kept.drop("__cc_label")
    if keep_label in df.columns:
        raise ValueError(
            f"df already has a {keep_label!r} column — drop or rename"
            " it before dedup_by_component(keep_label=...)"
        )
    return kept.withColumnRenamed("__cc_label", keep_label)
