"""Soundness guard for the hop-doubled closure oracles (round-13
advisor finding): SQL_NEARDUP_COMPONENTS closes paths up to
NGRAM_CLOSURE_HOPS edges and the SemDeDup oracle up to
SEMANTIC_CLOSURE_HOPS — correct ONLY while every component's min
node reaches all members within that budget on the gate corpora.
That bound was measured once on today's fixed corpora; if the
testdata is ever regenerated or grown, a longer-diameter component
would make the ORACLE wrong and report a correct Spark result as a
gate failure. This test recomputes the actual min-node eccentricity
per corpus from the SAME edge SQL the oracles use (shared constants,
so the guard cannot drift from the oracle), failing with a clear
message instead of an opaque hash mismatch.

Pure DuckDB + Python BFS — no Spark session, runs in seconds.
"""

from __future__ import annotations

import os
from collections import defaultdict, deque

import duckdb
import pytest

from clustering_spark.queries import (
    NGRAM_CLOSURE_HOPS,
    SEMANTIC_CLOSURE_HOPS,
    SQL_NGRAM_JACCARD,
    SQL_SEMANTIC_PAIRS,
    _pinned_cells_cte,
)

_BASE = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
_SF_DIRS = [
    d
    for d in (f"{_BASE}/sf0.001", f"{_BASE}/sf0.01")
    if os.path.isdir(d)
]
# the sf0.1 corpus is covered by the 10x checkpoint sweep; opt in
# here (several extra minutes of DuckDB shingling) via env
if os.environ.get("HOP_GUARD_SF01") and os.path.isdir(f"{_BASE}/sf0.1"):
    _SF_DIRS.append(f"{_BASE}/sf0.1")


def _min_node_eccentricity(edges: list[tuple]) -> tuple[int, int]:
    """(worst eccentricity-of-min-node, largest component size) over
    the undirected graph. The closure oracle labels node u with
    least(min reachable, u), so it is exact iff every node reaches
    its component's min node within the hop budget — i.e. the min
    node's eccentricity is <= budget in every component."""
    adj: dict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen: set = set()
    worst_ecc = 0
    biggest = 0
    for start in adj:
        if start in seen:
            continue
        comp = {start}
        q = deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    q.append(v)
        seen |= comp
        biggest = max(biggest, len(comp))
        m = min(comp)
        dist = {m: 0}
        q = deque([m])
        ecc = 0
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    ecc = max(ecc, dist[v])
                    q.append(v)
        worst_ecc = max(worst_ecc, ecc)
    return worst_ecc, biggest


def _edges(sf_dir: str, table: str, pairs_sql: str) -> list[tuple]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf_dir}/{table}.parquet')"
    )
    return con.execute(pairs_sql).fetchall()


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_ngram_closure_hop_budget_holds(sf_dir):
    edges = _edges(
        sf_dir,
        "documents",
        f"WITH pairs AS MATERIALIZED ({SQL_NGRAM_JACCARD}) "
        "SELECT id_a, id_b FROM pairs",
    )
    ecc, biggest = _min_node_eccentricity(edges)
    assert ecc <= NGRAM_CLOSURE_HOPS, (
        f"{sf_dir}: a near-dup component needs {ecc} hops to carry "
        f"its min label but SQL_NEARDUP_COMPONENTS only closes "
        f"{NGRAM_CLOSURE_HOPS} (largest component {biggest} nodes). "
        f"The ORACLE is now wrong for this corpus — add a doubling "
        f"level (e{2 * NGRAM_CLOSURE_HOPS}) in queries.py; the Spark "
        f"operator itself is a true fixpoint and needs no change."
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS)
def test_semantic_closure_hop_budget_holds(sf_dir):
    edges = _edges(
        sf_dir,
        "embeddings",
        f"WITH {_pinned_cells_cte()}, "
        f"pairs AS MATERIALIZED ({SQL_SEMANTIC_PAIRS}) "
        "SELECT id_a, id_b FROM pairs",
    )
    ecc, biggest = _min_node_eccentricity(edges)
    assert ecc <= SEMANTIC_CLOSURE_HOPS, (
        f"{sf_dir}: a SemDeDup component needs {ecc} hops to carry "
        f"its min label but the oracle only closes "
        f"{SEMANTIC_CLOSURE_HOPS} (largest component {biggest} "
        f"nodes). The ORACLE is now wrong for this corpus — add a "
        f"doubling level (e{2 * SEMANTIC_CLOSURE_HOPS}) in "
        f"queries.py; the Spark operator is a true fixpoint."
    )
