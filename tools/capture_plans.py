"""Capture `.explain("formatted")` for every bench-tracked query into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence trail
(guide §1: measure first; §7.2: read the plan). Usage:

    python tools/capture_plans.py <tag> <suffix> [query ...]

e.g. `python tools/capture_plans.py r16 before` captures all bench
queries; name specific queries to refresh only those. Headline queries
plan at $SPARK_GRAFT_SF_DIR (default sf0.1), gate-only queries at the
gate scale (sf0.01), matching bench.py's split.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GATE_SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    import bench
    from clustering_spark.queries import OFF_GATE_QUERIES, QUERIES
    from clustering_spark.session import get_spark

    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    registry = {**QUERIES, **OFF_GATE_QUERIES}
    targets: list[tuple[str, str]] = [(n, SF_DIR) for n in bench.HEADLINE]
    targets += [
        (n, GATE_SF_DIR)
        for n in bench.GATE_QUERIES
        if n not in bench.HEADLINE
    ]
    if only:
        targets = [(n, d) for n, d in targets if n in only]

    spark = get_spark("capture_plans")
    for name, sf_dir in targets:
        try:
            df = registry[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — record, keep capturing
            plan = f"CAPTURE ERROR: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n{plan}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
