"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect bottleneck). Wall-clock per query; `value` is the
total. A warmup query absorbs JVM/session spin-up so numbers reflect
query execution, not bootstrap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: scan+agg, join-heavy, window, per-segment scaling,
# full clustering pipeline, and the beyond-reference operators.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "window_events",
    "minmax_scale",
    "latest_event_per_user",
    "cluster_kmeans",
    "dedup_exact",
    "minhash_neardup",
    "cosine_topk",
    "text_quality",
    "ngram_jaccard",
    "simhash_neardup",
    "embedding_neardup_lsh",
    "knn_join",
]


def main() -> None:
    from clustering_spark.queries import QUERIES
    from clustering_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: touch the biggest table once (JVM + codegen spin-up) and
    # run one trivial Arrow-batch UDF (Python-worker pool + Arrow
    # serializer spin-up — otherwise the first pandas-UDF query pays
    # ~8s of one-time process startup that isn't query execution)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    import pandas as _pd
    from pyspark.sql import functions as _F

    def _echo(s):
        return s

    _echo.__annotations__ = {"s": _pd.Series, "return": _pd.Series}
    spark.range(1000).select(
        _F.pandas_udf(_echo, "long")(_F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    # every declared headline query MUST exist — a silent skip would
    # make the headline total overstate coverage
    unknown = [n for n in HEADLINE if n not in QUERIES]
    if unknown:
        raise KeyError(f"headline queries not in registry: {unknown}")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = 0.1
    if "sf0.01" in SF_DIR:
        sf = 0.01
    elif "sf0.001" in SF_DIR:
        sf = 0.001
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
