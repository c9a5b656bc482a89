"""Time individual bench queries with the noop sink (guide §1.4),
printing per-run seconds — the A/B microharness for optimization work.

    python tools/time_query.py <sf_dir> <runs> <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from clustering_spark.queries import OFF_GATE_QUERIES, QUERIES
    from clustering_spark.session import get_spark

    sf_dir, runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    registry = {**QUERIES, **OFF_GATE_QUERIES}
    spark = get_spark("time_query")
    # same warmup as bench.py: JVM + Python-worker-pool spin-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    import pandas as _pd
    from pyspark.sql import functions as _F

    def _echo(s):
        return s

    _echo.__annotations__ = {"s": _pd.Series, "return": _pd.Series}
    spark.range(1000).select(
        _F.pandas_udf(_echo, "long")(_F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = registry[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {samples} min={min(samples)}")


if __name__ == "__main__":
    main()
