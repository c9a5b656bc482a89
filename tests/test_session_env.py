"""Worker-environment contract of session.get_spark: BLAS pools inside
Python UDF workers are pinned (default 1 thread) so per-task numpy
kernels don't oversubscribe the box — measured 25-60% wall-clock on the
dense-kernel queries (see OPTIMIZATION_r16.md). The assertion runs a
real pandas UDF so it checks the env the WORKER sees, not just the conf
string."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_worker_blas_threads_pinned(spark):
    def probe(s):
        import os

        return pd.Series(
            [
                "/".join(
                    os.environ.get(v, "UNSET")
                    for v in (
                        "OMP_NUM_THREADS",
                        "OPENBLAS_NUM_THREADS",
                        "MKL_NUM_THREADS",
                    )
                )
                for _ in s
            ]
        )

    probe.__annotations__ = {"s": pd.Series, "return": pd.Series}
    [row] = (
        spark.range(1).select(F.pandas_udf(probe, "string")(F.col("id"))).collect()
    )
    # each variable is pinned to ITS OWN conf value (the defaults may
    # differ per variable when the launching shell pre-exported one —
    # get_spark defers to a user's explicit oversubscription choice)
    expected = [
        spark.conf.get(f"spark.executorEnv.{v}")
        for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS")
    ]
    assert row[0] == "/".join(expected)
