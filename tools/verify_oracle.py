"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted
by all columns). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            av_f = pd.to_numeric(av, errors="raise")
            bv_f = pd.to_numeric(bv, errors="raise")
            if not ((av_f - bv_f).abs().fillna(0) <= 1e-9).all():
                bad = (av_f - bv_f).abs() > 1e-9
                problems.append(
                    f"values differ in {c}: e.g. {av_f[bad].iloc[0]} vs {bv_f[bad].iloc[0]}"
                )
            else:
                # STRICT signed-zero pass: the driver hashes canonical
                # value strings, so Spark 0.0 vs DuckDB -0.0 is a red
                # gate row even though |diff| = 0 — the exact blind spot
                # that shipped cluster_assign red in round 10. copysign
                # distinguishes the two zeros where == cannot.
                za = np.asarray(av_f, dtype=float)
                zb = np.asarray(bv_f, dtype=float)
                signed = (
                    (za == 0.0)
                    & (zb == 0.0)
                    & (np.signbit(za) != np.signbit(zb))
                )
                if signed.any():
                    i = int(np.argmax(signed))
                    problems.append(
                        f"signed-zero mismatch in {c}: spark "
                        f"{'-0.0' if np.signbit(za[i]) else '0.0'} vs duck "
                        f"{'-0.0' if np.signbit(zb[i]) else '0.0'}"
                        " (driver hash splits these; canonicalize with"
                        " nz()/+0.0 on BOTH sides)"
                    )
        except (ValueError, TypeError):
            if not (av.fillna("<NA>") == bv.fillna("<NA>")).all():
                bad = av.fillna("<NA>") != bv.fillna("<NA>")
                problems.append(
                    f"values differ in {c}: e.g. {av[bad].iloc[0]!r} vs {bv[bad].iloc[0]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from clustering_spark.queries import (
        OFF_GATE_ORACLES,
        OFF_GATE_QUERIES,
        ORACLES,
        QUERIES,
    )
    from clustering_spark.session import get_spark

    # off-gate entries (retired from the driver's 50-slot window) stay
    # oracle-checked here — retirement never means unchecked
    all_queries = {**QUERIES, **OFF_GATE_QUERIES}
    all_oracles = {**ORACLES, **OFF_GATE_ORACLES}

    spark = get_spark("verify_oracle")
    con = duck_con(sf_dir)
    failures = 0
    t_all = time.monotonic()
    for name, fn in all_queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in all_oracles:
            status = "ROWS-ONLY" if len(spark_pdf) >= 0 else "EMPTY"
            print(
                f"ok   {name}: {len(spark_pdf)} rows ({status}, no oracle)"
                f" [{dt:.1f}s]"
            )
            continue
        try:
            duck_pdf = con.execute(all_oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match oracle [{dt:.1f}s]")
    print(f"total: {time.monotonic() - t_all:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
