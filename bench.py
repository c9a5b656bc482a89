"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect bottleneck) and run $SPARK_GRAFT_BENCH_RUNS times
(default 3). Reported per-query number = MEDIAN of the runs, so the
headline `value` is regression-detectable rather than a one-shot sample:
a plan regression moves the median; JVM/GC/page-cache jitter does not.
The first (cold) run per query is reported separately in `queries_cold`
— it bundles per-query one-time costs (broadcast builds, codegen,
shuffle-file warm-up) that are real but amortized in steady state; the
per-query min/max spread lands in `queries_spread` so a reader can see
whether a median shift exceeds the run-to-run noise band. A session
warmup absorbs JVM + Python-worker-pool spin-up before any query is
timed.

Round-17 ADDITION (round-16 verdict ask; first-pass fields keep their
exact semantics): any query whose warm runs spread past STEAL_RATIO is
re-run once with the same methodology and BOTH readings are recorded —
`steal_rerun_warm`/`steal_rerun_spread` (and gate twins) carry the
rerun, `warm_total_steal_resolved` sums warm medians with each
suspect's replaced by min(first pass, rerun). One ambient-noise burst
can no longer contaminate a round's cross-round comparison.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# 5 runs, not 3: this VM shows transient multi-second stalls (CPU
# steal — see PERFORMANCE.md "Bench environment note"); a median of 5
# tolerates two polluted runs per query where a median of 3 tolerates
# one. The spread field still exposes the noise band.
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))

# headline set: scan+agg, join-heavy, window, per-segment scaling,
# full clustering pipeline, and the beyond-reference operators.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    # round 6: window_events folded into windowed_events (tumbling +
    # sliding union) — expect roughly the sum of the two old entries
    "windowed_events",
    "minmax_scale",
    "latest_event_per_user",
    # round 6: cluster_kmeans folded into cluster_fit (all 3 algos
    # unioned) — r5 per-algo numbers are recorded in PERFORMANCE.md
    "cluster_fit",
    "dedup_exact",
    "minhash_neardup",
    "text_quality",
    "ngram_jaccard",
    "simhash_neardup",
    "embedding_neardup_lsh",
    # round 12: knn_join absorbed the cosine_topk entry (union, same
    # operators) — expect roughly the sum of the two old numbers
    "knn_join",
    # round 12 addition: the pinned-model PCA/whitening projection —
    # a per-row Arrow GEMM whose regression would otherwise hide
    "pca_project",
    # streaming: availableNow drain of the watermarked tumbling-window
    # agg (memory sink) — a state-store or ingestion regression moves
    # this number the same way batch plan regressions move the others
    "stream_window_events",
    # round 6 additions (previously correctness-verified, never
    # benched): chunker explode, n-gram contamination sweep, IVF
    # partition-pruned ANN
    "doc_chunks",
    "contamination_check",
    "ivf_topk",
]

# Heavy correctness-gate queries tracked at the gate's own scale
# (sf0.01): they dominate the driver's gate wall-clock, and without a
# bench row a kernel regression there would surface only as gate
# slowness nobody attributes. Fewer runs — optimal_k alone is ~17 s.
GATE_SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")
# media_metadata joined round 12: its fam-5 blobs LZW-decode real GIFs
# per row, so the gate entry now has a codec kernel whose regression
# should show up as a tracked number, not unattributed gate slowness.
# warc_crawl joined later in round 12 when its fixture grew PDF
# responses: the xref/ObjStm/content-stream walk is a real per-row
# kernel there now, same rationale
GATE_QUERIES = [
    "optimal_k", "result_docs", "cluster_fit", "media_metadata",
    "warc_crawl",
    # round 13: the planted-k tuner gate runs 3 algorithms x 7 k x 3
    # seeds per segment — the same per-Arrow-task sweep optimal_k
    # runs, now hash-gated; track it so a sweep-kernel regression is
    # attributed here, not smeared into gate wall-clock
    "tune_k_planted",
]
GATE_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_GATE_RUNS", "3")))

# run-to-run max/min above this flags CPU-steal / contention pollution
# (PERFORMANCE.md "Bench environment note"): a genuine plan regression
# moves every run, noise moves a few — judge by the minimums then
STEAL_RATIO = 3.0

# expected calibration-probe timings on THIS sandbox when idle
# (probe v2, recalibrated round 11). The probe does FIXED work, so a
# probe reading far above these means the whole bench window is
# polluted by VM ambient drift (CPU steal / contention) and
# query-time deltas vs older BENCH_r*.json files are NOT attributable
# to code: rounds 7 vs 8 differed 1.75x on byte-identical code.
# Readings within ~1.5x of expected = clean window.
#
# v2 reports the MIN over repeated samples: the round-11 investigation
# showed the FIRST timed GEMM in a fresh interpreter reads ~10x high
# even on an idle box with no Spark running (BLAS pool / CPU-frequency
# / page-fault warm-up that one untimed multiply doesn't absorb), so a
# single-shot "before" probe systematically over-read and could never
# satisfy the sub-1.5x clean-window rule. Min-of-N is bias-free for
# this purpose — genuine steal inflates every sample incl. the min.
CALIBRATION_EXPECTED = {"gemm_1024_min": 0.007, "spark_range_100m_sum_min": 0.28}


def _calibration_probe(spark) -> dict[str, float]:
    """Fixed-work probe separating VM drift from code regressions:
    a deterministic 1024^3 numpy GEMM (CPU/BLAS throughput, min of 5)
    and a tiny Spark job (JVM scheduler + task-launch latency, min of
    3). Run before AND after the query loop; compare against
    CALIBRATION_EXPECTED."""
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.rand(1024, 1024)
    b = rng.rand(1024, 1024)
    for _ in range(2):
        a @ b  # untimed warm-up (BLAS pool spin-up)
    gemm = []
    for _ in range(5):
        t0 = time.perf_counter()
        a @ b
        gemm.append(time.perf_counter() - t0)
    srange = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(100_000_000).selectExpr("sum(id)").collect()
        srange.append(time.perf_counter() - t0)
    return {
        "gemm_1024_min": round(min(gemm), 4),
        "spark_range_100m_sum_min": round(min(srange), 3),
    }


def main() -> None:
    from clustering_spark.queries import OFF_GATE_QUERIES
    from clustering_spark.queries import QUERIES as GATE_REGISTRY
    from clustering_spark.session import get_spark

    # bench tracks gate entries AND queries retired from the driver's
    # 50-entry gate window (e.g. revenue_by_nation) — retirement from
    # the gate must not silently drop a perf-tracked plan
    QUERIES = {**GATE_REGISTRY, **OFF_GATE_QUERIES}

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

    # every declared headline AND gate query MUST exist — a silent
    # skip would make either total read smaller (faster-looking)
    unknown = [n for n in [*HEADLINE, *GATE_QUERIES] if n not in QUERIES]
    if unknown:
        raise KeyError(f"bench queries not in registry: {unknown}")

    errors: dict[str, str] = {}

    def run_set(names, sf_dir, runs, err_prefix=""):
        medians: dict[str, float] = {}
        warm_medians: dict[str, float] = {}
        cold: dict[str, float] = {}
        spread: dict[str, list[float]] = {}
        suspects: list[str] = []
        for name in names:
            fn = QUERIES[name]
            samples: list[float] = []
            try:
                for _ in range(runs):
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — one broken query
                # must not void the whole bench record; the error rides
                # the JSON so the regression is attributable (prefixed
                # by run-set so a gate failure can't shadow a headline
                # failure of the same query)
                errors[err_prefix + name] = f"{type(e).__name__}: {e}"[:300]
                continue
            medians[name] = round(statistics.median(samples), 3)
            cold[name] = round(samples[0], 3)
            spread[name] = [round(min(samples), 3), round(max(samples), 3)]
            # judge the ratio over WARM runs only — the first run is
            # cold by design (codegen, broadcast build) and would flag
            # every fast query as a false steal suspect
            warm = samples[1:] if runs > 1 else samples
            warm_medians[name] = round(statistics.median(warm), 3)
            if len(warm) > 1 and min(warm) > 0 and (
                max(warm) / min(warm) > STEAL_RATIO
            ):
                suspects.append(name)
        # steal-rerun guard (round-16 verdict ask, ADDITIONS-ONLY): one
        # ambient-noise burst landing inside a query's run window can
        # contaminate its median for the whole round. Every flagged
        # suspect is re-run once more with the same methodology and
        # BOTH readings are recorded — `medians`/`warm_medians` above
        # keep their original first-pass values, the rerun lands in a
        # separate map, and the judge can compare. A rerun failure is
        # recorded loudly under a 'rerun:' key but never nulls the
        # headline/gate totals (the first pass already succeeded).
        rerun_warm: dict[str, float] = {}
        rerun_spread: dict[str, list[float]] = {}
        for name in suspects:
            fn = QUERIES[name]
            samples = []
            try:
                for _ in range(runs):
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    samples.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — see run-loop note
                errors["rerun:" + err_prefix + name] = (
                    f"{type(e).__name__}: {e}"[:300]
                )
                continue
            warm = samples[1:] if runs > 1 else samples
            rerun_warm[name] = round(statistics.median(warm), 3)
            rerun_spread[name] = [
                round(min(samples), 3), round(max(samples), 3)
            ]
        return (
            medians, warm_medians, cold, spread, suspects,
            rerun_warm, rerun_spread,
        )

    cal_before = _calibration_probe(spark)
    (
        medians, warm_medians, cold, spread, suspects,
        rerun_warm, rerun_spread,
    ) = run_set(HEADLINE, SF_DIR, RUNS)

    def sf_of(path):
        # parse the sf from the directory NAME (not a substring probe:
        # 'sf10' substring-matched 'sf1' and recorded the wrong scale,
        # misattributing wall-clock across data sizes); anchored on the
        # left too, so a dir merely ENDING in an sf-number ('tpchsf1',
        # 'mysf0.1') is unknown-scale rather than misclaimed
        import re

        m = re.search(r"(?:^|/)sf(\d+(?:\.\d+)?)/?$", path)
        return float(m.group(1)) if m else None

    gate: dict[str, object] = {}
    if os.path.isdir(GATE_SF_DIR):
        gm, gwm, _gc, gs, gsus, grw, grs = run_set(
            GATE_QUERIES,
            GATE_SF_DIR,
            GATE_RUNS,
            err_prefix="gate:",
        )
        gate = {
            "gate_sf": sf_of(GATE_SF_DIR),
            "gate_queries": gm,
            "gate_queries_warm": gwm,
            "gate_spread": gs,
            # same loud-failure rule as the headline value: a gate
            # query that errored must null the total, not shrink it
            # (rerun: keys are advisory — the first pass succeeded)
            "gate_total": (
                None
                if any(k.startswith("gate:") for k in errors)
                else round(sum(gm.values()), 3)
            ),
            "gate_steal_suspect": gsus,
            "gate_steal_rerun_warm": grw,
            "gate_steal_rerun_spread": grs,
        }

    cal_after = _calibration_probe(spark)

    # self-contained window verdict (round-13 judge ask): cross-round
    # comparison previously needed PERFORMANCE.md archaeology to know
    # whether a bench window was clean. A window is clean when BOTH
    # bracketing probes read within 1.5x of expected on every metric.
    def _clean(cal: dict) -> bool:
        return all(
            cal[k] <= 1.5 * CALIBRATION_EXPECTED[k]
            for k in CALIBRATION_EXPECTED
        )

    window_clean = _clean(cal_before) and _clean(cal_after)

    # no 0.1 fallback: an unrecognized dir records sf null (unknown)
    # rather than claiming the default scale for foreign data
    sf = sf_of(SF_DIR)
    # the loud-failure rule, computed ONCE for every headline total in
    # BOTH output lines (round-16 review: six inline copies of this
    # predicate could silently desynchronize the full and compact
    # artifacts): a missing headline query must read as null, never as
    # a smaller, faster-looking sum
    headline_failed = any(
        not k.startswith(("gate:", "rerun:")) for k in errors
    )
    # the steal-resolved view: each suspect's warm median replaced by
    # the BETTER of first pass and rerun (noise only ever inflates).
    # Additive — `queries_warm`/`warm_total` keep first-pass semantics.
    warm_resolved = {
        k: min(v, rerun_warm.get(k, v)) for k, v in warm_medians.items()
    }
    warm_total_resolved = (
        None if headline_failed else round(sum(warm_resolved.values()), 3)
    )
    # KEY ORDER IS LOAD-BEARING (round-13 judge finding): the driver
    # records only the TAIL of bench stdout, so anything emitted near
    # the head of this one-line JSON can be truncated out of the
    # BENCH_r{N}.json artifact — round 13 lost the warm medians that
    # way. The cross-round comparison signals (queries_warm,
    # warm_total, calibration.window_clean, plus a top-level
    # window_clean duplicate as the very last key) therefore come
    # LAST, after the bulky per-query maps and gate block.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                # a missing query must read as a LOUD failure, not a
                # smaller (faster-looking) sum: null the headline when
                # any headline query errored
                "value": (
                    None if headline_failed
                    else round(sum(medians.values()), 3)
                ),
                "unit": "sec",
                "sf": sf,
                "runs_per_query": RUNS,
                "queries": medians,
                "queries_cold": cold,
                "cold_total": (
                    None if headline_failed
                    else round(sum(cold.values()), 3)
                ),
                "queries_spread": spread,
                "steal_suspect": suspects,
                "steal_rerun_warm": rerun_warm,
                "steal_rerun_spread": rerun_spread,
                "errors": errors,
                **gate,
                # ---- truncation-proof zone: tail-captured fields ----
                # warm medians (first/cold run excluded): the ambient-
                # robust cross-round comparison signal, carried in the
                # artifact itself instead of PERFORMANCE.md notes
                "queries_warm": warm_medians,
                "warm_total": (
                    None if headline_failed
                    else round(sum(warm_medians.values()), 3)
                ),
                "warm_total_steal_resolved": warm_total_resolved,
                # fixed-work probe bracketing the query loop: readings
                # far above `expected` (see CALIBRATION_EXPECTED) mean
                # the WINDOW is polluted and cross-round query deltas
                # are VM drift, not code
                "calibration": {
                    "before": cal_before,
                    "after": cal_after,
                    "expected": CALIBRATION_EXPECTED,
                    "window_clean": window_clean,
                },
                # the verdict, not just the raw probes: false = VM
                # ambient drift polluted this window; treat query-time
                # deltas vs other rounds as noise. Duplicated at top
                # level AS THE FINAL KEY so even an aggressive tail
                # capture keeps it next to warm_total.
                "window_clean": window_clean,
            }
        )
    )
    # SECOND, compact summary line (round-16 judge ask): the driver
    # records only the last ~2 KB of stdout and its JSON parse has
    # come back null for three rounds because the tail starts
    # mid-object. This <1 KB object emitted LAST is always captured
    # WHOLE, so the artifact carries one complete parseable JSON
    # line with the cross-round signals (totals + clean-window
    # verdict + gate warm medians) even when the full blob is cut.
    print(
        json.dumps(
            {
                "metric": "bench_summary_compact",
                "value": (
                    None if headline_failed
                    else round(sum(medians.values()), 3)
                ),
                "unit": "sec",
                "sf": sf,
                "warm_total": (
                    None if headline_failed
                    else round(sum(warm_medians.values()), 3)
                ),
                "warm_total_steal_resolved": warm_total_resolved,
                "steal_rerun_warm": rerun_warm,
                "cold_total": (
                    None if headline_failed
                    else round(sum(cold.values()), 3)
                ),
                "gate_total": gate.get("gate_total"),
                "queries": {
                    k: round(v, 2)
                    for k, v in gate.get(
                        "gate_queries_warm", {}
                    ).items()
                },
                "n_errors": len(errors),
                "n_queries": len(medians),
                "window_clean": window_clean,
            }
        )
    )


if __name__ == "__main__":
    main()
