"""Throughput floor for the fused BPE id kernel (round 15) — the
trainer-input chain's perf posture, same doctrine as the codec floors
(tests/test_codec_throughput.py): measure aggregate bytes/s through
``bpe_encode_ids`` on a Zipfian-ish synthetic corpus and pin a floor
an order of magnitude under the idle-box measurement, so a
regression to the two-Arrow-crossing shape (or an accidental
per-row Python fallback) fails loudly while box contention cannot.

Idle-box calibration (32 threads): ~40 MB/s aggregate — each run
starts memo-COLD (the memo lives in the per-call closure) and warms
within the first rows of its heavily word-repeating corpus;
the fused kernel measured 1.75x over the old tokenize+map
composition. Floor: 2 MB/s. Throughput is corpus-dependent (the
word memo makes repeated words a dict hit) — the test corpus repeats
words heavily, like real text does.
"""

from __future__ import annotations

import random
import time


def test_bpe_encode_ids_throughput_floor(spark):
    from clustering_spark.operators.bpe import (
        EOS,
        PAD,
        UNK,
        bpe_encode_ids,
        train_bpe,
    )

    rng = random.Random(7)
    words = [
        "the", "quick", "brown", "fox", "jumps", "over", "lazy",
        "dogs", "stream", "table", "tokenizer", "pipeline", "spark",
        "vector", "quality", "sample", "merge", "batch",
    ]
    docs = [
        (" ".join(rng.choice(words) for _ in range(300)),)
        for _ in range(3000)
    ]
    nbytes = sum(len(t[0]) for t in docs)
    df = spark.createDataFrame(docs, "text string").repartition(32).cache()
    df.count()
    model = train_bpe(df, "text", n_merges=200, byte_level=True)
    enc = lambda: bpe_encode_ids(  # noqa: E731
        df, "text", model, specials=(UNK, PAD, EOS)
    )
    enc().count()  # warm the JVM/Python workers (NOT the memo —
    # each call builds a fresh closure; the memo warms within a run)
    t0 = time.monotonic()
    enc().select("bpe_ids").count()
    dt = time.monotonic() - t0
    mbs = nbytes / 1e6 / dt
    assert mbs > 2.0, f"bpe_encode_ids {mbs:.2f} MB/s under the 2 MB/s floor"
    df.unpersist()
