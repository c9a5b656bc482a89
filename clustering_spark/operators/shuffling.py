"""Deterministic global shuffle + sharding of training data (beyond-
reference scope; the reference has no notion of output ordering at
all — its Mongo sink receives whatever order the driver loop produced).

A training run needs its input in a RANDOM but REPRODUCIBLE order:
random so gradient batches are decorrelated, reproducible so a resumed
or re-run job sees the identical byte stream (elastic training,
debugging loss spikes, ablations). The standard trick — `ORDER BY
random()` — is neither (nondeterministic) nor scalable (a single
global sort). Instead every row gets a pure-function order key
``md5(key || epoch || salt)``:

* shard  = first 8 hex chars mod n_shards → which output file
* order  = the full hex digest            → position within the shard

`repartition(n_shards, shard)` + `sortWithinPartitions(order)` gives a
one-shuffle plan whose output is a deterministic permutation of the
corpus: no global sort, no RNG, no driver state. Concatenating the
shards in shard order replays the exact same sequence on any cluster
size, and a different ``epoch`` value yields an independent
permutation from the same corpus — per-epoch reshuffling without
rewriting data. Because md5 is independent of any stratum column,
sources/languages interleave uniformly within every shard for free.

DuckDB replays the same md5 math verbatim, so shard assignment and
within-shard order are oracle-checkable (tests/test_shuffling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(key_col: str | Column, epoch: int = 0, salt: str = "") -> Column:
    """The order key: md5 of (key, epoch, salt) joined with an ASCII
    unit separator so distinct inputs can't collide by concatenation
    (('ab','c') vs ('a','bc')).

    NULL keys map to a '\\x00' sentinel before hashing (concat_ws would
    otherwise SKIP the NULL, colliding every NULL-key row onto one
    order key that also equals the empty-salt hash of nothing). The
    sentinel makes NULL deterministic and distinct from '' — it can
    only collide with a literal one-byte '\\x00' key, which no real id
    column contains."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(
        F.concat_ws(
            "\x1f",
            F.coalesce(key.cast("string"), F.lit("\x00")),
            F.lit(str(int(epoch))),
            F.lit(salt),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int = 0,
    salt: str = "",
    shard_col: str = "shard",
    order_col: str = "shuffle_order",
) -> DataFrame:
    """Deterministically permute ``df`` into ``n_shards`` hash-balanced
    shards, each internally sorted by the epoch-seeded hash.

    The returned frame is partitioned BY the shard column and sorted
    WITHIN each partition, so ``.write.partitionBy(shard_col)`` (or a
    direct parquet write) emits one run of files per shard whose row
    order is the permutation — ready for a sequential training reader.
    One hash-partition shuffle; no global sort, no skew (md5 output is
    uniform regardless of key distribution).

    Task mapping is ``hash(shard) % n_shards``: a shard always lands
    WHOLLY in one task (tests pin this), but at toy shard counts two
    shards can share a task while another sits empty — classic
    balls-in-bins, vanishing at production shard counts (≥512). The
    per-shard FILE layout is exact regardless, because
    ``partitionBy(shard_col)`` splits on the column value, not the
    task id.

    CONTRACT: ``key_col`` values must be UNIQUE for the permutation to
    be reproducible — rows with identical keys produce identical order
    keys, so their relative order after the within-partition sort is
    whatever the executor emits that run. NULL keys are deterministic
    (mapped to a sentinel in :func:`shuffle_key`) but all NULL-key
    rows share one order key and therefore tie the same way. Use the
    document/example id, not a payload column.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    for c in (shard_col, order_col):
        if c in df.columns:
            # withColumn would silently OVERWRITE the existing column
            # (e.g. re-shuffling a frame that kept a previous epoch's
            # shard assignment) — make the caller drop/rename first
            raise ValueError(
                f"epoch_shuffle: column {c!r} already exists in the input; "
                "drop it or pass a different shard_col/order_col"
            )
    okey = shuffle_key(key_col, epoch, salt)
    out = df.withColumn(order_col, okey).withColumn(
        shard_col,
        (F.conv(F.substring(F.col(order_col), 1, 8), 16, 10).cast("long")
         % n_shards).cast("int"),
    )
    # sort by (shard, order), not order alone: when two shards hash to
    # the same task (the balls-in-bins case above) each shard's rows
    # stay CONTIGUOUS in the task's output, so even a direct parquet
    # write keeps shard boundaries intact — not just partitionBy
    return out.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        shard_col, order_col
    )


def shard_stats(
    shuffled: DataFrame,
    shard_col: str = "shard",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-shard balance report (row count, optional token/weight sum,
    share of total) — the monitoring query to run after epoch_shuffle:
    a skewed shard means stragglers in the training reader. One narrow
    groupBy + a scalar total join (broadcast)."""
    aggs = [F.count("*").alias("n_rows")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("total_weight"))
    per = shuffled.groupBy(shard_col).agg(*aggs)
    total = per.agg(F.sum("n_rows").alias("__t"))
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn("row_share", F.round(F.col("n_rows") / F.col("__t"), 6))
        .drop("__t")
    )
