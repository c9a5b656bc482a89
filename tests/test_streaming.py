"""Structured Streaming ingest: availableNow drain over a static
directory must agree with the equivalent batch aggregation; session
windows group by gap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clustering_spark.streaming import (
    read_events_stream,
    session_event_stats,
    windowed_event_counts,
)
from clustering_spark.streaming.events_stream import run_stream_to_memory
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Materialize the events table (nanos ts -> micros) as a plain
    parquet directory a file stream can consume."""
    from clustering_spark.queries import load_events

    out = str(tmp_path_factory.mktemp("events_stream") / "data")
    (
        load_events(spark, SF_DIR)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts_utc").alias("ts"),
            "value",
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def test_stream_window_counts_match_batch(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(agg, "win_counts", str(tmp_path / "ckpt"))
    got = spark.table("win_counts").toPandas()

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    key = ["hour_epoch", "event_type"]
    a = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a.n_events.values == b.n_events.values).all()
    assert (abs(a.total_value.values - b.total_value.values) < 1e-6).all()


def test_stream_interval_join_matches_batch_range_join(spark, events_dir, tmp_path):
    """Stream-stream interval join (signup ⋈ clicks in the next hour)
    drained over a static directory must produce exactly the batch
    binned range join's pair set — per-signup counts compared."""
    from clustering_spark.operators.rangejoin import time_range_join
    from clustering_spark.streaming.events_stream import stream_interval_join

    signups = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("s_id"), F.col("ts").alias("s_ts"))
    )
    clicks = (
        read_events_stream(spark, events_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"))
    )
    pairs = stream_interval_join(
        signups, clicks, "s_ts", "c_ts", upper_us=3_600_000_000, watermark="2 hours"
    )
    assert pairs.isStreaming
    run_stream_to_memory(
        pairs, "sjoin_pairs", str(tmp_path / "ckpt_sjoin"), output_mode="append"
    )
    # per-signup counts as a batch projection of the drained pair set
    got = (
        spark.table("sjoin_pairs")
        .groupBy("s_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
        .toPandas()
        .sort_values("s_id")
        .reset_index(drop=True)
    )

    e = spark.read.parquet(events_dir)
    bs = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("s_id"), F.unix_micros("ts").alias("s_us")
    )
    bc = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.unix_micros("ts").alias("c_us")
    )
    expect = (
        time_range_join(bs, bc, "s_us", "c_us", lower_us=0, upper_us=3_600_000_000)
        .groupBy("s_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
        .toPandas()
        .sort_values("s_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(expect) > 0
    assert (got.s_id.values == expect.s_id.values).all()
    assert (got.n_clicks_1h.values == expect.n_clicks_1h.values).all()


def test_stream_sliding_window_counts_match_batch(spark, events_dir, tmp_path):
    """Sliding windows (1h window / 15min slide): every event lands in 4
    overlapping windows; the drained complete-mode table must equal the
    batch sliding aggregation."""
    stream = read_events_stream(spark, events_dir)
    agg = windowed_event_counts(
        stream, window="1 hour", watermark="2 hours", slide="15 minutes"
    )
    run_stream_to_memory(agg, "slide_counts", str(tmp_path / "ckpt_sl"))
    got = spark.table("slide_counts").toPandas()

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("hour_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
        .toPandas()
    )
    key = ["hour_epoch", "event_type"]
    a = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    # 4 overlapping windows per tumbling window -> strictly more rows
    # than the tumbling form would produce
    assert a.n_events.sum() == 4 * spark.read.parquet(events_dir).count()
    assert (a.n_events.values == b.n_events.values).all()
    assert (abs(a.total_value.values - b.total_value.values) < 1e-6).all()


def test_session_windows(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    sess = session_event_stats(stream, gap="30 minutes", watermark="4 hours")
    run_stream_to_memory(sess, "sessions", str(tmp_path / "ckpt2"))
    got = spark.table("sessions").toPandas()
    assert len(got) > 0
    # sessions are well-formed: end after start, counts positive
    assert (got.session_end >= got.session_start).all()
    assert (got.n_events > 0).all()
    # per-user event totals conserved
    batch_totals = (
        spark.read.parquet(events_dir).groupBy("user_id").count().toPandas()
    )
    stream_totals = got.groupby("user_id").n_events.sum()
    for r in batch_totals.itertuples():
        assert stream_totals[r.user_id] == r.count


def test_stateful_user_stats_match_batch(spark, events_dir, tmp_path):
    """Single availableNow batch: no timeouts fire, the emitted running
    totals must equal the batch groupBy."""
    from clustering_spark.streaming import stateful_user_stats

    stream = read_events_stream(spark, events_dir)
    stats = stateful_user_stats(stream, watermark="2 hours")
    run_stream_to_memory(
        stats, "user_stats", str(tmp_path / "ckpt3"), output_mode="update"
    )
    got = spark.table("user_stats").toPandas()
    # availableNow ends with a no-data batch where event-time timeouts
    # fire, so long-idle users arrive twice: the running row plus a
    # closed=true final row with identical totals. Latest state per
    # user = row with max n_events.
    got = (
        got.sort_values(["user_id", "n_events"])
        .groupby("user_id", as_index=False)
        .last()
    )
    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
        .toPandas()
    )
    a = got.sort_values("user_id").reset_index(drop=True)
    b = batch.sort_values("user_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a.user_id.values == b.user_id.values).all()
    assert (a.n_events.values == b.n_events.values).all()
    assert (abs(a.total_value.values - b.total_value.values) < 1e-4).all()
    assert (a.last_seen.values == b.last_seen.values).all()


def test_foreach_batch_upsert_sink_latest_wins(spark, events_dir, tmp_path):
    """The foreachBatch upsert sink over multi-batch update-mode
    emissions must converge to the batch per-user totals: monotone
    snapshot re-emissions merge latest-wins on n_events."""
    from clustering_spark.streaming.events_stream import (
        run_stream_upsert_parquet,
        stateful_user_stats,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    stats = stateful_user_stats(stream, ts_col="ts", watermark="2 hours")
    out = str(tmp_path / "user_state")
    run_stream_upsert_parquet(
        stats.drop("closed"),
        key_cols=["user_id"],
        order_cols=["n_events"],
        path=out,
        checkpoint_dir=str(tmp_path / "ckpt_upsert"),
    )
    got = (
        spark.read.parquet(out)
        .select("user_id", "n_events", F.round("total_value", 2).alias("tv"))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    expect = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(expect) > 0
    assert (got.user_id.values == expect.user_id.values).all()
    assert (got.n_events.values == expect.n_events.values).all()
    assert (abs(got.tv.values - expect.tv.values) < 1e-6).all()


def test_stateful_user_stats_timeout_finalizes_idle_user(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): user 2 is idle past the
    event-time timeout once the watermark advances after batch 1, so
    batch 2 emits its closed=true summary and drops its state; user 1
    (fresh data in batch 2) keeps accumulating."""
    import time as _time

    import pandas as pd

    from clustering_spark.streaming import stateful_user_stats

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "data"
    d.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    arrow_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False),
            str(d / name),
        )

    # batch 1: user 1 + user 2 at t0, user 3 at t0+1h (drives the
    # watermark to t0+50min > user 2's timeout of t0+10min)
    write_file(
        "f1.parquet",
        [
            (1, 1, "a", t0, 1.0),
            (2, 2, "a", t0, 2.0),
            (3, 3, "a", t0 + pd.Timedelta("1 hour"), 3.0),
        ],
    )
    _time.sleep(1.1)  # distinct mtime -> deterministic file order
    write_file("f2.parquet", [(4, 1, "b", t0 + pd.Timedelta("2 hours"), 4.0)])

    from clustering_spark.streaming.events_stream import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    stats = stateful_user_stats(
        stream, watermark="10 minutes", idle_timeout_ms=600_000
    )
    run_stream_to_memory(
        stats, "user_stats_t", str(tmp_path / "ckpt4"), output_mode="update"
    )
    got = spark.table("user_stats_t").toPandas()
    closed = got[got.closed]
    # user 2 must close (idle past timeout once batch 1's watermark
    # lands); user 3 may close in the final no-data batch; user 1 has
    # fresh batch-2 data keeping its timeout ahead of the watermark
    assert 2 in set(closed.user_id)
    assert 1 not in set(closed.user_id)
    assert closed[closed.user_id == 2].iloc[0].n_events == 1
    # user 1 accumulated across both batches: latest row has both events
    u1 = got[got.user_id == 1].sort_values("n_events").iloc[-1]
    assert u1.n_events == 2 and abs(u1.total_value - 5.0) < 1e-9


def test_stateful_user_stats_null_ts_user_last_seen_null(spark, tmp_path):
    """A user whose events so far ALL carry NULL timestamps must emit
    last_seen = NULL (like the batch max-over-all-NULLs), never the
    1970 epoch-0 sentinel the unset state initializes to."""
    import datetime as dt

    from clustering_spark.streaming import stateful_user_stats

    data_dir = str(tmp_path / "nullts")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, "click", None, 1.5),
        (2, 7, "click", None, 2.5),
        (3, 8, "view", t, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.mode("overwrite").parquet(data_dir)
    stream = read_events_stream(spark, data_dir)
    stats = stateful_user_stats(stream, ts_col="ts", watermark="2 hours")
    run_stream_to_memory(
        stats, "nullts_stats", str(tmp_path / "ckpt"), output_mode="update"
    )
    got = spark.table("nullts_stats").toPandas()
    u7 = got[got.user_id == 7]
    assert len(u7) > 0
    assert u7.last_seen.isna().all()
    assert (u7.n_events == 2).all()
    u8 = got[got.user_id == 8]
    assert len(u8) > 0
    assert u8.last_seen.notna().all()


def test_stateful_user_stats_epoch_adjacent_ts_is_not_null(spark, tmp_path):
    """An event just after 1970-01-01T00:00:00 is a legitimate
    timestamp: the unset-state sentinel must not conflate it with
    'only NULL timestamps seen' and emit last_seen = NULL.

    Why epoch + 1 microsecond and not epoch 0 exactly: Spark's
    stateful-operator late-row filter drops rows with ts <= the
    current watermark, and the watermark starts at 0 — measured here,
    an event at exactly epoch 0 never reaches applyInPandasWithState
    at all (engine semantics, not ours). +1 us is the earliest
    timestamp that can ever be observed, so it is the boundary the
    sentinel must keep distinct from NULL."""
    import datetime as dt

    from clustering_spark.streaming import stateful_user_stats

    data_dir = str(tmp_path / "epoch0")
    rows = [
        (1, 7, "click", dt.datetime(1970, 1, 1, 0, 0, 0, 1), 1.5),
        (2, 8, "view", dt.datetime(2024, 1, 1, 12, 0, 0), 1.0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.mode("overwrite").parquet(data_dir)
    stream = read_events_stream(spark, data_dir)
    stats = stateful_user_stats(stream, ts_col="ts", watermark="2 hours")
    run_stream_to_memory(
        stats, "epoch0_stats", str(tmp_path / "ckpt"), output_mode="update"
    )
    got = spark.table("epoch0_stats").toPandas()
    u7 = got[got.user_id == 7]
    assert len(u7) > 0
    assert u7.last_seen.notna().all()
    assert (u7.last_seen == dt.datetime(1970, 1, 1, 0, 0, 0, 1)).all()


def test_stateful_user_stats_timeout_is_timezone_proof(spark, tmp_path):
    """Round-16 review: pandas delivers TimestampType as SESSION-LOCAL
    naive values, so deriving the timeout clock from them epoch-shifts
    it by the tz offset against getCurrentWatermarkMs (true UTC). In a
    UTC-5 session the old math closed every ACTIVE user one batch
    early; the timeout now rides a JVM-computed unix_micros clock.
    Same fixture as the finalization test, run under America/New_York:
    user 1 (fresh data in batch 2) must stay open, user 2 (genuinely
    idle) must still close."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clustering_spark.streaming import stateful_user_stats
    from clustering_spark.streaming.events_stream import EVENTS_SCHEMA

    d = tmp_path / "data"
    d.mkdir()
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    arrow_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False),
            str(d / name),
        )

    write_file(
        "f1.parquet",
        [
            (1, 1, "a", t0, 1.0),
            (2, 2, "a", t0, 2.0),
            (3, 3, "a", t0 + pd.Timedelta("1 hour"), 3.0),
        ],
    )
    _time.sleep(1.1)
    write_file("f2.parquet", [(4, 1, "b", t0 + pd.Timedelta("2 hours"), 4.0)])

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(d))
        )
        stats = stateful_user_stats(
            stream, watermark="10 minutes", idle_timeout_ms=600_000
        )
        run_stream_to_memory(
            stats, "user_stats_tz", str(tmp_path / "ckpt_tz"),
            output_mode="update",
        )
        got = spark.table("user_stats_tz").toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    closed = set(got[got.closed].user_id)
    assert 2 in closed          # genuinely idle: still finalizes
    assert 1 not in closed      # active: must NOT close early (the bug)
    u1 = got[got.user_id == 1].sort_values("n_events").iloc[-1]
    assert u1.n_events == 2     # totals never reset


def test_stream_interval_join_rejects_degenerate_window(spark, tmp_path):
    """Round-16 review: upper_us<=0 used to produce NULL buckets (or
    DIVIDE_BY_ZERO under ANSI) and an eternally empty stream — the
    batch twin raises at call time; the stream twin now matches."""
    import pytest as _pytest

    from clustering_spark.streaming.events_stream import (
        EVENTS_SCHEMA,
        stream_interval_join,
    )

    src = str(tmp_path / "ij")
    spark.createDataFrame([], EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    r = s.withColumnRenamed("ts", "rts").withColumnRenamed(
        "event_id", "rid"
    ).select("rid", "rts")
    with _pytest.raises(ValueError, match="positive"):
        stream_interval_join(s, r, "ts", "rts", upper_us=0)


def test_upsert_sink_rejects_reserved_columns(spark, tmp_path):
    """Round-16 review: a caller column named __is_new/__rn was
    silently clobbered, folded into the latest-wins ordering, and
    dropped from the state table — now refused up front."""
    import pytest as _pytest

    from clustering_spark.streaming.events_stream import (
        EVENTS_SCHEMA,
        run_stream_upsert_parquet,
    )

    src = str(tmp_path / "up")
    spark.createDataFrame([], EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)
    s = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    bad = s.withColumn("__rn", F.lit(1))
    with _pytest.raises(ValueError, match="__rn"):
        run_stream_upsert_parquet(
            bad, ["user_id"], ["ts"], str(tmp_path / "state"),
            str(tmp_path / "ck"),
        )


def test_stream_state_partitions_adaptive_and_restored(spark, tmp_path):
    """The drain-scoped state-partition manager derives its count from
    SOURCE BYTES (clamped to [1, defaultParallelism]), applies it only
    inside the scope, and restores the session default afterwards —
    including on error (round-16 optimization; a leaked override would
    silently re-plan every later batch query)."""
    from clustering_spark.queries import _stream_state_partitions

    before = spark.conf.get("spark.sql.shuffle.partitions")
    par = spark.sparkContext.defaultParallelism

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 10)  # 10 bytes -> 1 partition
    with _stream_state_partitions(spark, str(small)) as mgr:
        assert mgr.n == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # a directory sums its files; with a 1-byte target the 3-byte dir
    # wants 3 partitions but clamps to defaultParallelism
    import os

    big = tmp_path / "big"
    big.mkdir()
    (big / "a.parquet").write_bytes(b"xxx")
    os.environ["SPARK_GRAFT_STREAM_PART_BYTES"] = "1"
    try:
        mgr2 = _stream_state_partitions(spark, str(big))
        assert mgr2.n == min(par, 3)
    finally:
        del os.environ["SPARK_GRAFT_STREAM_PART_BYTES"]

    # restore-on-error
    try:
        with _stream_state_partitions(spark, str(small)):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # NON-LOCAL fallback (round-17 verdict item 6): an hdfs://-style
    # path the driver cannot walk must size to FULL parallelism, never
    # to 1 partition — source bytes read as 0 and the clamp's fallback
    # is the cluster-safe ceiling
    mgr3 = _stream_state_partitions(spark, "hdfs://nn:8020/events")
    assert mgr3.n == max(1, par)


def test_input_bytes_nonlocal_falls_back_to_full_parallelism(
    spark, monkeypatch
):
    """_input_bytes contract (round-17 verdict item 6): a non-local URI
    returns 0, and load_spread treats 0 as 'unknown — use full
    parallelism'. A regression here would silently size a real hdfs://
    corpus to one partition."""
    import clustering_spark.queries as Q

    assert Q._input_bytes("hdfs://nn:8020/warehouse/t.parquet") == 0
    assert Q._input_bytes("/definitely/not/a/real/path.parquet") == 0
    # end-to-end: a real local table whose size probe reads 'unknown'
    # must spread to defaultParallelism, not to 1
    par = max(1, spark.sparkContext.defaultParallelism)
    monkeypatch.setattr(Q, "_input_bytes", lambda path: 0)
    df = Q.load_spread(spark, "/root/testdata/sf0.001", "nation")
    assert df.rdd.getNumPartitions() == par
