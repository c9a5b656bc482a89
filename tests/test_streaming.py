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
