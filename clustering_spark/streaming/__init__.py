"""Structured Streaming ingest (SURVEY §2.8/§7.6 — additive: the
reference has NO streaming; its cron-interval batch files are the
tumbling windows. This package gives the same aggregations a
readStream path with watermarked event-time windows.)"""

from clustering_spark.streaming.events_stream import (  # noqa: F401
    read_events_stream,
    session_event_stats,
    stateful_user_stats,
    windowed_event_counts,
)
