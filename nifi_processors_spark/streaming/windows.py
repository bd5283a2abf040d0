"""Streaming window aggregations over the change-event stream.

The reference has no windowing (SURVEY.md §2.8-2.9) — its only
event-time concept is the approximate-arrival attribute. These
operators are the engine's forward-looking additions for monitoring
and training-data pipelines: watermark-bounded tumbling counts (event
throughput per shard) and session windows per conversation (turn-burst
detection). Both are pure built-in Structured Streaming operators —
bounded state, no custom stateful code needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_stats(
    stream: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Per (window, shard) event counts + lag — the streaming version
    of the lineage rollup. Watermark bounds state for late events."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "shard", "n_events", "first_seq", "last_seq", "n_deletes",
        )
    )


def conversation_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per conversation: bursts of turns separated by
    ``gap`` of inactivity (built-in session_window — state bounded by
    the watermark)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "conv_id", "n_turns", "first_turn", "last_turn",
        )
    )
