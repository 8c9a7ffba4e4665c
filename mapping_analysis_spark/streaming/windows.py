"""Event-time windowed streaming queries over the transcripts stream.

The CEP window surface mandated by the north rule: tumbling / sliding /
session windows with event-time watermarks on ``ts``. The reference has no
event-time notion (bounded DataSets only); these are the Spark-idiomatic
equivalents of its per-job accumulator metrics (``util/Constants.java:33-87``)
computed continuously (SURVEY.md §2.7).

Each builder takes either a streaming or a batch DataFrame — Structured
Streaming's unified semantics guarantee a batch run over the same input
equals the final streaming result (watermark permitting); the parity tests
exercise exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_role_counts(df: DataFrame, width: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Turns per (1h tumbling window, role)."""
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", width).alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("win.start").alias("window_start"), "role", "n_turns")
    )


def sliding_tool_rate(
    df: DataFrame, width: str = "30 minutes", slide: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tool-call volume per sliding window (hot-tool skew monitor)."""
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.filter(F.col("role") == "tool")
        .groupBy(F.window("ts", width, slide).alias("win"), "tool")
        .agg(F.count("*").alias("n_calls"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tool",
            "n_calls",
        )
    )


def session_turn_stats(
    df: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-conversation session windows (gap-based) — the streaming analogue
    of the reference's per-entity grouping (sessionization per conv_id,
    SURVEY.md §2.7 row 1)."""
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_turns",
        )
    )
