"""Windowed aggregates over change events — the north_rule's streaming
operators (SURVEY §2.8 table), built purely from Spark primitives.

These work identically on batch DataFrames and on watermarked streaming
DataFrames (pass a withWatermark'd input for streaming).  Used for the
engine's per-shard metrics stream (K4 heartbeat analog) and exposed as
first-class query operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """groupBy(window(ts, window), *keys).agg(...) with window bounds
    surfaced as window_start / window_end columns.

    Streaming semantics (pinned by tests/test_streaming.py's streaming
    windowed-agg case): in append mode a window emits exactly once when
    the CURRENT watermark passes its end, but late-row FILTERING uses the
    PREVIOUS micro-batch's watermark (Spark's two-watermark rule,
    SPARK-40025) — a late row is guaranteed dropped only once its window
    end is below the previous-trigger watermark; one trigger earlier it
    is still merged.  That extra leniency is strictly more permissive
    than the reference's confidence window, never less."""
    out = df.groupBy(F.window(F.col(ts_col), window), *keys).agg(*aggs)
    return (
        out.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    out = df.groupBy(F.window(F.col(ts_col), window, slide), *keys).agg(*aggs)
    return (
        out.withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """session_window(ts, gap): a session ends `gap` after its last event
    (session_end = max(ts) + gap), exactly Spark's session_window
    semantics (grouping auto-name: `session_window`)."""
    out = df.groupBy(F.session_window(F.col(ts_col), gap), *keys).agg(*aggs)
    return (
        out.withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )
