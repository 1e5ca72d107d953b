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
    surfaced as window_start / window_end columns."""
    w = F.window(F.col(ts_col), window)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    w = F.window(F.col(ts_col), window, slide)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
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
    semantics."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )
