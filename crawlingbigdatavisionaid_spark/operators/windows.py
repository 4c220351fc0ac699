"""Event-time window operators (OP-X-WIN-01) over the ``events`` stream
table — tumbling, sliding, and session windows.

The reference has no window semantics at all (SURVEY.md §2.9): late data
is handled by full recompute on every dashboard load (``app.py:86``).
These operators are the Spark-native replacement; the same expressions run
in Structured Streaming with ``withWatermark`` (see streaming/) where the
full-recompute becomes incremental state.

Scale: ``window()`` is a projection (each row maps to its window struct)
followed by a hash aggregate — one shuffle keyed by (window, keys).
Session windows shuffle by user and merge per-key sorted runs; skewed
users would be salted upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling(
    df: DataFrame, ts_col: str = "ts", width: str = "1 hour"
) -> DataFrame:
    """Non-overlapping event-time buckets with count + exact value sum."""
    w = F.window(F.col(ts_col), width)
    return (
        df.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_d"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
            F.col("sum_d").cast("double").alias("sum_value"),
        )
    )


def sliding(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    w = F.window(F.col(ts_col), width, slide)
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cnt",
        )
    )


def session(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key session windows: events within ``gap`` of each other merge;
    session end = last event + gap (Spark ``session_window`` semantics)."""
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(F.col(key_col), w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
