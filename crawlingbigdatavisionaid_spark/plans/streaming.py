"""Streaming queries (OP-STR-01, OP-X-WIN-01 streaming form,
OP-DEDUP-01 streaming form). Each callable RUNS a Structured Streaming
query to completion (availableNow trigger — the reference's 6-hourly
drain) and returns the sink table, so the driver oracle-checks real
streaming output against batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import pipeline as SP
from .registry import register


@register(
    "stream_hourly_counts",
    ops=("OP-STR-01", "OP-X-WIN-01"),
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                   AS window_start,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                   + INTERVAL '1 hour' AS window_end,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming aggregation, drained with
    availableNow — must equal the batch hourly aggregate exactly."""
    return SP.hourly_counts(spark, sf_dir)


@register(
    "stream_dedup_count",
    ops=("OP-STR-01", "OP-DEDUP-01"),
    oracle="SELECT COUNT(*) AS distinct_events FROM events",
)
def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup: doubled input, dropDuplicates state on
    event_id, complete-mode count == exact distinct count."""
    return SP.dedup_count(spark, sf_dir)
