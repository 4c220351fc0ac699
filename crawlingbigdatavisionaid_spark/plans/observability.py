"""Observability queries (OP-STR-03, OP-AGG-06, OP-SRC-04).

The reference counts its pipeline with driver-side prints
(``crawl.py:25-27,133-136``); the Spark-native forms are in
``..observability``: ``DataFrame.observe`` for batch,
``StreamingQueryListener`` for streams. The registered query below runs a
REAL observed pipeline: the metrics come out of an ``Observation``
attached to a scan that is executed with a zero-output ``noop`` write —
exactly one pass over the data, no collect of the rows themselves.

OP-SRC-04 (the reference's cached-connection config, ``app.py:14-23``)
is implemented by the process-wide tuned SparkSession factory
(``..session.get_spark``); this query consumes that session's conf and
demonstrates that no per-query reconnect/re-read happens by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..observability import observed
from ..sources import load_table
from .registry import register


@register(
    "ingest_observed_metrics",
    ops=("OP-STR-03", "OP-AGG-06", "OP-SRC-04"),
    oracle="""
        SELECT COUNT(*) AS rows_seen,
               CAST(SUM(CASE WHEN text IS NOT NULL AND LENGTH(text) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_content
        FROM documents
    """,
)
def ingest_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ingest accounting via ``observe()`` — the counters ride the
    scan itself (partial agg per task, merged driver-side); a 100 TB
    pipeline gets its row accounting for free instead of re-scanning."""
    docs = load_table(spark, sf_dir, "documents")
    instrumented, obs = observed(docs, "ingest")
    instrumented.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["rows_seen"], m["rows_with_content"])],
        "rows_seen long, rows_with_content long",
    )
