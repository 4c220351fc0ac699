"""Physical table layout: partitioned and bucketed storage.

The reference's store is one unindexed MongoDB collection — every dedup
probe is a collection scan (``crawl.py:73``) and every dashboard query a
full fetch. The Spark-native layout choices that replace it, and what
each buys at 100 TB:

- **Hive-style partitioning** (``partitionBy`` on low-cardinality,
  always-filtered columns — here ``source`` and ingest date): queries
  that filter on those columns prune whole directories before any I/O
  (``PartitionFilters`` in the scan, distinct from row-group
  ``PushedFilters``).

- **Bucketing** (``bucketBy(n, key)`` into a managed table): rows are
  hash-clustered by the join/dedup key at WRITE time, so every
  subsequent join/aggregation on that key skips its shuffle — the
  repeated anti-join dedup of the crawl loop becomes shuffle-free on
  the store side. The classic trade: one sort+cluster cost at ingest,
  amortized over every downstream read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("source", "ingest_date"),
    mode: str = "append",
) -> None:
    """Write a silver table partitioned for pruning.

    Adds ``ingest_date`` from ``crawled_at`` when absent (the layout
    column should be derived, never trusted from input).
    """
    out = df
    if "ingest_date" in partition_cols and "ingest_date" not in df.columns:
        out = out.withColumn("ingest_date", F.to_date("crawled_at"))
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Save as a managed table hash-clustered by ``bucket_col``.

    ``sortBy`` the same key so merge-style reads are sequential.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
