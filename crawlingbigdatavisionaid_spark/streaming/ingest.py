"""Streaming ingestion with store-level dedup in ``foreachBatch``
(OP-STR-01 + OP-DEDUP-01 + OP-SNK-01 — the reference's 6-hourly loop,
streaming-native).

Why ``foreachBatch`` and not ``dropDuplicates`` state: the reference's
dedup key set is the WHOLE HISTORY of crawled URLs (``crawl.py:73``).
Holding that as streaming state is unbounded; a watermark would forget
old URLs. The scalable form keeps the truth in the store itself — each
micro-batch anti-joins against the store and appends only novel rows:

    batch -> dropDuplicates(url)            (within-batch)
          -> left_anti join store on url    (vs. all history)
          -> append to store

Exactly-once comes from the pair (checkpointed source offsets,
idempotent-enough sink): a replayed batch re-anti-joins against a store
that already contains its rows and appends nothing. With a
transactional table format (Delta/Iceberg) the anti-join+append
collapses into ``MERGE WHEN NOT MATCHED THEN INSERT``.

At 100 TB: the store side of the anti-join prunes to the URL column
(parquet column projection); clustering the store by url (bucketing /
z-order) turns it into a shuffle-light join; AQE handles the batch side
being tiny (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..crawl.pipeline import STORE_SCHEMA, read_store


def ingest_stream(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    checkpoint: str,
    max_files_per_trigger: int | None = None,
) -> list[tuple[int, int]]:
    """Drain all pending input (availableNow) into the store with
    per-batch store-dedup. Returns [(batch_id, rows_appended), ...].
    """
    reader = spark.readStream.schema(STORE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.option("recursiveFileLookup", "true").parquet(input_path)

    appended: list[tuple[int, int]] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = (
            batch_df.dropDuplicates(["url"])
            .join(read_store(spark, store_path).select("url"), "url", "left_anti")
            .cache()
        )
        try:
            n = fresh.count()
            if n:
                fresh.write.mode("append").parquet(store_path)
            appended.append((batch_id, n))
        finally:
            fresh.unpersist()

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended
