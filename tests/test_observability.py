"""Observability (OP-STR-03, OP-AGG-06): observe() metrics ride the job;
StreamingQueryListener counts micro-batch input rows."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.observability import MicroBatchCounter, observed
from crawlingbigdatavisionaid_spark.sources import load_table


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    instrumented, obs = observed(docs, "t_ingest")
    instrumented.write.format("noop").mode("overwrite").save()
    m = obs.get

    expected = docs.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            (F.col("text").isNotNull() & (F.length("text") > 0)).cast("long")
        ).alias("content"),
    ).first()
    assert m["rows_seen"] == expected["rows"]
    assert m["rows_with_content"] == expected["content"]


def test_streaming_listener_counts_input_rows(spark, sf_dir):
    counter = MicroBatchCounter()
    spark.streams.addListener(counter)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        agg = stream.agg(F.count(F.lit(1)).alias("n"))
        name = "obs" + uuid.uuid4().hex[:8]
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_obs_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        # listener events are delivered asynchronously; progress for a
        # terminated availableNow query lands promptly but not instantly
        import time

        deadline = time.time() + 30
        while counter.total_input_rows < expected and time.time() < deadline:
            time.sleep(0.2)
        assert counter.total_input_rows == expected
        assert spark.table(name).first()["n"] == expected
    finally:
        spark.streams.removeListener(counter)
