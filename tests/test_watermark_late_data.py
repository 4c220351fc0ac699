"""Watermark semantics: once the watermark has passed a window's end and
the window is finalized (append-mode eviction), a straggler for that
window is dropped — it can no longer change the emitted result.

Note the exact Spark contract verified here: a late row arriving in the
SAME batch in which its window is evicted still merges (state is live
until end-of-batch); only rows arriving AFTER the eviction batch are
dropped. Hence three batches: advance, evict, straggle."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


def _at(h: int, m: int) -> dt.datetime:
    return T0.replace(hour=h, minute=m)


@pytest.fixture()
def late_batches(spark):
    d = tempfile.mkdtemp(prefix="late_batches_")
    schema = "event_id long, ts timestamp"
    batches = [
        # batch 0: opens [10,11) and [12,13)
        [(1, _at(10, 15)), (2, _at(12, 0))],
        # batch 1: 13:30 pushes the watermark to 13:00 at commit ->
        # [10,11) and [12,13) finalize and emit
        [(3, _at(13, 30))],
        # batch 2: 10:45 targets the finalized [10,11) -> DROPPED;
        # 14:30 advances the watermark to 14:00, closing [13,14)
        [(4, _at(10, 45)), (5, _at(14, 30))],
    ]
    now = 1_700_000_000
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(f"{d}/b{i}")
        for f in os.listdir(f"{d}/b{i}"):
            os.utime(f"{d}/b{i}/{f}", (now + i * 60, now + i * 60))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_straggler_after_window_finalization_is_dropped(spark, late_batches):
    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(late_batches)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("start"), "cnt")
    )
    name = "late" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_late_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        (p["stateOperators"][0]["numRowsDroppedByWatermark"] if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # the 10:45 straggler

    out = {r["start"]: r["cnt"] for r in spark.table(name).collect()}
    # [10,11) finalized with ONE event; the straggler never reopened it.
    # [14,15) stays open past end-of-input (append mode emits only
    # watermark-passed windows).
    assert out == {_at(10, 0): 1, _at(12, 0): 1, _at(13, 0): 1}
