"""Cross-micro-batch state carry for the applyInPandasWithState
sessionizer: a session spanning a batch boundary must merge via state,
and closed sessions must emit exactly once (final_flush=False)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import uuid

import pytest

from crawlingbigdatavisionaid_spark.streaming.stateful import user_sessions_stream

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _min(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture()
def two_batch_dir(spark):
    """Two parquet files -> two micro-batches with maxFilesPerTrigger=1.

    File order is mtime-based in the file source; write batch1 first.
    """
    d = tempfile.mkdtemp(prefix="sess_batches_")
    schema = "user_id long, ts timestamp"
    batch1 = [(1, _min(0)), (1, _min(10)), (2, _min(0))]
    # user 1: +15min continues the open session; +60min closes it and
    # opens a new one. user 2: nothing more -> session stays open/unemitted.
    batch2 = [(1, _min(15)), (1, _min(60))]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(f"{d}/b1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(f"{d}/b2")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_session_spans_micro_batch_boundary(spark, two_batch_dir):
    schema = "user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(two_batch_dir)
    )
    sessions = user_sessions_stream(stream, gap_s=1800, final_flush=False)
    name = "sess" + uuid.uuid4().hex[:8]
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_sess_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["user_id"], r["sess_no"]): r for r in spark.table(name).collect()
    }
    # exactly ONE emission: user 1's first session, closed by the +60min
    # event, containing events from BOTH batches (0, 10, 15 min)
    assert set(rows) == {(1, 1)}
    s = rows[(1, 1)]
    assert s["n_events"] == 3
    assert s["session_start"] == _min(0)
    assert s["session_end"] == _min(15)


def test_state_survives_query_restart(spark, tmp_path):
    """The open session persists in the STATE STORE across separate
    query runs sharing a checkpoint — the 6-hourly availableNow cadence
    relies on exactly this."""
    d = str(tmp_path / "in")
    ckpt = tempfile.mkdtemp(prefix="ckpt_restart_")
    schema = "user_id long, ts timestamp"

    def run_drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        sessions = user_sessions_stream(stream, gap_s=1800, final_flush=False)
        # the memory sink cannot recover from a checkpoint; foreachBatch can
        emitted: list = []

        def sink(batch_df, _bid):
            emitted.extend(batch_df.collect())

        q = (
            sessions.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    import os

    spark.createDataFrame(
        [(1, _min(0)), (1, _min(10))], schema
    ).coalesce(1).write.parquet(f"{d}/b1")
    for f in os.listdir(f"{d}/b1"):
        os.utime(f"{d}/b1/{f}", (1_700_000_000, 1_700_000_000))
    out1 = run_drain()
    assert out1 == []  # session still open, nothing emitted

    # SECOND query run (fresh stream): the +60min event must close the
    # session using state reloaded from the checkpoint's state store
    spark.createDataFrame([(1, _min(60))], schema).coalesce(1).write.parquet(
        f"{d}/b2"
    )
    for f in os.listdir(f"{d}/b2"):
        os.utime(f"{d}/b2/{f}", (1_700_000_060, 1_700_000_060))
    out2 = run_drain()
    assert len(out2) == 1
    s = out2[0]
    assert (s["user_id"], s["sess_no"], s["n_events"]) == (1, 1, 2)
    assert s["session_start"] == _min(0)
    assert s["session_end"] == _min(10)
