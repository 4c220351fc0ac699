"""Observability: declarative pipeline metrics (OP-STR-03, OP-AGG-06).

The reference instruments its crawl loop with gated ``debug_print``
counters (``crawl.py:25-27``) and per-batch accounting — articles seen,
new rows inserted, running total (``crawl.py:61,113,133-136``). Those are
driver-side prints interleaved with row-at-a-time work; on Spark the
idiomatic forms are:

- **batch**: ``DataFrame.observe`` + ``Observation`` — named aggregate
  expressions evaluated *inside* the job as it runs (no second scan, no
  extra action), collected on the driver after the action completes.
- **streaming**: a ``StreamingQueryListener`` receiving per-micro-batch
  ``numInputRows`` / state metrics from ``QueryProgressEvent`` — the
  streaming analogue of the reference's per-crawl ``new_count`` print.

Scale: observe() metrics are computed as an extra aggregation over rows
already flowing through the plan (partial aggregation per task, merged on
the driver) — constant extra memory per task, no shuffle, no re-read.
At 100 TB that is the only acceptable way to count a pipeline: a separate
``df.count()`` would re-scan the input.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, functions as F
from pyspark.sql.streaming import StreamingQueryListener


def observed(df: DataFrame, name: str = "pipeline_metrics"):
    """Attach standard ingest counters to ``df`` without a second scan.

    Returns ``(instrumented_df, observation)``; read
    ``observation.get`` after the first action on the instrumented frame.
    Mirrors the reference's crawl counters (``crawl.py:133-136``):
    rows seen, rows with usable content, null-date rows.
    """
    obs = Observation(name)
    cols = set(df.columns)
    metrics = [F.count(F.lit(1)).alias("rows_seen")]
    if "text" in cols:
        metrics.append(
            F.sum(
                (F.col("text").isNotNull() & (F.length("text") > 0)).cast("long")
            ).alias("rows_with_content")
        )
    if "ts" in cols:
        metrics.append(
            F.sum(F.col("ts").isNull().cast("long")).alias("null_ts_rows")
        )
    return df.observe(obs, *metrics), obs


@dataclass
class BatchMetrics:
    """Per-micro-batch progress collected by :class:`MicroBatchCounter`."""

    batch_id: int
    num_input_rows: int


@dataclass
class MicroBatchCounter(StreamingQueryListener):
    """StreamingQueryListener that records ``numInputRows`` per
    micro-batch — the streaming form of the reference's per-crawl
    ``new_count`` accounting (``crawl.py:113,133-136``, OP-AGG-06).
    """

    batches: list[BatchMetrics] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(BatchMetrics(p.batchId, p.numInputRows))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - trivial
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - trivial
        pass

    @property
    def total_input_rows(self) -> int:
        return sum(b.num_input_rows for b in self.batches)
