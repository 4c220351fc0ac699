"""Table maintenance: small-file compaction.

An append-per-batch silver table (the crawl sink, OP-SNK-01) accretes
one file per micro-batch per partition; at 6-hourly cadence that is
~1.5k files/partition/year. Small files are the classic large-table
killer: every query pays per-file open/footer costs and the scheduler
pays per-split overhead. Compaction rewrites a table (or one partition
of it) into files of a target size.

Design notes for 100 TB:
- compact one PARTITION at a time (pass the partition path) so the
  rewrite is incremental and parallelizable across partitions;
- target file count = ceil(bytes / target_bytes) with a floor of 1 —
  sized from the actual on-disk footprint, not row counts;
- the rewrite is write-to-temp + atomic-ish swap; Spark's committer
  handles task-level atomicity, the final directory swap is the caller's
  transaction boundary (a table format — Delta/Iceberg — makes this a
  metadata-only commit; plain parquet needs the swap).
"""

from __future__ import annotations

import math
import os
import shutil


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: str | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(size/target_bytes)`` files; returns the new file count.

    ``sort_by`` optionally clusters rows within files so min/max
    row-group stats prune better on that column afterward.
    """
    n_files = max(1, math.ceil(dir_bytes(path) / target_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(sort_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    # swap: the non-atomic window is the caller's transaction boundary
    bak = path.rstrip("/") + "._compact_bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return n_files
