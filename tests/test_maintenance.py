"""Compaction: many small append files -> few right-sized files, data
byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.sources.maintenance import (
    compact,
    data_file_count,
    dir_bytes,
)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "silver")
    # simulate 12 micro-batch appends of 32 partitions each
    for b in range(12):
        spark.range(b * 1000, (b + 1) * 1000).withColumn(
            "v", F.col("id") * 2
        ).write.mode("append").parquet(path)
    before_files = data_file_count(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before_files > 50  # the small-file problem is real here

    target = max(1, dir_bytes(path))  # everything fits one target file
    n = compact(spark, path, target_bytes=target, sort_by="id")
    assert n == 1
    assert data_file_count(path) == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_compaction_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(50_000).withColumn("v", F.rand(seed=1)).write.parquet(path)
    size = dir_bytes(path)
    n = compact(spark, path, target_bytes=size // 4 + 1)
    assert n == 4
    assert data_file_count(path) == 4
