"""Spark 4 Python Data Source API: the crawl fetch stage as a
FIRST-CLASS source instead of mapInPandas glue.

``spark.read.format("crawlpages")`` covers OP-SRC-01/02 (the reference's
``requests.get`` listing/article fetches, crawl.py:32-36,78): each seed
site (or article shard) is one ``InputPartition``, so Spark schedules
fetch work like any other scan — executors pull their own partitions,
stragglers can be speculated, and the downstream extraction/dedup plan
composes on top as a normal DataFrame. At 100 TB the identical shape
reads pre-crawled WARC shards (one partition per archive file); a live
HTTP reader would issue requests inside ``read()`` with per-domain rate
limits, keeping the network entirely on the executors.

No network exists in this environment, so pages come from the
deterministic fixture set (extraction/fixtures.py) — the partitioning,
serialization, and schema plumbing are the real thing.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class CrawlPagesDataSource(DataSource):
    """``format("crawlpages")``; ``option("kind", "listing"|"article")``."""

    @classmethod
    def name(cls) -> str:
        return "crawlpages"

    def schema(self) -> str:
        if self.options.get("kind", "listing") == "article":
            return "url string, html string"
        return "source string, base_url string, html string"

    def reader(self, schema) -> DataSourceReader:
        return _FixturePagesReader(dict(self.options))


class _FixturePagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.kind = options.get("kind", "listing")

    def _rows(self) -> Sequence[tuple]:
        from ..extraction import fixtures as FX

        return FX.ARTICLE_PAGES if self.kind == "article" else FX.LISTING_PAGES

    def partitions(self) -> list[InputPartition]:
        # one partition per seed page: fetch parallelism = shard count,
        # visible to (and scheduled by) Spark, not hidden in a UDF
        return [InputPartition(i) for i in range(len(self._rows()))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield self._rows()[partition.value]


def register_crawl_source(spark: SparkSession) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(CrawlPagesDataSource)
