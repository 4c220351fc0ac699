"""Spark 4 Python Data Source API: the crawlpages source must expose one
partition per seed page and produce exactly the fixture rows, for both
the listing and article kinds.
"""

from __future__ import annotations

from crawlingbigdatavisionaid_spark.extraction import fixtures as FX
from crawlingbigdatavisionaid_spark.sources.pysource import (
    _FixturePagesReader,
    register_crawl_source,
)


def test_listing_rows_and_schema(spark):
    register_crawl_source(spark)
    df = spark.read.format("crawlpages").load()
    assert df.columns == ["source", "base_url", "html"]
    assert sorted(tuple(r) for r in df.collect()) == sorted(FX.LISTING_PAGES)


def test_article_kind_rows(spark):
    register_crawl_source(spark)
    df = spark.read.format("crawlpages").option("kind", "article").load()
    assert df.columns == ["url", "html"]
    assert sorted(tuple(r) for r in df.collect()) == sorted(FX.ARTICLE_PAGES)


def test_one_partition_per_seed(spark):
    register_crawl_source(spark)
    df = spark.read.format("crawlpages").load()
    assert df.rdd.getNumPartitions() == len(FX.LISTING_PAGES)


def test_reregistration_is_idempotent(spark):
    register_crawl_source(spark)
    register_crawl_source(spark)
    assert spark.read.format("crawlpages").load().count() == len(FX.LISTING_PAGES)


def test_reader_partitions_match_rows():
    r = _FixturePagesReader({"kind": "article"})
    assert len(r.partitions()) == len(FX.ARTICLE_PAGES)
    got = [next(iter(r.read(p))) for p in r.partitions()]
    assert got == list(FX.ARTICLE_PAGES)
