"""Sketch accuracy: approx_percentile within tolerance of the exact
percentiles; approx_count_distinct within standard-error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.plans import query_map
from crawlingbigdatavisionaid_spark.sources import load_table


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    q = query_map()
    exact = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in q["value_percentiles_by_type"](spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in q["approx_value_percentiles"](spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, (p50, p95) in exact.items():
        a50, a95 = approx[et]
        assert abs(a50 - p50) / max(abs(p50), 1.0) < 0.1, (et, a50, p50)
        assert abs(a95 - p95) / max(abs(p95), 1.0) < 0.1, (et, a95, p95)


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.15


def test_stratified_sample_proportions(spark, sf_dir):
    from crawlingbigdatavisionaid_spark.plans import query_map

    docs = load_table(spark, sf_dir, "documents")
    full = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    fractions = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    sampled = {
        r["lang"]: r["cnt"]
        for r in docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # non-downsampled strata survive whole; 'en' lands near 50%
    for lang, n in full.items():
        if lang == "en":
            assert 0.3 <= sampled[lang] / n <= 0.7, (sampled[lang], n)
        else:
            assert sampled[lang] == n
    # and the registered query's per-stratum verdict is all-TRUE
    verdicts = {
        r["lang"]: r["sampled_ok"]
        for r in query_map()["stratified_sample_by_lang"](spark, sf_dir).collect()
    }
    assert verdicts == {lang: True for lang in full}


def test_stratified_sample_is_deterministic(spark, sf_dir):
    from crawlingbigdatavisionaid_spark.plans import query_map

    fn = query_map()["stratified_sample_by_lang"]
    a = sorted(map(tuple, fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert a == b
