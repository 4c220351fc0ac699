"""Benchmark runner (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Materialization is a noop-format write — full execution of every
operator with no driver-collect overhead distorting the timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "timeline_gapfill",
    "word_topk",
    "source_distribution",
    "dedup_exact",
    "dedup_anti_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "region_revenue",
    "top_customers",
    "window_tumbling_1h",
    "window_sliding_1h_30m",
    "session_windows_30m",
    "json_k_stats_by_type",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_force_topk",
    "corpus_tfidf",
    "quality_score",
    "multimodal_features",
    "q6_forecast_revenue",
    "q14_promo_revenue_share",
    "asof_click_purchase",
    "range_join_clicks_before_purchase",
    "revenue_rollup_region_nation",
    "top3_orders_per_customer",
    "q18_large_volume_orders",
    "q21_sole_returned_supplier",
    "q22_idle_rich_customers",
    "dedup_components",
    "training_corpus",
    "pack_sequences",
    "split_contamination",
    "hash_sample_by_lang",
    # round 3 additions
    "ann_brute_force_topk_np",
    "multimodal_decode_image",
    "doc_chunks",
    "embedding_quantize_int8",
    "url_canonical_dedup",
    # round 4 additions
    "dedup_containment",
    "boilerplate_phrases",
    "multimodal_decode_audio",
    "multimodal_decode_video",
    "token_rarity_score",
    "train_test_ngram_overlap",
    "dsir_target_affinity",
    "domain_mix_weights",
    "duplicate_spans",
    "semdedup_prune",
    "crawl_frontier_schedule",
    "dedup_ensemble_audit",
    "span_dedup_stats",
    "lang_temperature_weights",
    "bpe_top_merges",
    "incremental_ingest_dedup",
    "ann_filtered_topk",
    # round 5 additions (batch-side; stream_* verdicts run streaming
    # queries with checkpoint setup and stay out of the timing list)
    "dedup_simhash_recall",
    "incremental_minhash_recall",
    "semdedup_greedy_audit",
    # round 6 additions
    "containment_minhash_recall",
    "curated_corpus",
    # round 7 additions
    "lm_bigram_nll",
    "q5_local_supplier_volume",
    "q10_returned_item_ranking",
    "q13_order_count_distribution",
    "q19_disjunctive_revenue",
    # round 7 (continued): the TPC-H fill-out and the new pipeline ops
    "q2_best_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q16_supplier_part_variety",
    "q20_excess_shippers",
    "chunk_dedup_rebuild",
    "gopher_quality_filter",
    "ann_hard_negatives",
    "bpe_encode_by_lang",
    # round 7 (continued): sketch + incremental-maintenance operators
    "lm_trigram_backoff",
    "bloom_dedup_probe",
    "cms_heavy_hitters",
    "winnow_fingerprint_pairs",
    "incremental_mv_daily",
    "hll_partial_merge",
    "weighted_sample_aes",
    "vocab_growth_deciles",
    "lang_id_confusion",
    "bigram_pmi_topk",
    "semdedup_threshold_sweep",
    "kmv_distinct_sketch",
    "daily_anomaly_days",
    "event_funnel_counts",
    "weekly_change_report",
    "customer_rfm_segments",
    "basket_type_lift",
    "cms_screening_verdict",
]


# SF1 section: the 12 join/agg queries re-run on a ~10x replica of the
# bench dir (~6M lineitem rows). Most sf0.1 queries finish in 0.2-0.5s
# where scheduling noise dominates ratios; one larger standing row makes
# round-over-round regressions unambiguous (judge r3 next-round #7).
SF1_K = 10


def _sf1_bench(spark, qmap, base: str) -> dict:
    import shutil
    import tempfile

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    import scale_smoke

    out = tempfile.mkdtemp(prefix="bench_sf1_")
    try:
        t0 = time.perf_counter()
        scale_smoke.build_scaled(spark, base, out, SF1_K)
        build_s = round(time.perf_counter() - t0, 1)
        timings: dict[str, float] = {}
        for name in scale_smoke.QUERIES:
            fn = qmap[name]
            fn(spark, out).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(2):  # min-of-2, same rationale as the warm loop
                t0 = time.perf_counter()
                fn(spark, out).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
        return {
            "sf1_k": SF1_K,
            "sf1_build_s": build_s,
            "sf1_queries": timings,
            "sf1_total": round(sum(timings.values()), 3),
        }
    except Exception as e:  # noqa: BLE001 — bench must always emit its JSON
        return {"sf1_total": None, "sf1_error": str(e)[:200]}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # the sf1 section replicates the fact tables 10x in this JVM; the
    # heap is preallocated AND pre-touched (see session.py) because a
    # growable heap charged 30-50s of kernel page-fault time to whichever
    # queries happened to grow it first — 16 GiB covers the 10x replica
    # and pre-touches in ~40s of startup (not counted in query timings)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")

    from crawlingbigdatavisionaid_spark.plans import query_map
    from crawlingbigdatavisionaid_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()

    # warmup: JIT + parquet footer caches + the nanos-timestamp read path,
    # not part of the measurement
    from crawlingbigdatavisionaid_spark.sources import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # each query runs twice: the first (cold) run carries one-time
    # whole-stage-codegen compilation (~0.5-1s/query shape — constant,
    # irrelevant at scale); the second (warm) run is the steady-state
    # execution cost that actually scales with data volume. Construction
    # time (query-building jobs: localCheckpoint materialization, sizing
    # probes) is recorded separately per cold run so checkpoint-heavy
    # queries' cold/warm split is a measured breakdown, not a mystery
    # (judge r3 next-round #6).
    timings: dict[str, float] = {}
    construct: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in HEADLINE:
        fn = qmap[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        construct[name] = round(t1 - t0, 3)
        # warm = MIN of two timed runs: /proc/stat sampling showed this
        # host throws one-off multi-second stalls (idle-dominated, low
        # steal — hypervisor/THP artifacts) onto single runs; min-of-N
        # is the standard way to measure the repeatable cost
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        warm[name] = round(min(runs), 3)

    sf1 = _sf1_bench(spark, qmap, sf_dir)

    total = round(sum(timings.values()), 3)
    detail = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_construct": construct,
        "queries_warm": warm,
        "warm_total": round(sum(warm.values()), 3),
        "sf": float(sf),
        **sf1,
    }
    # full per-query breakdown first (and persisted to a file): a tail
    # capture of stdout can truncate one long JSON line, so the LAST line
    # is a short, always-parsable summary pointing at the detail file
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "warm_total": detail["warm_total"],
                "sf1_total": detail.get("sf1_total"),
                "n_queries": len(timings),
                "sf": float(sf),
                "detail": "bench_detail.json",
            }
        )
    )


if __name__ == "__main__":
    main()
