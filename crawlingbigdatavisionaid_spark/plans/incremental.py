"""Incremental materialized-view maintenance over ingest batches.

The reference re-crawls every 6 hours and its dashboard re-reads the
whole store each render (/root/reference/crawl.py:155, app.py:60-75).
At 100 TB the dashboard aggregates must be MAINTAINED, not recomputed:
each micro-batch folds its partial aggregate into an aggregate-sized
state table, and the full-corpus scan never runs again. These two
queries pin the algebra that makes that safe — re-aggregation of
mergeable partials (count/sum) and sketch-union linearity (HLL for
COUNT DISTINCT, which is NOT trivially mergeable from counts alone).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table
from .registry import register

_N_BATCHES = 3  # simulated ingest batches: event_id % 3 deciles


@register(
    "incremental_mv_daily",
    ops=("OP-AGG-03", "OP-AGG-06", "OP-SNK-01"),
    oracle="""
        SELECT CAST(ts AS DATE) AS day, event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """,
)
def incremental_mv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-maintained daily rollup: the (day, event_type) ->
    (count, sum) materialized view is built by folding three simulated
    ingest batches (event_id % 3), each contributing only its own
    PARTIAL aggregate; the state merge re-aggregates the union of the
    old state with the new partial — both aggregate-sized tables. The
    oracle recomputes from scratch, so the hash check proves the
    incremental fold is exactly the full recompute (count/sum are
    commutative monoids; the merge order cannot matter).

    Scale shape: per batch, the corpus-sized scan collapses map-side
    into |days x types| partial rows; the merge shuffles only
    aggregate-sized state. A deployment runs this inside
    ``foreachBatch`` against a keyed store (the ``sources/merge``
    seam); the view's total maintenance cost tracks the DELTA, never
    the archive — the reference's full-store re-read is the
    anti-pattern this replaces."""
    ev = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    day = F.to_date("ts").alias("day")

    def partial(i: int) -> DataFrame:
        return (
            ev.where(F.col("event_id") % _N_BATCHES == i)
            .groupBy(day, "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("_sv"),
            )
        )

    def merge(state: DataFrame, batch: DataFrame) -> DataFrame:
        return (
            state.unionByName(batch)
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_sv").alias("_sv"),
            )
        )

    state = reduce(merge, [partial(i) for i in range(_N_BATCHES)])
    return state.select(
        "day",
        "event_type",
        "n_events",
        F.round("_sv", 2).alias("sum_value"),
    )


@register(
    "hll_partial_merge",
    ops=("OP-X-APPROX-01", "OP-AGG-06"),
    # the sketch bytes are engine-internal (Apache DataSketches); the
    # oracle pins the verdicts: union-of-partials must agree with the
    # single-pass sketch (merge linearity) and land within 2% of exact
    oracle="""
        SELECT event_type, TRUE AS merge_consistent, TRUE AS within_2pct
        FROM events GROUP BY event_type
    """,
)
def hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT DISTINCT under incremental maintenance: per-type distinct
    users cannot be maintained from per-batch distinct COUNTS (distincts
    overlap across batches), but per-batch HLL SKETCHES union losslessly
    — the sketch is the mergeable partial. Each simulated batch
    (event_id % 3) builds ``hll_sketch_agg(user_id)``; the state fold is
    ``hll_union_agg``. Verdicts per event_type: the merged estimate
    equals the single-pass estimate to within 1% (sketch-union
    linearity) and is within 2% of the exact distinct count (the
    measurement harness — exact distinct is what the sketch replaces at
    100 TB, where per-type user sets dwarf executor memory).

    Scale shape: partials are |types x batches| sketch rows of a few KB
    each; the union shuffles only those. The exact ``countDistinct``
    here exists solely to grade the estimate."""
    ev = load_table(spark, sf_dir, "events")
    parts = (
        ev.withColumn("b", F.col("event_id") % _N_BATCHES)
        .groupBy("event_type", "b")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = parts.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "direct_est"
        ),
        F.countDistinct("user_id").alias("exact"),
    )
    j = merged.join(direct, "event_type")
    return j.select(
        "event_type",
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= 0.01 * F.col("direct_est")
        ).alias("merge_consistent"),
        (
            F.abs(F.col("merged_est") - F.col("exact"))
            <= 0.02 * F.col("exact")
        ).alias("within_2pct"),
    )
