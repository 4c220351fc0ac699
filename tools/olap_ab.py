"""A/B: static broadcast hint vs AQE runtime conversion on the sf1 OLAP
queries the r5 bench flagged (judge r5 next-round #1).

Context: round 5 removed the static ``F.broadcast()`` hints from every
join side that grows with the corpus (scale-safety — a static hint
hard-fails at 100 TB; AQE converts at runtime when a side fits). The r5
standing sf1 rows then showed ``revenue_rollup_region_nation`` 0.63 ->
1.85 s, ``region_revenue`` 1.30 -> 1.82 s, ``q21_sole_returned_supplier``
warm 0.74 -> 1.18 s. The judge's own 10x plan audit confirmed the final
adaptive plans are still all-broadcast, so the residue is either (a)
AQE's pre-conversion cost — the static planner picks SMJ from parquet
size estimates, so the build side pays its shuffle MAP WRITE before AQE
re-plans the probe side to a broadcast + local shuffle read — or (b)
bench-context variance.

Protocol (the ``dedup_components`` exoneration protocol, PLANS.md): one
pre-touched session on an idle box, a 10x replica built in-session, then
per query N (default 4) warm runs of each variant INTERLEAVED
(A B A B ...) so slow host windows hit both arms equally; min-of-runs is
the repeatable cost. Variant A = registered query (hint-free), variant
B = same plan with ``_hint_dims=True`` (static broadcast on the audited
side). Also reports per-variant exchange/broadcast counts from the final
adaptive plan so the "plan is identical, cost isn't" claim is checked in
the same run.

Usage: python tools/olap_ab.py [K] [RUNS]   (defaults K=10, RUNS=4)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = (
    "revenue_rollup_region_nation",
    "region_revenue",
    "q21_sole_returned_supplier",
)


def _final_plan_counts(df) -> dict[str, int]:
    """Execute, then count operators in the FINAL adaptive plan."""
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|SinglePartition|rangepartitioning)", plan)),
        "aqe_shuffle_reads": len(re.findall(r"AQEShuffleRead", plan)),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")

    import shutil
    import tempfile

    import scale_smoke

    from crawlingbigdatavisionaid_spark.plans import query_map
    from crawlingbigdatavisionaid_spark.session import get_spark

    spark = get_spark("olap-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = query_map()

    out = tempfile.mkdtemp(prefix="olap_ab_")
    result: dict[str, object] = {"k": k, "runs": runs}
    try:
        t0 = time.perf_counter()
        scale_smoke.build_scaled(spark, base, out, k)
        result["build_s"] = round(time.perf_counter() - t0, 1)

        for name in QUERIES:
            fn = qmap[name]
            # "registered" = the shipped query (statistics-driven hint,
            # sources/tables.broadcast_if_small); "hinted" = static
            # F.broadcast forced; "nohint" would need the helper disabled
            # and is represented by the r6 pre-fix numbers in PLANS.md.
            variants = {
                "registered": lambda: fn(spark, out),
                "hinted": lambda: fn(spark, out, _hint_dims=True),
            }
            # warmup both shapes once (codegen compile, footer caches)
            plans = {v: _final_plan_counts(mk()) for v, mk in variants.items()}
            times: dict[str, list[float]] = {v: [] for v in variants}
            for _ in range(runs):  # interleaved A B A B ...
                for v, mk in variants.items():
                    t0 = time.perf_counter()
                    mk().write.format("noop").mode("overwrite").save()
                    times[v].append(round(time.perf_counter() - t0, 3))
            result[name] = {
                v: {"min_s": min(ts), "runs_s": ts, "plan": plans[v]}
                for v, ts in times.items()
            }
    finally:
        shutil.rmtree(out, ignore_errors=True)

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
