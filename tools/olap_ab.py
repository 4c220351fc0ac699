"""Standing A/B harness for plan changes on ANY registered query
(judge r6 #8 — the protocol that root-caused the r5 sf1 regression,
promoted from a one-off script to a general tool).

Protocol (the ``dedup_components`` exoneration protocol, PLANS.md): one
pre-touched session on an idle box, an optional K-times replica built
in-session, then per query N (default 4) warm runs of each variant
INTERLEAVED (A B A B ...) so slow host windows hit both arms equally;
min-of-runs is the repeatable cost. Per-variant operator counts from
the FINAL adaptive plan land in the same run, so "plan is identical,
cost isn't" claims are checked against the evidence that produced the
timing.

Variants per query:

- ``registered`` — the shipped query exactly as the driver runs it
  (including the statistics-driven ``sources/tables.broadcast_if_small``
  hint where the query uses it);
- ``hinted`` — the same query with ``_hint_dims=True`` (static
  ``F.broadcast`` forced on the audited dim side), emitted only for
  queries whose function accepts the toggle;
- with ``--vs OTHER``, a two-query A/B instead: each listed query is
  interleaved against OTHER's registered form (for comparing two
  implementations of the same result).

Usage::

    python tools/olap_ab.py [query ...] [--k K] [--runs N]
                            [--base DIR] [--vs OTHER]

Defaults: the three r5-flagged OLAP queries, K=10, runs=4, base from
$SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1). ``--k 1`` skips the
replica build and measures on the base dir directly.
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = (
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


def _supports_hint(fn) -> bool:
    try:
        return "_hint_dims" in inspect.signature(fn).parameters
    except (TypeError, ValueError):
        return False


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("queries", nargs="*", default=None,
                    help="registered query names (default: r5 OLAP trio)")
    ap.add_argument("--k", type=int, default=10,
                    help="replica factor; 1 = measure the base dir directly")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--base",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--vs", default=None, metavar="OTHER",
                    help="A/B each query against OTHER (registered form) "
                         "instead of its own hint toggle")
    args = ap.parse_args()
    names = tuple(args.queries) or DEFAULT_QUERIES

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
    unknown = [n for n in names if n not in qmap]
    if unknown or (args.vs and args.vs not in qmap):
        raise SystemExit(f"not registered: {unknown or [args.vs]}")

    out = tempfile.mkdtemp(prefix="olap_ab_") if args.k > 1 else args.base
    result: dict[str, object] = {"k": args.k, "runs": args.runs, "base": args.base}
    try:
        if args.k > 1:
            t0 = time.perf_counter()
            scale_smoke.build_scaled(spark, args.base, out, args.k)
            result["build_s"] = round(time.perf_counter() - t0, 1)

        for name in names:
            fn = qmap[name]
            variants = {"registered": lambda fn=fn: fn(spark, out)}
            if args.vs:
                other = qmap[args.vs]
                variants[f"vs:{args.vs}"] = lambda other=other: other(spark, out)
            elif _supports_hint(fn):
                variants["hinted"] = lambda fn=fn: fn(spark, out, _hint_dims=True)
            else:
                result.setdefault("notes", []).append(  # type: ignore[union-attr]
                    f"{name}: no _hint_dims toggle; timing the registered "
                    "form only (pass --vs OTHER for a two-query A/B)"
                )
            # warmup both shapes once (codegen compile, footer caches)
            plans = {v: _final_plan_counts(mk()) for v, mk in variants.items()}
            times: dict[str, list[float]] = {v: [] for v in variants}
            for _ in range(args.runs):  # interleaved A B A B ...
                for v, mk in variants.items():
                    t0 = time.perf_counter()
                    mk().write.format("noop").mode("overwrite").save()
                    times[v].append(round(time.perf_counter() - t0, 3))
            result[name] = {
                v: {"min_s": min(ts), "runs_s": ts, "plan": plans[v]}
                for v, ts in times.items()
            }
    finally:
        if args.k > 1:
            shutil.rmtree(out, ignore_errors=True)

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
