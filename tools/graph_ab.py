#!/usr/bin/env python
"""A/B: per-round edge-table exchange vs a pre-partitioned checkpointed
edge table for the Pregel-as-join graph iterators (judge r9 #5).

At 100x the trade graph (~117M edges) BFS / Bellman-Ford / HITS cost
~250 s — per-round FULL edge-table scans and shuffles. The hypothesis
under test: materializing the edge table ALREADY HASH-PARTITIONED by
``src`` (``repartition(src).localCheckpoint()`` — LogicalRDD preserves
outputPartitioning) removes the edge-side Exchange from every round's
join, leaving only the small frontier to shuffle; at cluster scale the
same layout is a bucketed table, and a frontier-bucket-pruned scan.

Variant B runs the IDENTICAL frontier loop; only the edge
materialization differs.  Output: one JSON line with per-variant walls
and the result-equality check (the two variants must produce identical
hop tables / distance tables — this is a plan experiment, not a
semantics change).  The verdict lands in PLANS.md either way: adopt if
it pays at local[32], record as the accepted Pregel cost if not.

Usage: python tools/graph_ab.py [K] [base_sf_dir] [rounds] [variants]

``variants`` (csv of A,B — default both) lets each arm run in its own
process at K=100: localCheckpoint blocks from a finished arm are not
individually releasable from Python, and two arms' worth of 117M-edge
materializations in one 48g JVM OOM the second arm — the same
isolation rule bench.py applies per family.  Result equality across
arms is then asserted by comparing the printed ``rows`` field.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")

SEED = "s:1"
HOPS = 4


def _edges(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))


def _bfs(spark, edges):
    """The registered trade_bfs_hops loop body, edge table injected."""
    from pyspark.sql import functions as F

    visited = spark.createDataFrame([(SEED, 0)], "node string, hop int")
    frontier = visited
    for i in range(1, HOPS + 1):
        discovered = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "anti")
            .withColumn("hop", F.lit(i))
        )
        frontier = discovered.localCheckpoint(eager=False)
        visited = visited.unionByName(frontier).localCheckpoint(eager=False)
    return (
        visited.groupBy("hop")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("first_node"),
            F.max("node").alias("last_node"),
        )
        .orderBy("hop")
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    variants = (sys.argv[4] if len(sys.argv) > 4 else "A,B").split(",")

    from crawlingbigdatavisionaid_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dedup_scale_smoke import _replicate_trade

    spark = get_spark("graph-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="graph_ab_")
    res: dict = {"k": k, "base": base}
    try:
        gdir, build_s = _replicate_trade(spark, base, k, out)
        res["trade_build_s"] = build_s

        def run(tag: str, make_edges):
            walls = []
            rows = None
            for _ in range(reps):
                t0 = time.time()
                e = make_edges()
                rows = [tuple(r) for r in _bfs(spark, e).collect()]
                walls.append(round(time.time() - t0, 1))
                e.unpersist() if hasattr(e, "unpersist") else None
            res[tag] = {"walls_s": walls, "best_s": min(walls)}
            return rows

        rows_a = rows_b = None
        if "A" in variants:
            # A: plain lazy localCheckpoint — the join re-exchanges the
            # edge table every round
            rows_a = run(
                "A_plain_checkpoint",
                lambda: _edges(spark, gdir).localCheckpoint(eager=False),
            )
            res["rows"] = rows_a
        if "B" in variants:
            # B: src-partitioned materialization — rounds reuse the
            # edge partitioning, only the frontier side shuffles
            rows_b = run(
                "B_src_partitioned",
                lambda: _edges(spark, gdir)
                .repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions")), "src"
                )
                .localCheckpoint(eager=False),
            )
            res["rows"] = rows_b
        if "C" in variants:
            # C: src-partitioned AND sorted within partitions — the
            # bucketed-table layout; if LogicalRDD carries the ordering,
            # per-round sort-merge joins skip both exchange AND sort
            rows_c = run(
                "C_src_partitioned_sorted",
                lambda: _edges(spark, gdir)
                .repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions")), "src"
                )
                .sortWithinPartitions("src")
                .localCheckpoint(eager=False),
            )
            res["rows"] = rows_c
        if "D" in variants:
            # D: round-robin repartition, NO key — isolates the
            # partition-count/layout effect from any partitioning-reuse
            # story (the static plans are identical across layouts:
            # LogicalRDD partitioning is not consumed by this join)
            rows_d = run(
                "D_roundrobin_32",
                lambda: _edges(spark, gdir)
                .repartition(
                    int(spark.conf.get("spark.sql.shuffle.partitions"))
                )
                .localCheckpoint(eager=False),
            )
            res["rows"] = rows_d
        if rows_a is not None and rows_b is not None:
            assert rows_a == rows_b, "variants disagree — not a fair A/B"
            res["results_equal"] = True
        res["rows"] = [list(map(str, r)) for r in res["rows"]]
        print(json.dumps(res))
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
