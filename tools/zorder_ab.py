#!/usr/bin/env python
"""A/B: row-group pruning under three physical layouts — unsorted,
single-column sorted, Z-order (Morton) clustered — for 2-D box
predicates (the ``OPTIMIZE ZORDER`` question: does interleaved
clustering pay on this engine's scan path?).

The corpus is ``events`` replicated K× (row-group structure is what is
under test, not values). Each layout writes the SAME rows with small
row groups (so pruning granularity is visible), then two predicates run
against each:

- ``box``: user range AND day range (both ~1/8 of their domain —
  the dashboard drill-down shape);
- ``user``: user range only (the single-key shape a plain sort serves
  best).

Two measures per (layout, predicate):

- ``rg_frac`` — the fraction of parquet row groups whose column
  min/max stats OVERLAP the predicate box, read from the footers with
  pyarrow: the deterministic, execution-independent pruning bound (a
  reader that trusts stats scans exactly these);
- ``wall_s`` — Spark wall time of the filtered count (the end-to-end
  effect, includes the stats-based row-group skip in the parquet
  reader).

Expected shape (and what round 10 measured — see SURVEY §6): the plain
user-sort is unbeatable for the user-only predicate but its day stats
are useless (every row group spans all days), so the box predicate
degrades to the user-dim bound; Z-order is slightly worse on the
single key but bounds BOTH dims, multiplying the prunable fraction for
the box. Unsorted prunes nothing on either.

Usage: python tools/zorder_ab.py [K] [base_sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

ROW_GROUP_ROWS = 64 * 1024


def main() -> None:
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.plans.layout import _morton_spark
    from crawlingbigdatavisionaid_spark.session import get_spark
    from crawlingbigdatavisionaid_spark.sources import load_table

    spark = get_spark("zorder-ab")
    ev = (
        load_table(spark, SF, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", F.datediff(F.to_date("ts"), F.lit("2025-01-01")).alias("day_idx"))
    )
    reps = spark.range(K).select(F.col("id").alias("rep"))
    base = ev.crossJoin(reps).select("user_id", "day_idx")
    n_rows = base.count()
    lo_u, hi_u, lo_d, hi_d = base.agg(
        F.min("user_id"), F.max("user_id"), F.min("day_idx"), F.max("day_idx")
    ).collect()[0]
    # ~1/8 of each domain, centered
    u_a = lo_u + (hi_u - lo_u) * 7 // 16
    u_b = lo_u + (hi_u - lo_u) * 9 // 16
    d_a = lo_d + (hi_d - lo_d) * 7 // 16
    d_b = lo_d + (hi_d - lo_d) * 9 // 16
    preds = {
        "box": (
            (F.col("user_id").between(u_a, u_b))
            & (F.col("day_idx").between(d_a, d_b)),
            {"user_id": (u_a, u_b), "day_idx": (d_a, d_b)},
        ),
        "user": (
            F.col("user_id").between(u_a, u_b),
            {"user_id": (u_a, u_b)},
        ),
    }
    # normalize both dimensions to a COMMON bit width before
    # interleaving (what OPTIMIZE ZORDER's range-id pass does): raw
    # interleave of an 11-bit user domain with a 5-bit day domain puts
    # user bits in all the high positions and the "Z" degenerates into
    # a plain user sort — measured exactly that before this fix
    # (box rg_frac 0.151 z vs 0.132 user-sorted at 152 row groups)
    u_n = f"CAST((user_id - {lo_u}) * 1024 DIV {hi_u - lo_u + 1} AS BIGINT)"
    d_n = f"CAST((day_idx - {lo_d}) * 1024 DIV {hi_d - lo_d + 1} AS BIGINT)"
    zexpr = F.expr(_morton_spark(f"({u_n})", f"({d_n})"))
    # one row group per file (dictionary encoding keeps these columns'
    # buffered size under any block threshold, so files ARE the pruning
    # granularity here — at production scale the same math applies per
    # row group inside larger files)
    n_files = max(16, n_rows // ROW_GROUP_ROWS)
    layouts = {
        # shuffled round-robin: the "ingest order" baseline
        "unsorted": lambda df: df.repartition(n_files),
        "user_sorted": lambda df: df.repartitionByRange(
            n_files, "user_id"
        ).sortWithinPartitions("user_id"),
        "zorder": lambda df: df.withColumn("zval", zexpr)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("zval"),
    }
    out = {"k": K, "sf_dir": SF, "n_rows": n_rows, "layouts": {}}
    root = tempfile.mkdtemp(prefix="zorder_ab_")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    try:
        for name, fn in layouts.items():
            path = os.path.join(root, name)
            (
                fn(base)
                .write.option("parquet.block.size", 1 << 20)
                .mode("overwrite")
                .parquet(path)
            )
            # footer stats: overlap fraction per predicate
            rgs = []
            for f in os.listdir(path):
                if not f.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(path, f)).metadata
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    stats = {}
                    for c in range(rg.num_columns):
                        col = rg.column(c)
                        st = col.statistics
                        stats[col.path_in_schema] = (st.min, st.max)
                    rgs.append(stats)
            res = {"n_row_groups": len(rgs), "preds": {}}
            for pname, (cond, box) in preds.items():
                overlap = sum(
                    1
                    for st in rgs
                    if all(
                        st[c][0] <= hi and st[c][1] >= lo
                        for c, (lo, hi) in box.items()
                    )
                )
                t0 = time.time()
                got = spark.read.parquet(path).where(cond).count()
                wall = time.time() - t0
                res["preds"][pname] = {
                    "rg_frac": round(overlap / max(1, len(rgs)), 4),
                    "overlap_rgs": overlap,
                    "wall_s": round(wall, 2),
                    "rows": got,
                }
            out["layouts"][name] = res
        # result equality across layouts (layout must not change answers)
        for pname in preds:
            vals = {
                out["layouts"][m]["preds"][pname]["rows"] for m in layouts
            }
            assert len(vals) == 1, f"row mismatch across layouts for {pname}"
        out["rows_equal"] = True
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
