#!/usr/bin/env python
"""Planted-skew join demo: one hot customer owning ~20% of all orders.

Real crawl/event data is Zipf-skewed, so the shuffle join that works on
uniform keys dies on production keys: every row of the hot key hashes to
ONE task. This tool builds a K-replicated ``orders`` with 20% of rows
remapped to a single ``o_custkey`` and runs the customer⋈orders revenue
aggregation three ways, with broadcast joins disabled (simulating the
big⋈big case where the dim side does NOT fit in memory):

  plain   AQE skew-join splitting OFF  — the hot partition serializes
  aqe     AQE skew-join splitting ON   — runtime split of the hot
          partition (threshold lowered so the demo data qualifies)
  salted  explicit operators/skew.salted_join, 32 salts — the
          compile-time guarantee for engines/joins AQE can't re-plan
          (streaming stateful joins, known-enormous keys)

All three MUST produce identical aggregates (asserted); the print shows
per-variant wall seconds plus whether AQE actually split (``skew=true``
in the final adaptive plan).

Usage: python tools/skew_smoke.py [K] [base_sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE_MOD = 5  # every 5th order -> the hot key (~20%)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.operators.skew import salted_join
    from crawlingbigdatavisionaid_spark.session import get_spark
    from crawlingbigdatavisionaid_spark.sources import load_table

    spark = get_spark("skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, base, "orders")
    customer = load_table(spark, base, "customer")
    ok_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    hot_key = customer.agg(F.min("c_custkey")).first()[0]

    reps = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * ok_span))
        for i in range(k)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    skewed = big.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % HOT_SHARE_MOD == 0, F.lit(hot_key)).otherwise(
            F.col("o_custkey")
        ),
    ).localCheckpoint()  # eager: exclude the replica build from join timing

    n_rows = skewed.count()
    hot_rows = skewed.where(F.col("o_custkey") == hot_key).count()

    cust = customer.select("c_custkey", "c_mktsegment")

    def agg_plain(joined):
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
        )

    conf = spark.conf
    saved = {
        key: conf.get(key)
        for key in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }

    results: dict[str, dict] = {}

    def run(name: str, build, confs: dict[str, str]) -> None:
        for c_, v in confs.items():
            conf.set(c_, v)
        try:
            df = build()
            df.write.format("noop").mode("overwrite").save()  # warm codegen
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            rows = {
                r["c_mktsegment"]: (r["orders"], str(r["revenue"]))
                for r in df.collect()
            }
            # AFTER the collect: this QueryExecution's adaptive plan is
            # final and carries the skew-split markers
            plan = df._jdf.queryExecution().executedPlan().toString()
            results[name] = {
                "s": wall,
                "aqe_skew_split": "skew=true" in plan or "skewed" in plan,
                "rows": rows,
            }
        finally:
            for c_, v in saved.items():
                conf.set(c_, v)

    common = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    run(
        "plain",
        lambda: agg_plain(
            skewed.join(cust, skewed.o_custkey == cust.c_custkey)
        ),
        {**common, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )
    run(
        "aqe",
        lambda: agg_plain(
            skewed.join(cust, skewed.o_custkey == cust.c_custkey)
        ),
        {
            **common,
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # the post-join aggregation imposes a distribution requirement
            # that would veto the split without force
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
            # demo-sized data: qualify the hot partition for splitting
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )
    run(
        "salted",
        lambda: agg_plain(
            salted_join(
                skewed,
                cust.withColumnRenamed("c_custkey", "o_custkey"),
                on="o_custkey",
                n_salts=32,
            )
        ),
        {**common, "spark.sql.adaptive.skewJoin.enabled": "false"},
    )

    base_rows = results["plain"]["rows"]
    for name in ("aqe", "salted"):
        assert results[name]["rows"] == base_rows, f"{name} results diverged"

    print(
        json.dumps(
            {
                "k": k,
                "orders_rows": n_rows,
                "hot_key_rows": hot_rows,
                "hot_share": round(hot_rows / n_rows, 3),
                "variants": {
                    n: {kk: v for kk, v in r.items() if kk != "rows"}
                    for n, r in results.items()
                },
                "results_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()
