#!/usr/bin/env python
"""Scale smoke for the dedup / ANN operator families.

Replicates ``documents`` K times with remapped doc_ids and every token
SUFFIXED with a replica tag (``the`` -> ``therk1``), so per-replica term
frequency PROFILES are preserved (no injected dominant token to skew
SimHash votes) while vocabularies are disjoint across replicas: cross-
replica docs are NOT near-dups and the true pair count scales exactly Kx
the base corpus — which makes the measured jaccard/minhash/simhash
cost-vs-K curve interpretable.
``embeddings`` replicates with remapped vec_ids (identical vectors; ANN
cost scales with corpus size regardless).

Usage: python tools/dedup_scale_smoke.py [K] [base_sf_dir]
Prints one JSON line: per-operator seconds and output counts at Kx.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from crawlingbigdatavisionaid_spark.operators import neardup as ND
    from crawlingbigdatavisionaid_spark.operators import similarity as S
    from crawlingbigdatavisionaid_spark.session import get_spark
    from crawlingbigdatavisionaid_spark.sources import load_table

    spark = get_spark("dedup-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    out = tempfile.mkdtemp(prefix="dedup_scale_")
    try:
        docs = load_table(spark, base, "documents")
        emb = load_table(spark, base, "embeddings")
        doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
        vec_span = emb.agg(F.max("vec_id")).first()[0] + 1

        t0 = time.time()
        doc_parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * doc_span)).alias("doc_id"),
                # letter-only replica tag: digits would be dropped by the
                # [a-z]+ tokenizer, collapsing all replicas to one vocab
                F.regexp_replace(
                    "text", r"([A-Za-z]+)", "$1q" + chr(ord("a") + i % 26)
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(k)
        ]
        du = doc_parts[0]
        for p in doc_parts[1:]:
            du = du.unionByName(p)
        du.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        eu = None
        for i in range(k):
            p = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vec_span))
            eu = p if eu is None else eu.unionByName(p)
        eu.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
        build_s = round(time.time() - t0, 1)

        sdocs = spark.read.parquet(f"{out}/documents.parquet")
        semb = spark.read.parquet(f"{out}/embeddings.parquet")
        n_docs = sdocs.count()

        results: dict[str, dict[str, float]] = {}

        def run(name: str, fn) -> None:
            t = time.time()
            n = fn()
            results[name] = {"s": round(time.time() - t, 2), "out_rows": n}

        run("jaccard_pairs", lambda: ND.jaccard_pairs(sdocs).count())
        run("minhash_pairs", lambda: ND.minhash_pairs(sdocs).count())
        run("simhash_pairs", lambda: ND.simhash_pairs(sdocs).count())
        queries = semb.where(F.col("vec_id") < 100)
        run(
            "ann_brute_force",
            lambda: S.brute_force_topk(semb, queries, k=10).count(),
        )
        run("ann_lsh", lambda: S.lsh_topk(semb, queries, k=10).count())
        run("ann_ivf", lambda: S.ivf_topk(semb, queries, k=10).count())

        print(
            json.dumps(
                {
                    "k": k,
                    "base": base,
                    "n_docs": n_docs,
                    "build_s": build_s,
                    "ops": results,
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
