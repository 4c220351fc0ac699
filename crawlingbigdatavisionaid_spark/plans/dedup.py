"""Near-duplicate text dedup queries (OP-X-DEDUP-02): exact n-gram
Jaccard (oracle-checked), MinHash-LSH and SimHash (deterministic but
hash-based — rows-only for the driver, parity-tested in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import neardup as ND
from ..sources import load_table
from .registry import register

_SQL_SHINGLES = """
    list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - 2, 0)),
        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))
"""


@register(
    "dedup_ngram_jaccard",
    ops=("OP-X-DEDUP-02",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_SQL_SHINGLES} AS sh
            FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
                  FROM documents)
        ), nz AS (
            SELECT doc_id, sh FROM t WHERE len(sh) > 0
        ), e AS (
            SELECT doc_id, unnest(sh) AS s FROM nz
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), sizes AS (
            SELECT doc_id, len(sh) AS n_sh FROM nz
        )
        SELECT p.doc_a, p.doc_b, p.inter,
               sa.n_sh + sb.n_sh - p.inter AS union_size
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE 10 * p.inter >= 8 * (sa.n_sh + sb.n_sh - p.inter)
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard >= 0.8 via inverted-index self-join.
    Threshold test is pure integer arithmetic — engine-exact."""
    docs = load_table(spark, sf_dir, "documents")
    return ND.jaccard_pairs(docs, threshold_tenths=8, n=3)


@register(
    "dedup_minhash_lsh",
    ops=("OP-X-DEDUP-02",),
    oracle=None,  # LSH recall < 1 by construction; pytest asserts parity
    # with dedup_ngram_jaccard on the planted high-similarity band
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (k=16) + banded LSH (4x4) candidates, exact-Jaccard
    verified at >= 0.8 — the 100 TB path: shuffle keyed by band hash
    (O(N*k)), not by shingle (O(N*shingles))."""
    docs = load_table(spark, sf_dir, "documents")
    return ND.minhash_pairs(docs, k=16, bands=4, threshold_tenths=8, n=3)


@register(
    "dedup_simhash",
    ops=("OP-X-DEDUP-02",),
    oracle=None,  # xxhash64-based signature — no DuckDB twin
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted 32-bit SimHash pairs within Hamming distance 3;
    4-band (byte) banding gives exact recall for the distance bound
    (pigeonhole)."""
    docs = load_table(spark, sf_dir, "documents")
    return ND.simhash_pairs(docs, bits=32, maxd=3)
