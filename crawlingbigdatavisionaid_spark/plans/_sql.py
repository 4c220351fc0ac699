"""Shared DuckDB oracle SQL fragments (no query registration here).

One definition per cross-engine-sensitive formula so an oracle fix can
never drift between the plan modules that embed it.
"""

from __future__ import annotations

# Cosine similarity between two FLOAT[] columns, computed in double —
# the DuckDB twin of functions/vectors.py ``cosine``. Format with the
# two column expressions: ``_SQL_COS.format(a="a.embedding", b="b.emb")``.
SQL_COS = """
    list_inner_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))
    / (sqrt(list_inner_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))
       * sqrt(list_inner_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))
"""
