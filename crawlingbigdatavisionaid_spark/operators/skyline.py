"""Distributed 2-D skyline (Pareto frontier) over (x maximize,
y maximize) with a deterministic key column.

The operator is DISTRIBUTIVE over any partitioning — skyline(S) ⊆
∪ᵢ skyline(partitionᵢ) — which gives both the batch plan (per-partition
superset pass, then one exact dominance anti-join over the small union)
and the streaming fold (skyline(A ∪ B) = skyline(skyline(A) ∪
skyline(B)): the frontier is a MERGEABLE, idempotent summary whose
state can only shrink-or-stay under new data of the same range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def local_skyline_superset(df: DataFrame, x: str, y: str, key: str) -> DataFrame:
    """Per-Arrow-batch superset pass: sort by (x desc, y desc, key),
    keep rows whose y >= the running max of strictly-earlier rows.
    Every true skyline member survives (an earlier row in this order
    that dominated it would have higher y); dominated stragglers may
    survive and die in :func:`exact_skyline`'s final test."""

    def part(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([x, y, key], ascending=[False, False, True])
            best_before = pdf[y].cummax().shift(1)
            yield pdf[best_before.isna() | (pdf[y] >= best_before)]

    return df.mapInPandas(part, df.schema)


def exact_skyline(df: DataFrame, x: str, y: str, key: str) -> DataFrame:
    """Exact skyline of ``df``: two-phase local-superset + dominance
    anti-join (broadcast nested loop over the superset — small for
    non-adversarial distributions; an anti-correlated input has an O(n)
    skyline, in which case the OUTPUT is inherently that large)."""
    cand = local_skyline_superset(df, x, y, key).localCheckpoint(eager=False)
    other = cand.select(F.col(x).alias("_x"), F.col(y).alias("_y"))
    dominated = (
        (F.col("_x") >= F.col(x))
        & (F.col("_y") >= F.col(y))
        & ((F.col("_x") > F.col(x)) | (F.col("_y") > F.col(y)))
    )
    return cand.join(F.broadcast(other), dominated, "left_anti")
