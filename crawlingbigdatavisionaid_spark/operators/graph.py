"""Reusable graph primitives over plain (u, v) edge DataFrames.

The plan layer (plans/graph.py) builds the edge lists (ε-similarity
graph, trade graph); these operators are edge-source-agnostic so the
scale smokes can drive them with K-replicated synthetic graphs without
re-deriving embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over an UNDIRECTED simple graph
    given as distinct (u < v) rows: returns (node, degree, triangles,
    clustering_permille).

    Degree-ordered orientation (compact-forward; Ortmann & Brandes
    2014): each edge is directed from its smaller endpoint under the
    total order (degree, node), triangles are oriented paths a→b→c
    closed by a→c, counted once each. Oriented out-degree is O(sqrt(m))
    for ANY degree distribution, so the path join's per-key fan-out —
    the quantity that explodes on celebrity nodes in the naive
    edge-edge join — is bounded by sqrt(m) regardless of skew. The
    local clustering coefficient is an exact integer permille,
    (2000*triangles) DIV (degree*(degree-1)).

    Plan: one |V|-row degree aggregate, two joins to relabel, one
    keyed self-join on the middle vertex, one semi-join closure probe,
    one explode + hash aggregate. No windows, no driver state."""
    e = edges.select("u", "v").localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = F.when(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
        True,
    ).otherwise(False)
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    paths = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        "b",
    )
    tri = paths.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "semi",
    )
    pernode = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(pernode, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            F.expr(
                "(2000 * coalesce(triangles, 0)) DIV (degree * (degree - 1))"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("clustering_permille"),
    )


def max_oriented_outdegree(edges: DataFrame) -> int:
    """Diagnostic for the orientation bound: the largest per-node
    fan-out the triangle path join actually sees (must stay ~sqrt(2m)
    even when the max UNDIRECTED degree is corpus-sized)."""
    e = edges.select("u", "v")
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = F.when(
        (F.col("du") < F.col("dv"))
        | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
        True,
    ).otherwise(False)
    src = ranked.select(F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"))
    row = (
        src.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("mx"))
        .first()
    )
    return int(row["mx"]) if row and row["mx"] is not None else 0
