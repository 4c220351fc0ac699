"""Connected components over a pair list — the step that turns near-dup
PAIRS into dedup GROUPS (keep one canonical doc per component).

Algorithm: iterative min-label propagation (the DataFrame form of
large-star/small-star): every node starts as its own label; each round
every node takes the minimum label in its neighborhood (incl. itself);
stop when no label changes. Converges in O(diameter) rounds — near-dup
graphs are unions of small cliques, so 2-3 rounds in practice.

Scale notes: each round is one join (labels ⋈ symmetric edges) + one
min-aggregate, both shuffled on node id — no per-component state, no
driver-side graph. Labels are cached per round and the previous round
unpersisted; a production run adds ``localCheckpoint()`` every ~10
rounds to truncate lineage. GraphFrames' CC is this same loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id reachable. Deterministic — pure graph property."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    try:
        for i in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
                .select(
                    "node",
                    F.least(
                        "label", F.coalesce("nmin", F.col("label"))
                    ).alias("label"),
                )
                .cache()
            )
            if i and i % 5 == 0:
                # truncate the join-upon-join lineage: long CC runs
                # otherwise re-plan an ever-deeper tree each round
                new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("node", F.col("label").alias("component"))
    finally:
        edges.unpersist()
