"""Connected components over a pair list — the step that turns near-dup
PAIRS into dedup GROUPS (keep one canonical doc per component).

Algorithm: iterative min-label propagation with path-halving: every
node starts as its own label; each round every node takes the minimum
label in its neighborhood (incl. itself) and then shortcuts through its
label's label (``label <- label(label)``, the DataFrame form of
union-find path compression / the contraction step of
large-star-small-star). Propagation alone converges in O(diameter)
rounds; the halving step makes reach grow geometrically, so long chains
converge in O(log diameter) rounds — near-dup graphs are unions of
small cliques (2-3 rounds), but adversarial chain graphs stay in budget
too (tests/test_components.py pins a 1000-node path).

Scale notes: each round is one join (labels ⋈ symmetric edges) + one
min-aggregate + one halving self-join, all shuffled on node id — no
per-component state, no driver-side graph. Labels are local-checkpointed
every round: a cache would keep the full logical plan alive, and the
halving self-join doubles that plan per round, so DRIVER analysis time
(not executor time) becomes the bottleneck without truncation —
GraphFrames' CC checkpoints at a fixed interval for the same reason.
Convergence is detected by the monotone label-sum (one aggregate), not a
new-vs-old join.
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
    # localCheckpoint (not cache): caching materializes data but keeps the
    # full logical plan, so every round would re-analyze the (potentially
    # huge) upstream pair-generation lineage once per reference — driver
    # analysis time, not executor time, became the bottleneck.  A local
    # checkpoint truncates the plan to the materialized RDD.
    #
    # r13 optimization round, two changes with the fixpoint unchanged:
    # * the symmetric edge table is built by EXPLODING each pair into
    #   both orientations in ONE pass — the previous two-leg union
    #   executed the (un-checkpointed, potentially expensive) upstream
    #   pair pipeline once per leg (guide §2.4 / §1.2);
    # * every node gets a (node, node) SELF-LOOP edge (from the already
    #   materialized label table — never from the raw pair pipeline),
    #   so the per-round neighborhood MIN includes the node's own label
    #   and the propagate step is ONE join + aggregate instead of the
    #   old join + aggregate + (labels left-join nmin) second pass.
    #   MIN is idempotent, so per-round labels are identical and the
    #   round count does not change.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                    F.struct(
                        F.col(a_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for i in range(max_iter):
        # min label over the self-loop-closed neighborhood == least of
        # the own label and every neighbor label (the old two-join form)
        propagated = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("label"))
            .cache()  # referenced twice below (self-join for halving)
        )
        # path-halving: label <- label(label). Every label is itself a
        # node id in this component (min over neighborhood of node ids),
        # and labels only decrease, so the shortcut is always valid and
        # convergence jumps from O(diameter) to O(log diameter) rounds.
        hop = propagated.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            propagated.join(hop, propagated.label == hop.pnode, "left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("plabel", F.col("label"))
                ).alias("label"),
            )
            # plan-truncating materialization EVERY round (see edges
            # note): without it the halving self-join doubles the
            # logical plan per round and analysis blows up; non-eager —
            # the convergence agg below is the materializing action
            .localCheckpoint(eager=False)
        )
        # convergence check without a join: labels are monotonically
        # non-increasing per node, so the label sum strictly decreases
        # iff anything changed.  One agg over the (just-materialized)
        # cache — decimal accumulator so 100 TB node counts can't
        # overflow int64.
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        propagated.unpersist()
        labels = new_labels  # old checkpoint RDDs are GC-cleaned
        if cur_sum is None or cur_sum == prev_sum:
            break  # empty graph, or no label moved this round
        prev_sum = cur_sum
    return labels.select("node", F.col("label").alias("component"))
