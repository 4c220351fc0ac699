"""Scalable per-partition prefix sums.

``SUM(x) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED PRECEDING)``
executes as ONE sorted partition per ``p`` value: at 100 TB a
mega-partition (one source owning half the corpus, one pack bucket =
corpus/32) serializes a single task for the whole running sum — the
classic window scale-killer. :func:`chunked_cumsum` computes the SAME
inclusive running sum hierarchically:

1. rows are chunked by ``floor(order/chunk)`` — ORDER-PRESERVING, so
   the global order (o) equals the order (chunk, o) and the semantics
   are bit-identical to the plain window;
2. an inner window runs per (partition, chunk) — bounded by ``chunk``
   rows per task;
3. chunk totals (a map-side-combined aggregate, |partitions| x |chunks|
   rows) get an exclusive running offset via a window over the TINY
   totals table, broadcast back.

Cost: one bounded sort + one small-table window + one broadcast join,
instead of one unbounded sort; exact integer arithmetic throughout, so
DuckDB oracles written against the plain window stay valid unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.bounded import bounded_single_partition

# default chunk width in ORDER-COLUMN UNITS (not rows): with dense ids
# this bounds each inner-window task to ~1M rows while keeping the
# totals table tiny even at 10^12 ids
CHUNK_DEFAULT = 1 << 20


def chunked_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value: Column,
    alias: str,
    chunk: int = CHUNK_DEFAULT,
) -> DataFrame:
    """``df`` plus column ``alias`` = inclusive running sum of ``value``
    per ``part_cols`` group in ``order_col`` order — semantically equal
    to the plain unbounded window, executed with bounded per-task state.
    ``order_col`` must be non-negative numeric (doc ids here); ``value``
    any integer column expression. NULL keys are kept, matching the
    plain window: null-safe equality on both ``part_cols`` AND the
    chunk key (a NULL ``order_col`` lands in a NULL chunk, ordered
    NULLS FIRST within its group exactly like the plain window)."""
    # NULL order rows: floor(NULL/chunk) is NULL — map it to the -1
    # sentinel (order_col is documented non-negative, so -1 can't
    # collide) instead of null-safe join machinery: eqNullSafe wraps the
    # join keys in coalesce expressions, which defeats partitioning
    # reuse and was measured to add one exchange to every consumer
    # (pack_sequences 3 -> 4 shuffles). The NULL rows sort first within
    # their chunk, same as the plain window's NULLS FIRST.
    with_sub = df.withColumn(
        "_sub",
        F.coalesce(F.floor(F.col(order_col) / F.lit(chunk)), F.lit(-1)),
    )
    w_in = (
        Window.partitionBy(*part_cols, "_sub")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sub = with_sub.withColumn("_v", value).withColumn(
        "_cum_in", F.sum("_v").over(w_in)
    )
    # the offsets window runs over the |partitions| x |chunks|-row totals
    # table — bounded by construction. With no part_cols it would be an
    # UNPARTITIONED window, spamming `WindowExec: No Partition Defined`
    # on a table where that warning is noise; partition by a non-foldable
    # constant instead (functions/bounded.py) so real unpartitioned-window
    # regressions stay visible in logs (same execution either way).
    off_parts = (
        [F.col(c) for c in part_cols]
        if part_cols
        else [bounded_single_partition("_sub")]
    )
    w_off = (
        Window.partitionBy(*off_parts)
        .orderBy("_sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_sub.groupBy(*part_cols, "_sub")
        .agg(F.sum("_v").alias("_subtot"))
        .withColumn("_off", F.coalesce(F.sum("_subtot").over(w_off), F.lit(0)))
        .drop("_subtot")
    )
    # no static broadcast hint on offsets: it grows with the corpus
    # (|partitions| x |chunks| rows) — AQE broadcasts it at runtime
    # whenever it fits (every test sf), per the repo-wide hint rule.
    # NULL-SAFE key equality: PARTITION BY keeps a NULL group (a doc
    # with a NULL source is still a row the plain window — and the
    # DuckDB oracle — would sum), so the rejoin must too; a plain
    # equi-join would silently drop every NULL-keyed row.
    off = offsets
    for c in [*part_cols, "_sub"]:
        off = off.withColumnRenamed(c, f"_o_{c}")
    # plain equality is safe for the chunk key: the -1 sentinel above
    # guarantees _sub is never NULL
    cond = with_sub["_sub"] == off["_o__sub"]
    for c in part_cols:
        cond = cond & with_sub[c].eqNullSafe(off[f"_o_{c}"])
    return (
        with_sub.join(off, cond)
        .withColumn(alias, (F.col("_cum_in") + F.col("_off")).cast("bigint"))
        .drop("_sub", "_v", "_cum_in", "_off", "_o__sub", *[f"_o_{c}" for c in part_cols])
    )
