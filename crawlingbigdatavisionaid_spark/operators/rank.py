"""Scalable exact global ranking.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no partition key moves the
whole relation into ONE task (Spark warns ``WindowExec: No Partition
Defined``) — the global-sort sibling of the running-sum problem
``operators/prefix.chunked_cumsum`` solves. :func:`global_rank`
computes the SAME dense 1..N ranks with bounded per-task state:

1. ``repartitionByRange`` on the order columns — Spark's sampled range
   partitioner spreads the sort across tasks (the same machinery a
   global ``orderBy`` uses, WITHOUT funneling results into one window
   task);
2. a per-partition ``row_number`` (bounded by the partition);
3. per-partition counts (a tiny |partitions|-row aggregate) get an
   exclusive running offset, broadcast back.

Ranks are EXACT and partitioning-invariant as long as the order is
TOTAL (callers must include a tie-breaker column): a row's global rank
is its position in the total order, which no boundary placement can
change. NTILE and other rank-derived statistics then follow as pure
expressions over (rank, N).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.bounded import bounded_single_partition


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    alias: str = "rank",
    total_alias: str | None = None,
) -> DataFrame:
    """``df`` plus ``alias`` = exact 1..N position in the TOTAL order of
    ``order_cols`` (callers must make the order total — include a
    unique tie-breaker), computed without a single-task global window.

    ``total_alias``: also attach N as a literal column — the offsets
    pass already sums the per-partition counts, so rank-derived
    statistics (NTILE, percentile cuts) get their denominator for free
    instead of re-executing the input plan for a separate count.

    Thread-safety contract: this function is called from concurrent
    driver threads (``customer_rfm_segments`` overlaps its three rank
    passes per guide §2.6), so it must stay free of session-scoped
    mutable state — no ``setJobGroup``/``setJobDescription``, no conf
    writes, no temp views. Each call may only touch its own DataFrame
    lineage and its own (already-materialized) checkpoint inputs."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    # checkpointed so the offsets job and the final plan share ONE
    # materialization (and one set of sampled range boundaries)
    local = parts.withColumn("_rn", F.row_number().over(w_in)).localCheckpoint(
        eager=False
    )
    # exclusive prefix over the per-partition counts: |partitions| rows
    # by construction, so the scan is a bounded driver-side scalar job
    # (the centroid-table legitimacy class) — no unpartitioned window
    # anywhere in the plan
    cnts = dict(
        (r["_pid"], r["_cnt"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    )
    offs, acc = [], 0
    for pid in sorted(cnts):
        offs.append((pid, acc))
        acc += cnts[pid]
    if not offs:
        out = df.withColumn(alias, F.lit(None).cast("bigint"))
        if total_alias:
            out = out.withColumn(total_alias, F.lit(0).cast("bigint"))
        return out
    offsets = spark.createDataFrame(offs, "_pid int, _off bigint")
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(alias, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )
    if total_alias:
        out = out.withColumn(total_alias, F.lit(acc).cast("bigint"))
    return out


def ntile_expr(rank: Column, n_rows: Column, n: int) -> Column:
    """SQL ``NTILE(n)`` as a pure expression over (global rank, total
    row count): bucket sizes differ by at most one, larger buckets
    first — exactly the window function's contract, derivable once the
    rank exists without any additional sort."""
    q = (n_rows / n).cast("bigint")  # floor
    r = n_rows - q * n  # first r buckets get q+1 rows
    big_span = r * (q + 1)
    return (
        F.when(rank <= big_span, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big_span) / F.greatest(q, F.lit(1))))
        .cast("int")
    )


def exact_cut(p: float, n: Column) -> Column:
    """``ceil(p * n)`` as an EXACT integer rank (r8 advice closure).

    The old form ``F.ceil(F.lit(p) * n)`` multiplied by a DOUBLE
    literal while the DuckDB oracles evaluate ``ceil(0.90 * n)`` in
    exact DECIMAL — the integer rank was decided by a float on one
    engine only, a latent cross-engine off-by-one under the repo's
    bit-exact contract. Here ``p`` is taken as the exact rational its
    decimal literal spells (``0.9`` → 9/10 via ``Fraction(str(p))``)
    and the rank is computed as ``(num*n + den - 1) div den`` entirely
    in DECIMAL(38,0) arithmetic — exact for any table Spark can hold,
    and identical by construction to DECIMAL ``ceil(p * n)``."""
    from fractions import Fraction

    fr = Fraction(str(p))
    num, den = fr.numerator, fr.denominator
    x = (
        F.lit(num).cast("decimal(38,0)") * n.cast("decimal(38,0)")
        + F.lit(den - 1)
    )
    return F.floor(x / F.lit(den)).cast("bigint")


def inverse_cdf(
    df: DataFrame,
    value_col: str,
    cuts: list[tuple[str, float]],
    total_alias: str | None = None,
) -> DataFrame:
    """One-row DataFrame holding the EXACT inverse-CDF value at each
    requested percentile — ``alias -> value at rank ceil(p * N)`` —
    computed on :func:`global_rank` (never a single-task window). THE
    shared definition for every exact-percentile consumer
    (``exact_percentiles``, ``quantile_sketch_verdict``): the rank
    convention (ceil, value-at-rank under ties) lives here once, so two
    'exact percentile' plans can never silently diverge.

    Ties are safe without a tie-breaker column: every row at a
    contested rank carries the same value, so value-at-rank is
    partitioning-invariant."""
    ranked = global_rank(
        df.select(F.col(value_col).alias("v")),
        ["v"],
        alias="rk",
        total_alias="n",
    )
    cut = lambda p: exact_cut(p, F.col("n"))  # noqa: E731
    hit_cond = None
    for _, p in cuts:
        c = F.col("rk") == cut(p)
        hit_cond = c if hit_cond is None else (hit_cond | c)
    aggs = []
    if total_alias:
        aggs.append(F.max("n").cast("bigint").alias(total_alias))
    aggs += [
        F.max(F.when(F.col("rk") == cut(p), F.col("v"))).alias(a)
        for a, p in cuts
    ]
    return ranked.where(hit_cond).agg(*aggs)


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    alias: str = "rank",
    total_alias: str | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)`` for FEW,
    HUGE groups — the regime where the plain keyed window is itself a
    scale trap: with a handful of groups and billions of rows each,
    every group's full sort lands in ONE task (the ``kmv`` lesson, but
    for arbitrary ranks where WindowGroupLimit's top-k pushdown cannot
    apply). Same machinery as :func:`global_rank`, group-aware:

    1. ``repartitionByRange`` on (group ++ order) — each group's rows
       span a contiguous RUN of range partitions, sorted across them;
    2. per-(group, partition) ``row_number`` — bounded by the
       partition, and the window key now contains ``_pid``, so no task
       ever holds a whole group;
    3. per-(group, partition) counts get an exclusive running offset
       WITHIN their group (a window over at most |partitions| rows per
       group — the offsets table is |groups| x |partitions| and is
       computed distributively, never collected), broadcast back.

    For HIGH-cardinality groups (per-group data fits a task) use the
    plain keyed window instead — this operator's offsets table scales
    with |groups| x |partitions|. Ranks are exact and
    partitioning-invariant under a TOTAL per-group order (include a
    tie-breaker), same contract as :func:`global_rank`;
    ``total_alias`` attaches the group's row count for rank-derived
    statistics (percentile cuts, NTILE)."""
    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    parts = df.repartitionByRange(
        n_parts, *group_cols, *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    w_in = Window.partitionBy(*group_cols, "_pid").orderBy(*order_cols)
    local = parts.withColumn("_rn", F.row_number().over(w_in)).localCheckpoint(
        eager=False
    )
    cnts = local.groupBy(*group_cols, "_pid").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # offsets window runs over the |groups| x |partitions|-row counts
    # table — bounded by construction. An empty group_cols would make
    # it an UNPARTITIONED window and spam `WindowExec: No Partition
    # Defined` where it is noise; partition by a non-foldable constant
    # (functions/bounded.py) so the warning keeps signaling real
    # regressions (same execution either way: one tiny partition).
    off_parts = (
        [F.col(c) for c in group_cols]
        if group_cols
        else [bounded_single_partition("_pid")]
    )
    w_off = (
        Window.partitionBy(*off_parts)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    )
    if total_alias:
        totals = cnts.groupBy(*group_cols).agg(
            F.sum("_cnt").cast("bigint").alias(total_alias)
        )
    offs = offs.drop("_cnt")
    out = (
        local.join(F.broadcast(offs), [*group_cols, "_pid"])
        .withColumn(alias, (F.col("_rn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_rn", "_off")
    )
    if total_alias:
        out = out.join(F.broadcast(totals), group_cols)
    return out
