"""As-of join — the classic time-series operator Spark has no built-in
for (DuckDB ``ASOF JOIN``, pandas ``merge_asof``, kdb ``aj``).

Semantics (backward, inclusive): for each left row, attach the single
right row with the same key whose timestamp is the greatest one
``<= left.ts``; left rows with no such match survive with nulls
(left-outer as-of).

Spark-first design — **union + partitioned sort + last-ignoring-nulls
window**, i.e. a distributed merge-as-of:

1. tag both sides and union them on (key, ts, tag, payload-cols);
2. one shuffle: hash-partition by key, sort each partition by
   (ts, tag, tiebreak) — right rows sort *before* left rows at equal ts,
   which yields the inclusive bound;
3. ``last(payload, ignoreNulls=True)`` over rows UNBOUNDED PRECEDING →
   CURRENT ROW carries the most recent right payload forward;
4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows keyed by the join key and a sort per
partition — no range cross-product, no per-key collect. At 100 TB this
is the same data movement as a sort-merge join; skewed keys split fine
under AQE because the window partitions by the join key only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join; returns all ``left`` columns plus
    ``{prefix}{col}`` for each payload column of the matched right row.

    ``right_tiebreak``: column ordering right rows that share an exact
    (key, ts) — the largest wins, making the match deterministic.
    """
    payload = list(right_payload)
    tb: Column = (
        F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0).cast("long")
    )
    # the matched right row travels as ONE nullable struct so all payload
    # columns come from the SAME right row even when payloads hold nulls
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.struct(*[F.col(c) for c in payload]).alias("__r"),
    )
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(tagged_right.schema["__r"].dataType).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    merged = tagged_right.withColumn(
        "__l", F.lit(None).cast(tagged_left.schema["__l"].dataType)
    ).unionByName(tagged_left)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side", "__l", F.last("__r", ignorenulls=True).over(w).alias("__c")
    )
    out = carried.where(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__c.{c}").alias(f"{prefix}{c}") for c in payload],
    )
