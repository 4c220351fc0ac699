"""Publication-timeline operators: daily bucketing + dense date gap-fill.

Reference behavior: ``app.py:84-110`` parses every document's
``published_at`` permissively, drops unparseable rows (``app.py:89-92``,
OP-FLT-02), counts per calendar day with ``value_counts`` (``app.py:97-98``,
OP-AGG-03), takes min/max (``app.py:99``, OP-AGG-04), and reindexes onto a
dense daily ``pd.date_range`` filling gaps with 0 (``app.py:99-100``,
OP-GAP-01).

Spark-native design:
- daily counts are a single hash aggregate (``groupBy(to_date(ts))``) with
  map-side partial aggregation — one shuffle keyed by ~O(days) rows;
- the dense spine is ``sequence(min, max)`` exploded from the 1-row global
  min/max aggregate — O(days) rows generated engine-side, never collected;
- the zero-fill is a left outer join spine←counts. Both sides are tiny
  post-aggregation (days, not rows), so Spark broadcasts; at 100 TB the
  expensive side (the raw scan) is still one pass + one small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def daily_counts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Count rows per calendar day of ``ts_col`` (OP-AGG-03).

    Null / unparseable timestamps are dropped, mirroring the reference's
    except-continue loop (``app.py:89-92``) declaratively.
    """
    return (
        df.select(F.to_date(F.col(ts_col)).alias("day"))
        .where(F.col("day").isNotNull())
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def date_range(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Global min/max day (OP-AGG-04) — a 1-row DataFrame."""
    day = F.to_date(F.col(ts_col))
    return df.where(day.isNotNull()).agg(
        F.min(day).alias("min_day"), F.max(day).alias("max_day")
    )


def date_spine(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Dense daily spine from min to max day, generated engine-side.

    ``sequence()`` + ``explode`` on the single min/max row — the Spark
    form of ``pd.date_range`` (``app.py:99``) with no driver collect.
    """
    return date_range(df, ts_col).select(
        F.explode(
            F.sequence("min_day", "max_day", F.expr("interval 1 day"))
        ).alias("day")
    )


def timeline_gapfill(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Daily counts over a dense date spine, gaps zero-filled (OP-GAP-01).

    spine LEFT OUTER JOIN counts ON day, ``coalesce(cnt, 0)`` — the
    reference's ``reindex(fill_value=0)`` as a relational plan. Both join
    inputs are post-aggregation (O(days) rows): Spark broadcast-joins them
    regardless of raw input scale.

    The spine bounds come from min/max over the COUNTS aggregate, not a
    second min/max pass over the raw rows (``date_spine``): the two join
    inputs then share an identical scan→partial-agg subtree, so the
    per-day aggregation is the only full-data work in the plan (and the
    second subtree is eligible for exchange reuse).
    """
    counts = daily_counts(df, ts_col)
    spine = counts.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    ).select(
        F.explode(
            F.sequence("min_day", "max_day", F.expr("interval 1 day"))
        ).alias("day")
    )
    return (
        spine.join(F.broadcast(counts), "day", "left_outer")
        .select("day", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .orderBy("day")
    )
