"""Event-time windows (OP-X-WIN-01) and JSON props extraction
(OP-X-JSON-01) over ``events``.

DuckDB oracle equivalences:
- tumbling  = ``time_bucket(INTERVAL width, ts)`` (both align to epoch in
  UTC);
- sliding   = join against a generated spine of slide-aligned starts;
- session   = gaps-and-islands (lag + running sum), end = max(ts) + gap;
- JSON      = ``json_extract_string`` vs Spark ``get_json_object``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import windows as W
from ..sources import load_table
from .registry import register


@register(
    "window_tumbling_1h",
    ops=("OP-X-WIN-01",),
    oracle="""
        SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                   AS window_start,
               time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))
                   + INTERVAL '1 hour' AS window_end,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def window_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling(load_table(spark, sf_dir, "events"), "ts", "1 hour")


@register(
    "window_sliding_1h_30m",
    ops=("OP-X-WIN-01",),
    oracle="""
        WITH bounds AS (
            SELECT time_bucket(INTERVAL '30 minutes', MIN(CAST(ts AS TIMESTAMP)))
                       - INTERVAL '30 minutes' AS lo,
                   MAX(CAST(ts AS TIMESTAMP)) AS hi
            FROM events
        ), spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL '30 minutes'))
                       AS window_start
            FROM bounds
        )
        SELECT s.window_start,
               s.window_start + INTERVAL '1 hour' AS window_end,
               COUNT(*) AS cnt
        FROM spine s
        JOIN events e
          ON CAST(e.ts AS TIMESTAMP) >= s.window_start
         AND CAST(e.ts AS TIMESTAMP) < s.window_start + INTERVAL '1 hour'
        GROUP BY 1, 2
    """,
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding(
        load_table(spark, sf_dir, "events"), "ts", "1 hour", "30 minutes"
    )


@register(
    "session_windows_30m",
    ops=("OP-X-WIN-01",),
    oracle="""
        WITH marked AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             - LAG(CAST(ts AS TIMESTAMP)) OVER
                               (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), islands AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events
        FROM islands GROUP BY user_id, sid
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session(load_table(spark, sf_dir, "events"), "user_id", "ts", "30 minutes")


@register(
    "json_extract_props",
    ops=("OP-X-JSON-01",),
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: path extraction stays JVM-side
    (get_json_object); at scale prefer from_json once into a struct
    column rather than N path extractions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "json_k_stats_by_type",
    ops=("OP-X-JSON-01", "OP-AGG-01"),
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
)
def json_k_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@register(
    "value_stats_by_type",
    ops=("OP-AGG-01", "OP-AGG-04"),
    oracle="""
        SELECT event_type, COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 4) AS avg_value
        FROM events GROUP BY event_type
    """,
)
def value_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_d", F.col("value").cast("decimal(18,2)")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value_d").alias("sv"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "event_type",
            "cnt",
            F.col("sv").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
            F.round(F.col("sv").cast("double") / F.col("cnt"), 4).alias("avg_value"),
        )
    )


@register(
    "json_props_typed_struct",
    ops=("OP-X-JSON-01",),
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END)
                    AS BIGINT) AS bad_json
        FROM events GROUP BY event_type
    """,
)
def json_props_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` with a DECLARED schema — parse the JSON column ONCE
    into a typed struct, then aggregate struct fields. At 100 TB this
    beats per-path ``get_json_object`` (which re-parses the string per
    extraction) and keeps malformed JSON observable (null struct)
    instead of silently zero."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("sum_k"),
        F.sum(F.col("p").isNull().cast("long")).alias("bad_json"),
    )


@register(
    "variant_props_distinct_k",
    ops=("OP-X-JSON-01",),
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS distinct_k,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
)
def variant_props_distinct_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    encodes the JSON ONCE into the binary variant format at the scan,
    and every ``variant_get`` is a cheap binary path lookup — no string
    re-parse per access, and (on Parquet writers that support it) the
    variant column shreds into typed subcolumns. The open-format
    successor to per-path ``get_json_object`` at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count_distinct(F.col("k")).alias("distinct_k"),
            F.sum("k").alias("sum_k"),
        )
    )


@register(
    "rolling_7day_revenue",
    ops=("OP-X-WIN-01", "OP-AGG-03"),
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   datediff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS day_num,
                   SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1, 2
        )
        SELECT day,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER (
                    ORDER BY day_num
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS revenue_7d
        FROM daily ORDER BY day
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-DAY revenue via a RANGE window frame — the frame kind
    nothing else in the registry exercises: RANGE BETWEEN 6 PRECEDING
    looks back by ORDER-VALUE distance (calendar days), not row count,
    so gaps in the date spine are handled correctly where a ROWS frame
    would silently reach across them.

    Scale shape: the window runs over the PRE-AGGREGATED daily table —
    |days| rows, bounded by calendar time, not data volume (the 100 TB
    of orders collapses in the map-side-combining groupBy first), so
    the single-partition window is a non-issue by construction; the
    same discipline as timeline_gapfill/daily_anomaly_days. Revenue is
    round-then-DECIMAL-summed (o_totalprice is a 2-dp double) so both
    the daily and the windowed sums are aggregation-order-invariant."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.round("o_totalprice", 2).cast("decimal(18,2)")
            ).alias("rev")
        )
        .withColumn(
            "day_num", F.datediff(F.col("day"), F.lit("1992-01-01"))
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("revenue_7d"),
    ).orderBy("day")
