"""Parquet table sources.

The reference reads a MongoDB collection with per-query projections
(``app.py:26,75,86,137`` — OP-SRC-03); the Spark-native analogue is a
columnar Parquet scan where Catalyst column pruning and predicate pushdown
subsume Mongo's projection/find pushdown. Callers just ``.select`` /
``.filter`` and the scan narrows itself (verify with
``df.explain('formatted')`` → ``ReadSchema`` / ``PushedFilters``).

At 100 TB the same call reads a partitioned table (partition columns e.g.
``source``, ``date(crawled_at)``) and partition pruning applies on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (see TESTDATA.md) as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as raw nanos (legacy conf) and
    convert to a microsecond timestamp engine-side (lossless here — the
    generator emits whole microseconds; DuckDB's TIMESTAMP cast truncates
    identically).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # the driver's parquet stores TIMESTAMP(NANOS), surfaced as raw
        # nanos by the legacy conf; re-written copies are already proper
        # timestamps and must not be converted again
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
