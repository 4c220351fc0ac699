"""Spark SQL surface: the same tables, queryable as ANSI SQL.

Everything in ``plans/`` uses the DataFrame API; this registers the
test tables as temp views so the identical plans are reachable via
``spark.sql`` — both APIs compile to the same Catalyst logical plans,
so there is no performance cliff between them. A user of the reference
who thinks in queries rather than DataFrames gets first-class support.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every synthetic table as a temp view named after itself."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
