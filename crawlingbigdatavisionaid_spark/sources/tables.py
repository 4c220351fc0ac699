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
    # nanosAsLong is session-global and must stay ON once any events
    # DataFrame exists (toggling it off would break that plan at execution
    # time), so instead of scoping the conf we assert that no OTHER table
    # carries a nanos timestamp the conf would silently mangle into longs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name != "events":
        _assert_no_nanos_timestamps(f"{sf_dir}/{name}.parquet", name)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # the driver's parquet stores TIMESTAMP(NANOS), surfaced as raw
        # nanos by the legacy conf; re-written copies are already proper
        # timestamps and must not be converted again
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


_NANOS_CHECKED: set[str] = set()


def _assert_no_nanos_timestamps(path: str, name: str) -> None:
    """Footer-only guard (cached per path): with nanosAsLong set globally,
    a nanos timestamp column in a non-events table would silently surface
    as raw longs with no conversion — fail loudly instead."""
    if path in _NANOS_CHECKED:
        return
    try:
        import os

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not parts:
                return
            target = os.path.join(path, parts[0])
        schema = pq.read_schema(target)
        bad = [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
        if bad:
            raise TypeError(
                f"table {name!r} has TIMESTAMP(NANOS) column(s) {bad}: "
                "with spark.sql.legacy.parquet.nanosAsLong these read as "
                "raw longs; add a conversion like the events.ts path"
            )
    except (ImportError, OSError):
        # best-effort guard: a non-local sf_dir (s3://, hdfs://) can't be
        # probed with os.path/pyarrow-on-path — skip rather than crash the
        # load; Spark itself still reads the table fine
        pass
    _NANOS_CHECKED.add(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Ceiling for the statistics-driven broadcast hint below. 64 MB of
# parquet expands to a few hundred MB as an in-memory HashedRelation —
# comfortably inside executor memory on any cluster this engine targets,
# and far past every test sf (10x customer is ~10 MB).
DIM_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def table_bytes(spark: SparkSession, sf_dir: str, name: str) -> int | None:
    """On-disk byte size of one table — a driver-side filesystem metadata
    probe (no Spark job), scheme-agnostic via the Hadoop FS API. Returns
    None when the path can't be probed (caller must stay conservative).
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(hpath).getLength())
    except Exception:  # noqa: BLE001 — any FS error means "unknown size"
        return None


def broadcast_if_small(
    df: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...],
    limit: int = DIM_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Statistics-driven broadcast hint: attach ``F.broadcast(df)`` only
    when the on-disk footprint of the side's SOURCE TABLES is provably
    under ``limit`` — the poor man's CBO for a catalog-less parquet path.

    Why this exists (r6 A/B, PLANS.md): with no hint, Catalyst estimates
    a dims-chain join output as LARGER than a column-pruned fact scan and
    broadcasts the FACT side (measured: 1.5M-row orders built as the
    hashed relation — 2.75x slower than broadcasting the 150k-row dims,
    final plans otherwise identical). A static hint fixes the build side
    but hard-fails at 100 TB when the dim side outgrows memory. This
    helper is the scale-safe middle: the hint appears exactly when the
    bytes on disk prove the side small, and silently disappears at scale
    (unknown or large sizes -> no hint -> AQE decides at runtime).

    A deployment with a real catalog (ANALYZE TABLE / Delta stats) gets
    this from the CBO instead; the FS probe is the parquet-path stand-in.
    """
    sizes = [table_bytes(spark, sf_dir, t) for t in tables]
    if all(s is not None for s in sizes) and sum(sizes) <= limit:
        return F.broadcast(df)
    return df
