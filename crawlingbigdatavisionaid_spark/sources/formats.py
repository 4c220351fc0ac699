"""Source/sink formats beyond parquet (OP-SRC-03 / OP-SNK-01 breadth).

The reference speaks only MongoDB. A Spark-native engine meets data
where it lands: columnar parquet for silver/gold, line-JSON and CSV for
interchange and raw drops, ``binaryFile`` for opaque blobs (images,
audio, WARC segments) feeding the multimodal pipeline.

Scale rules encoded here:

- **Schemas are always explicit.** ``inferSchema``/sampling reads the
  data twice and guesses types per-run — at 100 TB that is both a double
  scan and a correctness hazard (a column inferred LONG today, DOUBLE
  tomorrow). Every reader takes a ``StructType`` or DDL string.
- **Text formats are PERMISSIVE + corrupt-record column.** One malformed
  row must never fail a 100 TB load; it lands in
  ``_corrupt_record`` for quarantine (the reference's try/except-skip,
  OP-STR-02, made declarative).
- **binaryFile filters push down.** ``pathGlobFilter`` prunes by name
  pattern before reading bytes; the 2 GB-per-file format limit is a
  Spark constant worth knowing about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType | str) -> StructType:
    """Schema plus the quarantine column."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        from pyspark.sql.types import StringType

        schema = schema.add(CORRUPT_COL, StringType())
    return schema


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Line-delimited JSON with explicit schema; malformed lines survive
    in ``_corrupt_record`` instead of failing the load."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque blobs as (path, modificationTime, length, content) — the
    bronze layer of the multimodal pipeline. ``glob`` prunes by filename
    BEFORE any bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) from a permissive read.

    Spark refuses a query that projects ONLY ``_corrupt_record`` from a
    raw text scan (column pruning would leave nothing to parse), so the
    split is served from a cache of the full read — which a real
    quarantine pass wants anyway: one scan feeding both outputs.
    """
    df = df.cache()
    clean = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.where(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC — the other columnar format Spark ships natively (vectorized
    reader, predicate pushdown, column pruning, like parquet). Schema is
    optional because ORC embeds one, but passing it pins reader
    expectations the same way the parquet path does."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
