"""Bronze source readers: parquet / CSV / JSON-lines, schema-explicit.

The reference's bronze layer is landed by an EL tool (Airbyte) as warehouse
tables; the Spark-first equivalent is a landing directory per source in
whatever format the producer emits. These readers are deliberately strict:

- **Schemas are always explicit.** ``inferSchema`` double-scans the input
  (a full extra pass over 100 TB) and silently changes types when the data
  drifts; a declared StructType makes drift a visible failure instead.
- **Corrupt records are quarantined, not dropped**: PERMISSIVE mode with
  ``columnNameOfCorruptRecord`` keeps malformed lines in a ``_corrupt``
  column so a data-quality check (engine.checks) can count and alert on
  them — the Spark analogue of the reference's source-freshness/test gates.
- Every reader returns a plain DataFrame and composes with the same
  ``Runner`` sources hook and streaming ingest the parquet path uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


CORRUPT_COL = "_corrupt"


def read_parquet_source(spark: SparkSession, path: str) -> DataFrame:
    """Parquet landing dir — schema comes from the file footers (already
    typed by the producer); ``mergeSchema`` handles producers that add
    columns over time (the append_new_columns contract)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV landing dir with a declared schema and quarantined bad lines."""
    schema = _with_corrupt(spark, schema)
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_jsonl_source(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSON-lines landing dir with a declared schema and quarantined bad
    lines (one malformed line → one ``_corrupt`` row, never a lost batch)."""
    schema = _with_corrupt(spark, schema)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) split. The corrupt side keeps only the raw line —
    feed its count into a data-quality gate; the clean side drops the
    bookkeeping column."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0).select(F.lit(None).cast("string").alias(CORRUPT_COL))
    # Spark forbids queries that reference ONLY the corrupt column of a raw
    # file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parse must be
    # materialized once so both splits see the same rows. persist() is the
    # documented fix; callers drop it with spark.catalog.clearCache() or
    # unpersist once the corrupt side is counted/landed.
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def _with_corrupt(spark: SparkSession, schema: StructType | str) -> StructType:
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        from pyspark.sql.types import StringType, StructField

        schema = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return schema


def read_orc_source(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (Spark's native vectorized ORC reader); exists so pipelines landing
    ORC (the Hive-ecosystem default) plug into the same staging models."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
