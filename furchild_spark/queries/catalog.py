"""Catalog infrastructure: the query registry and the table loader."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    """One scoreboard entry.

    - ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation.
    - ``oracle`` — DuckDB-runnable ANSI SQL over the pre-registered views
      (region nation customer supplier part orders lineitem events
      documents embeddings); ``None`` for non-SQL-expressible ops (driver
      then records a weaker rows-only check).
    - ``headline`` — included in bench.py's timed set.
    - ``section`` — SURVEY.md §2 rows this demonstrates.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool
    section: str


def query(name: str, *, oracle: str | None = None, headline: bool = False,
          section: str = ""):
    def deco(fn):
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle,
                              headline=headline, section=section)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one testdata table. Plain ``spark.read.parquet`` so
    Catalyst gets scan-level column pruning + predicate pushdown.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects; read it as nanos-long (legacy conf, runtime-settable)
    and truncate to microseconds with *integer* division (``DIV`` — a
    double division would lose precision on epoch-nanos magnitudes).
    DuckDB's reader does the identical ns→us truncation natively, so
    oracles see the same instants.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
