"""Driver contract for the spark-graft builder (PySpark target).

Delegates to furchild_spark.queries — the catalog of (Spark DataFrame fn,
DuckDB oracle SQL) pairs, one per implemented operator from SURVEY.md §2
plus the LLM-data-pipeline extensions. tests/test_catalog_oracle.py runs
the identical comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from furchild_spark.queries import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the star-schema revenue rollup (scan → 4 joins with
    broadcast dims → decimal-exact agg) at sf0.001."""
    return QUERIES["revenue_by_region"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see each
    catalog entry's ``section`` tag for the §2 rows it demonstrates)."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every catalog query that is
    SQL-expressible (currently all of them — even MinHash-LSH, which uses
    md5-based hashing precisely so the oracle can reproduce it)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
