"""SparkSession factory.

Configuration decisions made once, here (SURVEY.md §7.1 PR1):

- **Session timezone pinned to UTC.** The reference stores NTZ timestamp
  twins ``created_at_local`` (Asia/Dubai wall clock) / ``created_at_utc``
  (reference ``models/staging/stg_orders.sql:16-21``); with the session TZ
  at UTC, Spark's ``TimestampType`` behaves like NTZ-in-UTC and
  ``to_utc_timestamp(ts, 'Asia/Dubai')`` reproduces Snowflake's
  ``convert_timezone('Asia/Dubai','UTC', ts)``.
- **ANSI mode stays ON** (Spark 4 default). Snowflake's plain ``cast``
  errors on malformed input exactly like ANSI Spark; every place the
  reference used ``try_to_*`` we use ``try_cast`` shims
  (furchild_spark.functions.shims), so lenient paths are explicit.
- **Decimal precision loss allowed** (Spark default): the reference works
  around Snowflake decimal-division scale behavior by re-casting to
  decimal(38,6) after *every* arithmetic step
  (``models/marts/commerce/facts/fct_order_items.sql:95-126``); we mirror
  the re-cast discipline in the model code instead of relying on implicit
  scale rules.
- **AQE on** with coalescing + skew-join handling: at 100 TB the fact-side
  joins (orders x addresses, lineitem-scale rollups) need runtime
  re-planning; locally it also trims empty shuffle partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "furchild_spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    shuffle_partitions = str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Python DataSource filter pushdown (sources/txlog_datasource.py
        # prunes data files from manifest footer stats via pushFilters)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # TIMESTAMP_MICROS, not the legacy INT96 default: INT96 columns
        # carry NO parquet min/max statistics, which silently disables
        # footer-stat file skipping on event-time slices (txlog
        # replace_where / microbatch) AND row-group pruning in every
        # engine reading our output. Micros is also what DuckDB/Arrow
        # read natively.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # FAIR scheduling so thread-parallel Runner builds (run --threads N)
        # share executor slots fairly: each runner thread submits jobs into
        # its own pool (spark.scheduler.pool local property), and pools are
        # round-robined instead of FIFO head-of-line blocking the narrow
        # models behind the widest one. No-op for single-threaded sessions
        # (one pool), and only read at SparkContext creation.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
