"""Catalog infrastructure: the query registry and the table loader."""

from __future__ import annotations

import functools
import re
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
    - ``prewarm`` — plan construction trains/loads a deterministic
      artifact (PQ/SQ8 codebooks, BPE rules): bench.py constructs the
      plan once UNTIMED before the entry's first timed run, so artifact
      warmth is per-entry deterministic instead of sweep-order luck
      (train-once/serve-many: training never belongs in per-query cost).
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool
    section: str
    prewarm: bool = False


def money(c):
    """DECIMAL(18,2) cast for the money domain — the package-wide parity
    rule (queries/__init__.py): sum decimals, never raw doubles, cast the
    final value back to double. One definition so a future precision
    change cannot silently diverge between catalog modules."""
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(18,2)")


def one_money():
    """Literal 1 in the same money domain (for 1 - discount factors)."""
    return F.lit(1).cast("decimal(18,2)")


def _tune_for_sf(spark: SparkSession, sf_dir: str) -> None:
    """Right-size runtime-settable confs for the data scale before building
    the plan. The driver calls catalog functions with ITS session, whose
    shuffle-partition count we don't control; at sf0.01 a 200-partition
    shuffle is pure task-scheduling overhead (sub-MB partitions), so pin a
    small count for the correctness scales and the local[32]-matched count
    for bench scale. AQE coalescing stays on either way — at 100 TB these
    numbers come from cluster size, not this helper."""
    m = re.search(r"sf([0-9.]+)", sf_dir or "")
    sf = float(m.group(1)) if m else None
    small = sf is not None and sf <= 0.011
    # NTZ→LTZ casts (events.ts) and date_trunc/window results must not
    # depend on the host's local timezone — pin the session to UTC, the
    # same frame DuckDB's naive timestamps live in. This pin is a
    # CORRECTNESS dependency (unlike the perf confs below), so it gets its
    # own try/except and fails loudly: silently running under a non-UTC
    # session TZ would diverge from the oracle on every timestamp column.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception as exc:
        if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
            raise RuntimeError(
                "cannot pin spark.sql.session.timeZone=UTC; timestamp "
                "results would depend on the host timezone"
            ) from exc
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8" if small else "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # perf confs locked down — plans are still correct, just slower
    # NOTE on cache hygiene: operators persist intermediates and the CC
    # loop localCheckpoints label rounds, which accumulate across a
    # sequential N-entry run. bench.py clears them BETWEEN evaluations —
    # the safe point. Clearing here (at plan-construction time) was
    # considered and rejected: a caller that builds several entries
    # before evaluating them would lose localCheckpointed blocks whose
    # lineage is already truncated — an unrecoverable failure, not a
    # recompute.


def query(name: str, *, oracle: str | None = None, headline: bool = False,
          section: str = "", prewarm: bool = False):
    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _tune_for_sf(spark, sf_dir)
            return fn(spark, sf_dir)

        QUERIES[name] = Query(name=name, fn=wrapped, oracle=oracle,
                              headline=headline, section=section,
                              prewarm=prewarm)
        return wrapped

    return deco


_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one testdata table. Plain ``spark.read.parquet`` so
    Catalyst gets scan-level column pruning + predicate pushdown.

    The DataFrame (a lazy, immutable plan) is memoized per session —
    ``spark.read.parquet`` schema inference schedules a footer-reading job
    each call, which both slows the 87-entry correctness loop and would
    count as a plan-construction action.

    ``events.ts`` has been generated as either TIMESTAMP(MICROS) (reads
    natively) or TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects; for the latter, read it as nanos-long (legacy conf,
    runtime-settable) and truncate to microseconds with *integer*
    division (``DIV`` — a double division would lose precision on
    epoch-nanos magnitudes). DuckDB's reader does the identical ns→us
    truncation natively, so oracles see the same instants either way.
    The branch keys off the post-read dtype (the legacy conf only
    rewrites NANOS columns, so MICROS data still arrives as timestamp).
    """
    key = (id(spark._jsparkSession), sf_dir, name)
    if key not in _TABLE_CACHE:
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn(
                    "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
                )
            elif ts_type == "timestamp_ntz":
                # MICROS parquet without isAdjustedToUTC reads as NTZ; the
                # catalog's timestamp math (unix_micros, as-of gaps, window
                # aggs) is written against LTZ instants. Under the pinned
                # UTC session TZ this cast maps wall-clock → the identical
                # instant DuckDB sees. The pin is load-bearing here, so
                # verify it rather than trust that _tune_for_sf ran.
                if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
                    raise RuntimeError(
                        "timestamp_ntz cast requires "
                        "spark.sql.session.timeZone=UTC (oracle parity)"
                    )
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _TABLE_CACHE[key] = df
    return _TABLE_CACHE[key]


def widen_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition an UNDER-SPLIT scan to the session's
    default parallelism (guide §2.5 "input skew: one huge unsplittable
    file ... repartition immediately after the read").

    The testdata tables are single-row-group parquet files, so every
    scan arrives as ONE split and a compute-heavy map stage (window
    fingerprints, multi-distinct Expand folds) serializes on one core.
    At real scale the split count exceeds the core count and this is a
    provable no-op — no shuffle is added. ONLY for entries whose
    downstream is partition-order-free (exact aggregates / set ops);
    callers of order-sensitive folds must not use it."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
