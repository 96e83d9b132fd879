"""Measure run(threads=N) wall-clock gain — dbt --threads analog.

Two workloads, serial vs threaded, fresh warehouse each run:

1. REAL model DAG (the reference's commerce models) on fixture bronze:
   ~30 models dominated by per-model fixed cost (job scheduling, parquet
   commit); threading overlaps those fixed costs across independent
   branches.
2. sf0.1 SCALE probe: 8 independent aggregation models over the TPC-H
   lineitem/orders tables ($SPARK_GRAFT_SF_DIR, default sf0.1). Each
   model is one real shuffle over ~600k rows; threading keeps all 32
   cores busy across models where serial submission leaves the cluster
   idle between one model's stages.

Usage: python tools/threads_bench.py [--threads 4]
Prints one JSON line with serial/threaded seconds and speedups.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from furchild_spark.engine.registry import ModelRegistry, Runner  # noqa: E402
from furchild_spark.engine.session import get_spark  # noqa: E402


def _time_real_dag(spark, bronze, threads: int) -> float:
    from furchild_spark.models import registry

    with tempfile.TemporaryDirectory() as wh:
        t0 = time.perf_counter()
        Runner(
            spark,
            registry,
            sources=lambda n: spark.read.parquet(f"{bronze}/{n}.parquet"),
            warehouse_dir=wh,
        ).run(threads=threads)
        return time.perf_counter() - t0


def _scale_registry(sf_dir: str) -> ModelRegistry:
    """8 independent single-shuffle aggregate models over sf tables."""
    reg = ModelRegistry()

    specs = [
        ("li_by_ship", "lineitem", "l_shipdate"),
        ("li_by_order", "lineitem", "l_orderkey"),
        ("li_by_qty", "lineitem", "l_quantity"),
        ("li_by_part", "lineitem", "l_partkey"),
        ("li_by_supp", "lineitem", "l_suppkey"),
        ("ord_by_date", "orders", "o_orderdate"),
        ("ord_by_cust", "orders", "o_custkey"),
        ("ord_by_prio", "orders", "o_orderpriority"),
    ]
    for name, src, key in specs:
        def _mk(src=src, key=key):
            def model(ctx):
                return (
                    ctx.source(src)
                    .groupBy(key)
                    .agg(F.count(F.lit(1)).alias("n"))
                )
            return model
        reg.model(name=name, materialized="table")(_mk())
    return reg


def _time_scale(spark, sf_dir: str, threads: int) -> float:
    reg = _scale_registry(sf_dir)
    with tempfile.TemporaryDirectory() as wh:
        t0 = time.perf_counter()
        Runner(
            spark,
            reg,
            sources=lambda n: spark.read.parquet(f"{sf_dir}/{n}.parquet"),
            warehouse_dir=wh,
        ).run(threads=threads)
        return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="threads_bench")
    bronze = tempfile.mkdtemp(prefix="threads_bronze_")
    from furchild_spark.sources.fixtures import write_fixture_parquet

    write_fixture_parquet(bronze)
    # warm both paths once (codegen/session spin-up outside the clock)
    _time_real_dag(spark, bronze, 1)
    _time_scale(spark, sf_dir, 1)

    real_serial = _time_real_dag(spark, bronze, 1)
    real_threaded = _time_real_dag(spark, bronze, args.threads)
    scale_serial = _time_scale(spark, sf_dir, 1)
    scale_threaded = _time_scale(spark, sf_dir, args.threads)

    print(json.dumps({
        "threads": args.threads,
        "real_dag_serial_s": round(real_serial, 2),
        "real_dag_threaded_s": round(real_threaded, 2),
        "real_dag_speedup": round(real_serial / real_threaded, 2),
        "sf_probe_serial_s": round(scale_serial, 2),
        "sf_probe_threaded_s": round(scale_threaded, 2),
        "sf_probe_speedup": round(scale_serial / scale_threaded, 2),
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
