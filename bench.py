"""Benchmark runner: times every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully materialized via the noop sink (no collect → no
driver-side bottleneck in the measurement; executors do all the work,
exactly like a real write)."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from furchild_spark.engine.session import get_spark  # noqa: E402
from furchild_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="furchild_spark_bench")
    # warmup: JVM/codegen spin-up on a trivial action, outside the clock
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    # Two passes, report per-query best. Single-shot timings on this box
    # show multi-second spikes on identical plans (env noise, not GC — GC
    # logs stay <15ms); best-of-2 recovers the plan's real cost.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    total = 0.0
    for name in sorted(QUERIES):
        q = QUERIES[name]
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # each pass pays its own intermediate materialization: persisted
            # subtrees (operator-level + Runner cache_refs) are dropped so
            # the best-of-N is a cold-cache plan time, not a cache read
            spark.catalog.clearCache()
        dt = round(best, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
