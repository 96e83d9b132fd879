"""Capture .explain("formatted") for named catalog queries into
plans/r11/<query>_<tag>.txt — the judge's plan-claim evidence files.

Usage: python tools/capture_plans.py <tag> name1 [name2 ...]
(tag is e.g. "before" or "after"; SPARK_GRAFT_SF_DIR selects the data,
default /root/testdata/sf0.1 — same as bench.py.)

Queries whose body runs eager writes/collects still produce a plan: the
returned DataFrame's plan is what the noop sink times, so that is what we
capture. Construction-time work (prewarm training, e2e materializations)
executes as part of building the DataFrame, exactly as in the bench.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from furchild_spark.engine.session import get_spark  # noqa: E402
from furchild_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="furchild_spark_plan_capture")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
