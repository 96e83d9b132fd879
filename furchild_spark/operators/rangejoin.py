"""Time-bucketed range join — the scale formulation of interval predicates.

A naive ``a JOIN b ON b.ts BETWEEN a.ts - X AND a.ts + X`` has no equi key,
so Spark plans a BroadcastNestedLoopJoin (or cartesian) — O(n·m) at 100 TB.
The standard fix: quantize time into buckets at least as wide as the match
window; a right row can then only match left rows in (at most) two adjacent
buckets, so replicating the right side ≤2× and equi-joining on the bucket
key turns the interval predicate into a keyed hash join + an exact residual
filter. Work scales with actual match density, never with |a|×|b|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Inner join of ``left`` × ``right`` on
    ``right.ts ∈ [left.ts + lower, left.ts + upper]``.

    Column names must be disjoint (pre-alias the inputs). ``bucket_seconds``
    defaults to the window width — the smallest size that caps right-side
    replication at 2 rows. All time math is exact integer micros.
    """
    width = upper_seconds - lower_seconds
    assert width >= 0, "upper must be >= lower"
    bucket_us = int((bucket_seconds or max(width, 1)) * 1_000_000)
    assert bucket_us >= int(width * 1_000_000), (
        "bucket must be at least the window width (else a window spans >2 "
        "buckets and matches are lost)"
    )
    lower_us = int(lower_seconds * 1_000_000)
    upper_us = int(upper_seconds * 1_000_000)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lb = left.withColumn("__bucket", F.floor(l_us / F.lit(bucket_us)))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((r_us - F.lit(upper_us)) / F.lit(bucket_us)),
                    F.floor((r_us - F.lit(lower_us)) / F.lit(bucket_us)),
                )
            )
        ),
    )
    l_us2 = F.unix_micros(F.col(left_ts))
    r_us2 = F.unix_micros(F.col(right_ts))
    return (
        lb.join(rb, on="__bucket")
        .filter(
            (r_us2 >= l_us2 + F.lit(lower_us)) & (r_us2 <= l_us2 + F.lit(upper_us))
        )
        .drop("__bucket")
    )
