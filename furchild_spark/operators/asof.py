"""Generic as-of (nearest-timestamp) join.

Generalizes the reference's only non-equi join — the order→shipping-address
as-of match (reference models/marts/commerce/facts/fct_orders.sql:115-141):
equi-join on the entity key, then rank right-side rows per left row by
(prefer right_ts <= left_ts, then absolute time distance, then a
deterministic tiebreak) and keep rank 1.

Spark has no native ASOF join; this window formulation is a single
key-partitioned equi join + one window shuffle on the left primary key —
both AQE-skew-handled, no range explosion. For strictly-backward joins at
extreme scale, bucketing both sides by (key, time-bucket) prunes further;
the preference-ordered "nearest" semantics here need both sides anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_pk: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Attach the right-side row whose ``right_ts`` is nearest ``left_ts``,
    preferring right_ts <= left_ts (the reference's `iff(ts<=o_ts,0,1),
    abs(datediff(second,...))` ordering, microsecond-exact here)."""
    joined = left.join(right, on=on, how=how)
    prefer_backward = F.when(
        F.col(right_ts) <= F.col(left_ts), F.lit(0)
    ).otherwise(F.lit(1))
    # cast: parquet NTZ timestamps need TIMESTAMP for unix_micros (session
    # TZ is pinned UTC, so the NTZ→TZ cast is instant-preserving)
    dist = F.abs(
        F.unix_micros(F.col(right_ts).cast("timestamp"))
        - F.unix_micros(F.col(left_ts).cast("timestamp"))
    )
    order = [F.asc_nulls_last(prefer_backward), F.asc_nulls_last(dist)]
    if tiebreak:
        order.append(F.asc_nulls_last(F.col(tiebreak)))
    w = Window.partitionBy(left_pk).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
