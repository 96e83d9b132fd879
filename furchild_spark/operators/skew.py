"""Skew mitigation operators: salted joins and salted two-phase aggregation.

AQE's skew-join splitting (on in engine.session) handles storage-level skew
at runtime, but two shapes still need explicit salting at 100 TB:

- **Joins where one side must replicate**: when the hot key's rows exceed
  what one task can sort/hash, pre-splitting the hot side across
  ``salt_factor`` sub-keys and replicating the other side bounds every
  task's share of the hot key to 1/factor. Deterministic salt (a hash of
  non-key columns), never ``rand()`` — replays and retries must route rows
  identically.
- **High-cardinality distinct aggregation under a hot group key**
  (``groupBy(hot_key).agg(countDistinct(x))``): partial aggregation can't
  shrink the map side (every distinct x survives), so one reducer receives
  the hot key's whole distinct set. Salting by ``hash(x) % factor``
  partitions the DISTINCT SPACE itself — each sub-aggregate counts a
  disjoint slice exactly, and the final sum over salts is exact, not
  approximate. Two keyed shuffles, both balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt_from: str | list[str],
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi join with the left (skewed) side salted into ``salt_factor``
    sub-keys and the right side replicated across them.

    ``salt_from`` names left-side column(s) whose hash spreads the hot key's
    rows — use a high-cardinality payload column (line number, event id).
    The salt is deterministic, so speculative retries and shuffle replays
    route every row to the same sub-key. Result set is EXACTLY the plain
    join's (salt columns never leak into the output) — which holds only
    for join types where unmatched RIGHT rows are never emitted: with
    ``right``/``full``/``right_semi`` an unmatched right row would surface
    once per replica (``salt_factor`` copies), so those types are rejected.
    To salt a right-outer join, swap the sides and use ``left``.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only {sorted(allowed)} preserve plain-join "
            "semantics when the right side is replicated"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_cols = [salt_from] if isinstance(salt_from, str) else list(salt_from)
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_factor)).cast("int")
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return l_salted.join(r_replicated, on=keys + ["__salt"], how=how).drop("__salt")


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    salt_factor: int = 16,
) -> DataFrame:
    """EXACT ``countDistinct(distinct_col)`` per ``group_col`` that stays
    balanced when some group is hot.

    Stage 1 groups by ``(group, hash(distinct_value) % factor)`` — the same
    value always lands in the same salt bucket, so per-bucket distinct
    counts partition the distinct set exactly. Stage 2 sums the disjoint
    counts. Both shuffles spread the hot group over ``factor`` reducers.
    """
    salted = df.select(
        F.col(group_col),
        F.col(distinct_col),
        F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_factor)).alias("__salt"),
    )
    partial = salted.groupBy(group_col, "__salt").agg(
        F.countDistinct(distinct_col).alias("__part")
    )
    return partial.groupBy(group_col).agg(
        F.sum("__part").cast("long").alias("n_distinct")
    )
