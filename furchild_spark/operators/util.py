"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Ensure enough input partitions for a compute-heavy per-row stage.

    Small local inputs often arrive as a single parquet row group → one
    task, serializing an expensive fan-out (shingling, hashing, decimal dot
    products) on one core. At cluster scale inputs already have hundreds of
    splits and this is a no-op — the repartition only fires when the scan
    has fewer than ``min_factor ×`` the session's default parallelism, so
    it never adds a shuffle to a well-partitioned 100 TB input.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(target * min_factor)):
        return df.repartition(target)
    return df
