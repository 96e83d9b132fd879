"""dbt seeds: version-controlled CSV files materialized as warehouse
tables, addressable through ``ref()`` like any model (dbt ``dbt seed``;
the reference project ships the standard ``seeds/`` directory —
reference dbt_project.yml ``seed-paths`` — though empty at its pin).

Each ``<name>.csv`` under the seeds dir registers one model named
``<name>`` with ``materialized="table"`` and the ``seed`` tag. The fn
reads the CSV with header + schema inference at build time — seeds are
small reference data by definition (dbt's own guidance: lookup tables,
mappings), so inference's extra pass is irrelevant, and the
materialized table is what big joins read (broadcast-sized dims).

``column_types`` mirrors dbt's seed config of the same name: per-seed
``{column: spark-type}`` overrides applied as casts over the inferred
schema — the fix for zip codes losing leading zeros, ids inferred as
ints, etc. ANSI casts, so a bad override fails the build loudly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import ModelRegistry


def seed_names(seeds_dir: str) -> list[str]:
    return sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(seeds_dir)
        if f.endswith(".csv")
    )


def register_seeds(
    registry: ModelRegistry,
    seeds_dir: str,
    column_types: dict[str, dict[str, str]] | None = None,
) -> list[str]:
    """Register every ``*.csv`` in ``seeds_dir`` as a seed model.
    Re-registration with the same name overwrites (idempotent across
    repeated CLI invocations in one session). Returns the names."""
    names = seed_names(seeds_dir)
    for name in names:
        path = os.path.join(seeds_dir, name + ".csv")
        overrides = (column_types or {}).get(name, {})

        def fn(ctx, _path=path, _overrides=overrides) -> DataFrame:
            df = (
                ctx.spark.read.option("header", True)
                .option("inferSchema", True)
                .csv(_path)
            )
            for col, typ in _overrides.items():
                df = df.withColumn(col, F.col(col).cast(typ))
            return df

        fn.__name__ = name
        registry.model(name=name, materialized="table", tags=("seed",))(fn)
    return names
