"""SCD2 snapshot models (dbt ``snapshots/`` directory equivalent).

The reference project ships an empty ``snapshots/`` dir
(reference dbt_project.yml:15 declares ``snapshot-paths``), i.e. the
capability is part of its configured surface with no instances yet.
This module registers the snapshot a furchild operator would write
first: slowly-changing customer attributes, so "which area / name /
email did this account have when that order shipped?" is answerable
after the bronze row has been overwritten in place.

Snapshots read the SOURCE, not a staged model (dbt's own guidance:
snapshot the rawest mutable shape you have), so ``snapshot`` runs
never materialize unrelated staging tables into the warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from furchild_spark.functions import shims as S

from . import registry

model = registry.model


@model(
    name="snap_customers",
    materialized="snapshot",
    unique_key="customer_id",
    snapshot_strategy="check",
    check_cols=("customer_name", "email_primary", "area", "city_id"),
    tags=("snapshot",),
)
def snap_customers(ctx) -> DataFrame:
    """SCD2 history of the mutable customer-account attributes.

    ``check`` strategy (dbt snapshot ``strategy='check'``): a new
    version opens whenever any of ``check_cols`` changes — the bronze
    feed's ``DATE_UPDATED`` is not reliable enough to be the strategy
    column (stale duplicate rows carry older timestamps), so change
    detection compares values instead. In-batch duplicates are reduced
    to the newest row per key first: the SCD2 merge requires exactly
    one candidate version per key per run.

    At scale: the snapshot table is merge-maintained (one shuffle on
    the key), and the source scan prunes to the five tracked columns —
    history cost is O(changed keys) per run, never a rewrite.
    """
    c = ctx.source("customer_accounts")
    src = c.select(
        F.col("ID").cast("string").alias("customer_id"),
        F.col("ACCOUNT_NAME").cast("string").alias("customer_name"),
        F.col("ACCOUNT_EMAIL_ADDRESS").cast("string").alias("email_primary"),
        F.col("AREA").cast("string").alias("area"),
        F.col("T_CITY_ID").cast("string").alias("city_id"),
        F.col("DATE_UPDATED").alias("source_updated_at"),
        F.col("_AIRBYTE_EXTRACTED_AT").alias("_ingested_at"),
    ).filter(F.col("ID").isNotNull())
    # final tiebreaker: the check_cols tuple — two in-batch duplicates
    # with IDENTICAL timestamps but different tracked values must pick a
    # deterministic winner, or re-runs open spurious SCD2 versions
    return S.dedup_keep_latest(
        src,
        "customer_id",
        [
            F.coalesce("source_updated_at", "_ingested_at").desc_nulls_last(),
            F.col("_ingested_at").desc_nulls_last(),
            F.col("customer_name").asc_nulls_last(),
            F.col("email_primary").asc_nulls_last(),
            F.col("area").asc_nulls_last(),
            F.col("city_id").asc_nulls_last(),
        ],
    )
