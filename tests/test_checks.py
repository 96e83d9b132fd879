"""Run the ported dbt test suite (generic + singular) on the fixture DAG:
error-severity checks must have 0 failure rows; warn-severity checks run
and report (dbt semantics — reference tests/*.sql are all severity warn)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine import checks as C
from furchild_spark.engine.registry import Runner
from furchild_spark.sources.fixtures import INGEST, write_fixture_parquet


@pytest.fixture(scope="module")
def runner(spark, tmp_path_factory):
    from furchild_spark.models import registry

    base = tmp_path_factory.mktemp("checks")
    paths = write_fixture_parquet(str(base / "bronze"))
    return Runner(
        spark,
        registry,
        sources=lambda n: spark.read.parquet(paths[n]),
        warehouse_dir=str(base / "wh"),
        now=INGEST + dt.timedelta(days=1),
    )


def test_suite_runs_and_errors_pass(runner):
    results = C.run_checks(runner.ref)
    assert len(results) == len(C.CHECKS)
    hard_failures = [
        r for r in results if r.severity == "error" and r.failures > 0
    ]
    assert not hard_failures, f"failing error-severity checks: {hard_failures}"
    # warn checks execute too; fixture data intentionally trips some
    warn_trips = [r for r in results if r.severity == "warn" and r.failures > 0]
    assert isinstance(warn_trips, list)


def test_generic_builders_detect_seeded_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", -1), (None, "b", 3)], "id long, k string, v long"
    )
    assert C.not_null(df, "id").count() == 1
    assert C.unique(df, "k").count() == 2
    assert C.accepted_values(df, "k", ["a"]).count() == 1
    assert C.expression_is_true(df, "v >= 0").count() == 1
    parents = spark.createDataFrame([(1,)], "id long")
    assert C.relationships(df, "id", parents, "id").count() == 1  # id=2 orphan
    assert C.unique_combination_of_columns(df, ["k", "v"]).count() == 0


def test_source_freshness_statuses(spark):
    now = F.lit(dt.datetime(2024, 1, 10, 0, 0, 0)).cast("timestamp")
    fresh = spark.createDataFrame(
        [(dt.datetime(2024, 1, 9, 12, 0, 0),)], "loaded_at timestamp"
    )
    warn = spark.createDataFrame(
        [(dt.datetime(2024, 1, 8, 0, 0, 0),)], "loaded_at timestamp"
    )
    error = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0),)], "loaded_at timestamp"
    )
    assert C.source_freshness(fresh, "loaded_at", now).first()["status"] == "fresh"
    assert C.source_freshness(warn, "loaded_at", now).first()["status"] == "warn"
    assert C.source_freshness(error, "loaded_at", now).first()["status"] == "error"


def test_stg_order_items_dedup_keep_latest(spark):
    """The keep-latest window in stg_order_items (ref stg_order_items.sql:
    44-47) — exercised directly with a re-ingested duplicate line, since
    the global fixtures honor the bronze unique-id contract."""
    import datetime as dt

    from furchild_spark.models import registry
    from furchild_spark.sources.fixtures import bronze_fixtures

    pdfs = bronze_fixtures()
    items = pdfs["transaction_items"].copy()
    dup = items.iloc[0].copy()
    dup["_AIRBYTE_EXTRACTED_AT"] = dup["_AIRBYTE_EXTRACTED_AT"] + dt.timedelta(days=2)
    dup["PRICE"] = 12345.0
    items.loc[len(items)] = dup

    def sources(name):
        pdf = items if name == "transaction_items" else pdfs[name]
        return spark.createDataFrame(pdf)

    r = Runner(spark, registry, sources=sources, warehouse_dir=None)
    out = r.ref("stg_order_items")
    winner = out.filter(F.col("order_item_id") == str(dup["ID"])).collect()
    assert len(winner) == 1
    assert float(winner[0]["price"]) == 12345.0
