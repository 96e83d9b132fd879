"""dbt seed + --store-failures (the last pieces of the dbt command set):

- seeds: CSV files registered as models, materialized by `seed`,
  addressable through ref() and graph selectors like any model;
- store_failures: failing checks write their failure ROWS to the
  warehouse for triage instead of just a count.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from furchild_spark.cli import main
from furchild_spark.engine import checks as C
from furchild_spark.engine.registry import ModelRegistry, Runner
from furchild_spark.engine.seeds import register_seeds

FROZEN = "2024-03-05T00:00:00"


@pytest.fixture()
def seeds_dir(tmp_path):
    d = tmp_path / "seeds"
    d.mkdir()
    (d / "country_codes.csv").write_text(
        "code,name,dial\nAE,United Arab Emirates,971\nSA,Saudi Arabia,966\n"
    )
    (d / "channel_map.csv").write_text(
        "channel,bucket\nios,app\nandroid,app\nweb,web\n"
    )
    return str(d)


def test_seed_registers_and_participates_in_ref(spark, seeds_dir, tmp_path):
    reg = ModelRegistry()
    names = register_seeds(reg, seeds_dir)
    assert names == ["channel_map", "country_codes"]
    assert all("seed" in reg[n].tags for n in names)

    @reg.model(name="dialled", materialized="table")
    def dialled(ctx):
        # a downstream model refs the seed — DAG edge like any model
        return ctx.ref("country_codes").select(
            "code", F.concat(F.lit("+"), F.col("dial")).alias("prefix")
        )

    wh = str(tmp_path / "wh")
    r = Runner(spark, reg, sources={}, warehouse_dir=wh)
    out = {row["code"]: row["prefix"] for row in r.ref("dialled").collect()}
    assert out == {"AE": "+971", "SA": "+966"}
    assert r.lineage["dialled"]["refs"] == ["country_codes"]
    # inferSchema typed dial as a number; column_types overrides it
    reg2 = ModelRegistry()
    register_seeds(reg2, seeds_dir,
                   column_types={"country_codes": {"dial": "string"}})
    r2 = Runner(spark, reg2, sources={})
    assert dict(r2.ref("country_codes").dtypes)["dial"] == "string"


@pytest.fixture()
def clean_global_registry():
    """CLI --seeds registers into the project registry (process-global);
    drop the temp seeds afterwards so later tests that resolve EVERY
    registered model don't chase a deleted tmp CSV path."""
    from furchild_spark.models import registry

    before = set(registry.names())
    yield
    for name in set(registry.names()) - before:
        del registry._models[name]


def test_cli_seed_materializes_csvs(
    spark, seeds_dir, tmp_path, capsys, clean_global_registry
):
    wh = str(tmp_path / "wh")
    rc = main(["seed", "--seeds", seeds_dir, "--warehouse", wh,
               "--now", FROZEN], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "seeded country_codes: 2 rows" in out
    assert "seeded channel_map: 3 rows" in out
    assert os.path.isdir(os.path.join(wh, "country_codes"))
    # --models narrows the seed set
    wh2 = str(tmp_path / "wh2")
    rc = main(["seed", "--seeds", seeds_dir, "--warehouse", wh2,
               "--models", "channel_map", "--now", FROZEN], spark=spark)
    out = capsys.readouterr().out
    assert rc == 0
    assert "channel_map" in out and "country_codes" not in out


def test_store_failures_writes_failure_rows(spark, tmp_path):
    reg = ModelRegistry()

    @reg.model(name="m", materialized="table")
    def m(ctx):
        return ctx.spark.createDataFrame(
            [(1, "ok"), (2, None), (3, None)], "id int, v string"
        )

    checks = [
        C.Check("m_v_not_null", "m", lambda df: df.filter(F.col("v").isNull())),
        C.Check("m_id_not_null", "m", lambda df: df.filter(F.col("id").isNull())),
    ]
    wh = str(tmp_path / "wh")
    r = Runner(spark, reg, sources={}, warehouse_dir=wh)
    sf = os.path.join(wh, "_test_failures")
    results = C.run_checks(r.ref, checks, store_failures_dir=sf)
    by_name = {x.name: x for x in results}
    assert by_name["m_v_not_null"].failures == 2
    assert by_name["m_v_not_null"].failures_path == os.path.join(sf, "m_v_not_null")
    stored = spark.read.parquet(by_name["m_v_not_null"].failures_path)
    assert sorted(row["id"] for row in stored.collect()) == [2, 3]
    # passing check stores an EMPTY table with the model schema (dbt
    # audit-table behavior) and still reports 0
    assert by_name["m_id_not_null"].failures == 0
    empty = spark.read.parquet(by_name["m_id_not_null"].failures_path)
    assert empty.count() == 0 and empty.columns == ["id", "v"]


def test_cli_test_store_failures(spark, tmp_path, capsys):
    bronze = str(tmp_path / "bronze")
    assert main(["gen-fixtures", "--bronze", bronze]) == 0
    wh = str(tmp_path / "wh")
    rc = main(["build", "--bronze", bronze, "--warehouse", wh,
               "--now", FROZEN], spark=spark)
    assert rc == 0
    capsys.readouterr()
    rc = main(["test", "--bronze", bronze, "--warehouse", wh,
               "--models", "stg_items", "--store-failures",
               "--now", FROZEN], spark=spark)
    assert rc == 0
    # the suite passed, but every check's audit table landed anyway
    d = os.path.join(wh, "_test_failures")
    assert os.path.isdir(d) and len(os.listdir(d)) >= 5


def test_cli_store_failures_requires_warehouse(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    assert main(["gen-fixtures", "--bronze", bronze]) == 0
    with pytest.raises(SystemExit):
        main(["test", "--bronze", bronze, "--store-failures",
              "--now", FROZEN], spark=spark)
