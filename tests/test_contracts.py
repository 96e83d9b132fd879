"""dbt model contracts (``contract: enforced``, dbt >= 1.5): a model may
declare its exact output interface — column names, Spark types, and
not-null constraints — and the Runner validates it BEFORE anything
materializes, on BOTH warehouse backends (parquet, txlog).

Reference context: the dbt project declares every shipped column per
model (``/root/reference/models/staging/schema.yml:102-263``,
``models/marts/commerce/dims/dim_orders.yml:8-43``); dbt's contract rule
is that a contracted model is a stable interface — missing columns,
undeclared columns, and type drift are all build failures, not warnings.

Spark-first split of the enforcement cost:

- name/type validation is STATIC (the built plan's schema — no job);
- ``not_null`` constraints cost one pre-write violation count, and only
  on warehouse-backed runs — view-only probe runners (dag/docs/state
  fingerprints) promise zero Spark actions, so the scan is skipped there.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine.registry import (
    ContractViolationError,
    ModelRegistry,
    Runner,
)

_CONTRACT = {
    "columns": {"k": "bigint", "v": "string", "amt": "double"},
    "not_null": ["k"],
}


def _src(spark, with_null_key=False, n=20):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") * 1.5).alias("amt"),
    )
    if with_null_key:
        df = df.withColumn(
            "k", F.when(F.col("k") % 7 == 0, None).otherwise(F.col("k"))
        )
    return df


def _registry(build_fn):
    reg = ModelRegistry()
    reg.model(name="contracted", materialized="table", contract=_CONTRACT)(
        build_fn
    )
    return reg


def _runner(spark, reg, wh, fmt, src):
    return Runner(
        spark, reg, sources=lambda n: src, warehouse_dir=wh,
        table_format=fmt,
    )


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_conforming_model_materializes(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"contract_ok_{fmt}_")
    reg = _registry(lambda ctx: ctx.source("s"))
    out = _runner(spark, reg, wh, fmt, _src(spark)).ref("contracted")
    assert out.count() == 20
    assert [f.name for f in out.schema.fields] == ["k", "v", "amt"]
    assert os.path.exists(os.path.join(wh, "contracted"))


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_missing_column_aborts_nothing_written(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"contract_miss_{fmt}_")
    reg = _registry(lambda ctx: ctx.source("s").drop("amt"))
    with pytest.raises(ContractViolationError, match="missing columns.*amt"):
        _runner(spark, reg, wh, fmt, _src(spark)).ref("contracted")
    assert not os.path.exists(os.path.join(wh, "contracted"))


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_undeclared_column_aborts(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"contract_extra_{fmt}_")
    reg = _registry(
        lambda ctx: ctx.source("s").withColumn("surprise", F.lit(1))
    )
    with pytest.raises(
        ContractViolationError, match="undeclared columns.*surprise"
    ):
        _runner(spark, reg, wh, fmt, _src(spark)).ref("contracted")
    assert not os.path.exists(os.path.join(wh, "contracted"))


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_type_drift_aborts(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"contract_type_{fmt}_")
    reg = _registry(
        lambda ctx: ctx.source("s").withColumn("amt", F.col("amt").cast("string"))
    )
    with pytest.raises(
        ContractViolationError, match="amt is string, declared double"
    ):
        _runner(spark, reg, wh, fmt, _src(spark)).ref("contracted")
    assert not os.path.exists(os.path.join(wh, "contracted"))


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_not_null_violation_aborts_prewrite(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"contract_nn_{fmt}_")
    reg = _registry(lambda ctx: ctx.source("s"))
    with pytest.raises(ContractViolationError, match="not_null"):
        _runner(
            spark, reg, wh, fmt, _src(spark, with_null_key=True)
        ).ref("contracted")
    assert not os.path.exists(os.path.join(wh, "contracted"))


def test_view_only_probe_skips_not_null_scan(spark):
    """A view-only runner (warehouse_dir=None — the dag/docs/state probe
    shape) must stay action-free: the static name/type check still runs,
    but the not_null count does NOT — data that violates not_null
    resolves fine through a probe."""
    reg = _registry(lambda ctx: ctx.source("s"))
    out = Runner(
        spark, reg, sources=lambda n: _src(spark, with_null_key=True)
    ).ref("contracted")
    # no raise; the plan is inspectable
    assert [f.name for f in out.schema.fields] == ["k", "v", "amt"]


def test_view_only_probe_still_checks_names_types(spark):
    reg = _registry(lambda ctx: ctx.source("s").drop("v"))
    with pytest.raises(ContractViolationError, match="missing columns"):
        Runner(spark, reg, sources=lambda n: _src(spark)).ref("contracted")


def test_contract_on_incremental_checks_every_run(spark):
    """The contract guards the INCREMENTAL branch too — drift introduced
    by the is_incremental() arm aborts the merge with the existing table
    intact."""
    wh = tempfile.mkdtemp(prefix="contract_inc_")
    reg = ModelRegistry()

    @reg.model(
        name="inc_c", materialized="incremental", unique_key="k",
        contract=_CONTRACT,
    )
    def inc_c(ctx):
        df = ctx.source("s")
        if ctx.is_incremental():
            df = df.withColumn("amt", F.col("amt").cast("string"))
        return df

    src = _src(spark)
    Runner(
        spark, reg, sources=lambda n: src, warehouse_dir=wh,
        incremental=False,
    ).ref("inc_c")
    before = spark.read.parquet(os.path.join(wh, "inc_c")).count()
    with pytest.raises(ContractViolationError):
        Runner(
            spark, reg, sources=lambda n: src, warehouse_dir=wh,
            incremental=True,
        ).ref("inc_c")
    assert spark.read.parquet(os.path.join(wh, "inc_c")).count() == before


def test_registration_rejects_malformed_contract():
    reg = ModelRegistry()
    with pytest.raises(ValueError, match="non-empty 'columns'"):
        reg.model(name="bad", contract={"columns": {}})(lambda ctx: None)
    with pytest.raises(ValueError, match="not in the contract's columns"):
        reg.model(
            name="bad2",
            contract={"columns": {"a": "int"}, "not_null": ["b"]},
        )(lambda ctx: None)


def test_contract_type_spelling_is_whitespace_insensitive(spark):
    """decimal(38, 6) vs decimal(38,6) must not be drift."""
    wh = tempfile.mkdtemp(prefix="contract_ws_")
    reg = ModelRegistry()

    @reg.model(
        name="dec_c", materialized="table",
        contract={"columns": {"k": "BIGINT", "d": "decimal(38, 6)"}},
    )
    def dec_c(ctx):
        return spark.range(3).select(
            F.col("id").alias("k"),
            F.col("id").cast("decimal(38,6)").alias("d"),
        )

    out = Runner(
        spark, reg, sources=lambda n: None, warehouse_dir=wh
    ).ref("dec_c")
    assert out.count() == 3


def test_shipped_models_carry_reference_contracts(spark):
    """stg_items and dim_orders declare the reference schema.yml /
    dim_orders.yml column sets as enforced contracts — and their builds
    conform (a probe resolve exercises the static check)."""
    from furchild_spark.models import registry as models_reg

    for name, yml in (
        ("stg_items", "models/staging/schema.yml:103-137"),
        ("dim_orders", "models/marts/commerce/dims/dim_orders.yml:8-43"),
        ("fct_orders", "models/marts/commerce/facts/fct_orders.yml:4-16"),
    ):
        m = models_reg[name]
        assert m.contract and m.contract["columns"], (name, yml)
    import glob

    srcs = {
        os.path.basename(p)[:-8]: p for p in glob.glob("fixtures/bronze/*.parquet")
    }
    r = Runner(
        spark, models_reg, sources=lambda n: spark.read.parquet(srcs[n])
    )
    for name in ("stg_items", "dim_orders", "fct_orders"):
        df = r.ref(name)
        assert set(f.name for f in df.schema.fields) == set(
            models_reg[name].contract["columns"]
        )


def test_empty_dry_run_still_catches_type_drift(spark, tmp_path):
    """The CI pairing that motivates --empty: a schema-only dry run must
    still abort on contract type drift (the check is static, so zero-row
    inputs lose nothing), while the conforming model materializes an
    empty table with the full declared schema."""
    reg = _registry(
        lambda ctx: ctx.source("s").select(
            F.col("k").cast("string").alias("k"),  # drift: bigint -> string
            "v", "amt",
        )
    )
    wh = str(tmp_path / "wh_drift")
    r = Runner(
        spark, reg, sources=lambda n: _src(spark), warehouse_dir=wh,
        empty=True,
    )
    with pytest.raises(ContractViolationError, match="k"):
        r.ref("contracted")
    assert not os.path.exists(os.path.join(wh, "contracted"))

    reg_ok = _registry(lambda ctx: ctx.source("s").select("k", "v", "amt"))
    wh_ok = str(tmp_path / "wh_ok")
    out = Runner(
        spark, reg_ok, sources=lambda n: _src(spark), warehouse_dir=wh_ok,
        empty=True,
    ).ref("contracted")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v", "amt"]
