"""Reference-YAML ⇄ Python-declaration agreement: the loader parses the
reference dbt project's OWN config files (dbt_project.yml, in-file
config() headers, schema/*.yml) and these tests prove the derived registry
config and test suite agree with the hand-written Python declarations for
every model — closing the last hand-maintained parity seam.

Skipped wholesale if the reference checkout is absent (the repo stays
standalone; these are parity proofs, not runtime dependencies).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from furchild_spark.engine import dbt_yaml as D

REFERENCE = D.reference_dir() or "/root/reference"

pytestmark = pytest.mark.skipif(
    D.reference_dir() is None,
    reason="reference dbt project not present (set REFERENCE_DIR)",
)


@pytest.fixture(scope="module")
def project():
    return D.load_project(REFERENCE)


# ---------------------------------------------------------------------------
# pure parsing units (no reference needed, but grouped here)
# ---------------------------------------------------------------------------

def test_config_block_parsing():
    cfg = D.parse_config_block(
        "{{ config(\n  materialized = 'incremental',\n"
        "  unique_key   = \"order_sk\",\n  transient=true,\n"
        "  lookback=2\n) }}\nselect 1"
    )
    assert cfg == {
        "materialized": "incremental", "unique_key": "order_sk",
        "transient": True, "lookback": 2,
    }
    assert D.parse_config_block("select 1") == {}


def test_dir_config_precedence():
    models_cfg = {
        "proj": {
            "+materialized": "view",
            "staging": {"+materialized": "table", "+schema": "SILVER"},
            "dead": {"+tags": ["x"]},
        }
    }
    eff = D._dir_config(models_cfg, "proj", "staging")
    assert eff == {"materialized": "table", "schema": "SILVER"}
    # a path segment with no config node stops inheriting deeper keys but
    # keeps what was accumulated above it
    eff = D._dir_config(models_cfg, "proj", os.path.join("nosuch", "deep"))
    assert eff == {"materialized": "view"}


def test_expression_canonicalization():
    assert D._canon_expression("{{ column_name }} >= 0", "amt") == "amt >= 0"
    assert (
        D._canon_expression("(is_first = (rank = 1))", None)
        == "is_first = (rank = 1)"
    )
    # non-redundant outer parens survive
    assert D._canon_expression("(a) = (b)", None) == "(a) = (b)"


# ---------------------------------------------------------------------------
# vars / freshness / model-config agreement
# ---------------------------------------------------------------------------

def test_vars_agree(project):
    from furchild_spark.engine.registry import DEFAULT_VARS

    assert project.vars == DEFAULT_VARS


def test_freshness_agrees(project):
    from furchild_spark.engine.checks import FRESHNESS

    derived = {
        (s.source, s.loaded_at_col, s.warn_after_hours, s.error_after_hours)
        for s in D.freshness_from_sources(project.sources)
    }
    declared = {
        (s.source, s.loaded_at_col, s.warn_after_hours, s.error_after_hours)
        for s in FRESHNESS
    }
    assert derived == declared


def test_all_34_model_configs_agree(project):
    """For every reference model: derived materialization (mapped through
    engine_model_kwargs) equals the decorator's; every dbt-declared
    unique_key matches; the warehouse layer (SILVER/GOLD) matches the
    Python module layout; the dead gold: config subtree contributes no
    tags."""
    from furchild_spark.models import registry

    assert len(project.models) == 34
    layer_of_module = {
        "furchild_spark.models.staging": "SILVER",
        "furchild_spark.models.marts": "GOLD",
    }
    for name, dm in sorted(project.models.items()):
        assert name in registry, f"reference model {name} not registered"
        py = registry[name]
        kw = D.engine_model_kwargs(dm)
        assert kw["materialized"] == py.materialized, (
            f"{name}: yaml-derived {kw['materialized']} != "
            f"decorator {py.materialized}"
        )
        if dm.unique_key is not None:
            assert py.unique_key == dm.unique_key, (
                f"{name}: yaml unique_key {dm.unique_key} != "
                f"decorator {py.unique_key}"
            )
        if kw["materialized"] == "incremental":
            assert py.incremental_strategy == kw["incremental_strategy"]
        assert dm.schema == layer_of_module[py.fn.__module__], (
            f"{name}: yaml schema {dm.schema} vs module {py.fn.__module__}"
        )
        # dbt_project.yml's gold: subtree matches no directory — derived
        # tags are empty for every model; Python-side tags are engine
        # selector extras (e.g. 'nightly'), permitted on top
        assert dm.tags == ()


# ---------------------------------------------------------------------------
# test-suite agreement
# ---------------------------------------------------------------------------

def _canon_yaml(t: D.TestSpec):
    if t.kind in ("not_null", "unique"):
        detail = t.column
    elif t.kind == "accepted_values":
        detail = (t.column, dict(t.params)["values"])
    elif t.kind == "relationships":
        p = dict(t.params)
        detail = (t.column, p["to"], p["field"])
    elif t.kind == "expression_is_true":
        detail = dict(t.params)["expression"]
    elif t.kind == "unique_combination_of_columns":
        detail = dict(t.params)["columns"]
    else:  # pragma: no cover
        raise AssertionError(t.kind)
    return (t.model, t.kind, detail, t.severity)


def _canon_check(c):
    if c.fk_source is not None:
        col, tbl, fld = c.fk_source
        return (c.model, "relationships", (col, ("source", tbl), fld),
                c.severity)
    spec = getattr(c.fn, "spec", None)
    if spec is None:
        return None  # singular test (tests/*.sql) — not YAML-declared
    kind, *args = spec
    if kind in ("not_null", "unique"):
        detail = args[0]
    elif kind == "accepted_values":
        detail = (args[0], tuple(args[1]))
    elif kind == "expression_is_true":
        detail = D._canon_expression(args[0], None)
    elif kind == "unique_combination_of_columns":
        detail = tuple(args[0])
    else:  # pragma: no cover
        raise AssertionError(spec)
    return (c.model, kind, detail, c.severity)


def test_every_yaml_model_test_has_a_check(project):
    """Every generic test the reference declares in YAML exists in CHECKS
    with the same model, column/params, and severity. (CHECKS is a strict
    superset: it also carries the 13 singular tests from tests/*.sql and
    engine extras — dbt's suite is generics + singulars too.)"""
    from furchild_spark.engine.checks import CHECKS

    yaml_side = {
        _canon_yaml(t) for t in project.tests
        if not t.model.startswith("source:")
    }
    check_side = {k for k in (_canon_check(c) for c in CHECKS) if k}
    missing = yaml_side - check_side
    assert not missing, f"YAML tests with no matching Check: {sorted(missing)}"


def test_every_yaml_source_test_is_declared(project):
    from furchild_spark.engine.checks import SOURCE_CHECKS

    def canon_vals(v):
        return tuple(v) if isinstance(v, (list, tuple)) else v

    yaml_side = set()
    for t in project.tests:
        if not t.model.startswith("source:"):
            continue
        tbl = t.model.split(":", 1)[1]
        p = dict(t.params)
        params = (canon_vals(p["values"]),) if "values" in p else ()
        yaml_side.add((tbl, t.column, t.kind, params, t.severity))
    declared = {
        (tbl, col, kind, tuple(canon_vals(x) for x in params), sev)
        for tbl, col, kind, params, sev in SOURCE_CHECKS
    }
    assert yaml_side == declared


def test_yaml_built_checks_run(project, spark):
    """checks_from_tests builds a RUNNABLE suite from the YAML: run the
    stg_items subset (incl. the relationships-to-source test) against the
    fixture DAG and assert it reports the same failure counts as the
    hand-declared CHECKS."""
    from furchild_spark.engine import checks as C
    from furchild_spark.engine.registry import Runner
    from furchild_spark.models import registry
    from furchild_spark.sources.fixtures import INGEST, write_fixture_parquet

    base = str(spark._sc._temp_dir) if False else None  # noqa: SIM108
    import tempfile

    base = tempfile.mkdtemp(prefix="dbt_yaml_checks_")
    paths = write_fixture_parquet(os.path.join(base, "bronze"))
    runner = Runner(
        spark, registry,
        sources=lambda n: spark.read.parquet(paths[n]),
        warehouse_dir=None,
        now=INGEST + dt.timedelta(days=1),
    )
    suite = D.checks_from_tests(
        [t for t in project.tests if t.model == "stg_items"],
        source_ref=runner.source,
    )
    assert len(suite) == 7  # 6 generics + 1 relationships-to-source
    got = {
        r.name: r.failures
        for r in C.run_checks(runner.ref, suite, source=runner.source)
    }
    hand = {
        r.name: r.failures
        for r in C.run_checks(
            runner.ref,
            [c for c in C.CHECKS if c.model == "stg_items"],
            source=runner.source,
        )
    }
    # same TOTAL failure surface, name conventions differ
    assert sum(got.values()) == sum(hand.values())
    assert len(got) == len(hand)


def test_yaml_source_checks_run(project, spark):
    from furchild_spark.engine import checks as C
    from furchild_spark.sources.fixtures import write_fixture_parquet
    import tempfile

    base = tempfile.mkdtemp(prefix="dbt_yaml_src_")
    paths = write_fixture_parquet(os.path.join(base, "bronze"))
    res = C.run_source_checks(lambda n: spark.read.parquet(paths[n]))
    assert len(res) == len(C.SOURCE_CHECKS)
    hard = {r.name for r in res if r.severity == "error" and r.failures > 0}
    # the fixtures DELIBERATELY violate the HAS_VAT ∈ {0,1} source
    # contract ('true'/'false' string variants) to exercise the staging
    # layer's try_cast robustness — the check must DETECT that, and
    # nothing else may fail
    assert hard == {"source_transaction_items_has_vat_accepted_values"}, hard


# ---------------------------------------------------------------------------
# one model driven END-TO-END from YAML-derived config
# ---------------------------------------------------------------------------

def test_model_driven_from_yaml_config(project, spark):
    """Register stg_invoice_payments into a FRESH registry using ONLY the
    YAML-derived config (incremental + merge + unique_key=payment_id from
    stg_invoice_payments.sql's config() header), materialize it through a
    Runner twice (initial + incremental merge), and assert byte-equality
    with the decorator-declared model's output."""
    import tempfile

    from furchild_spark.engine.registry import ModelRegistry, Runner
    from furchild_spark.models import registry as main_registry
    from furchild_spark.models import staging
    from furchild_spark.sources.fixtures import INGEST, write_fixture_parquet

    dm = project.models["stg_invoice_payments"]
    kw = D.engine_model_kwargs(dm)
    assert kw == {
        "materialized": "incremental", "tags": (),
        "unique_key": "payment_id", "incremental_strategy": "merge",
    }

    fresh = ModelRegistry()
    fresh.model(name="stg_invoice_payments", **kw)(staging.stg_invoice_payments)

    base = tempfile.mkdtemp(prefix="dbt_yaml_e2e_")
    paths = write_fixture_parquet(os.path.join(base, "bronze"))
    sources = lambda n: spark.read.parquet(paths[n])  # noqa: E731
    now = INGEST + dt.timedelta(days=1)

    r1 = Runner(spark, fresh, sources=sources,
                warehouse_dir=os.path.join(base, "wh"), now=now)
    first = r1.ref("stg_invoice_payments")
    n_first = first.count()
    assert n_first > 0

    # second run in incremental mode: the YAML-derived merge on
    # payment_id must keep the table exactly stable (same source data)
    r2 = Runner(spark, fresh, sources=sources,
                warehouse_dir=os.path.join(base, "wh"), now=now,
                incremental=True)
    second = r2.ref("stg_invoice_payments")
    assert second.count() == n_first
    assert (
        second.groupBy("payment_id").count().filter("count > 1").count() == 0
    )

    # equality with the decorator-built model
    ref_runner = Runner(spark, main_registry, sources=sources,
                        warehouse_dir=None, now=now)
    expected = ref_runner.ref("stg_invoice_payments")
    cols = sorted(second.columns)
    assert sorted(expected.columns) == cols
    a = {tuple(row) for row in second.select(*cols).collect()}
    b = {tuple(row) for row in expected.select(*cols).collect()}
    assert a == b


def test_full_registry_driven_from_yaml_config(project, spark):
    """The strongest form of the agreement: register ALL 34 reference
    models into a fresh registry using ONLY YAML-derived config (python
    fns + engine_model_kwargs), materialize the WHOLE DAG on the fixtures
    through a warehouse Runner (r10 VERDICT #1), and assert every one of
    the 34 models is byte-equal to the decorator-declared registry's
    output — so YAML-driven EXECUTION (not just config) provably agrees,
    transitively inheriting the model__* entries' DuckDB value proofs."""
    import tempfile

    from furchild_spark.engine.registry import ModelRegistry, Runner
    from furchild_spark.models import registry as main_registry
    from furchild_spark.sources.fixtures import INGEST, write_fixture_parquet

    fresh = ModelRegistry()
    for name, dm in project.models.items():
        py = main_registry[name]
        fresh.model(name=name, **D.engine_model_kwargs(dm))(py.fn)

    base = tempfile.mkdtemp(prefix="dbt_yaml_full_")
    paths = write_fixture_parquet(os.path.join(base, "bronze"))
    sources = lambda n: spark.read.parquet(paths[n])  # noqa: E731
    now = INGEST + dt.timedelta(days=1)

    yaml_runner = Runner(spark, fresh, sources=sources,
                         warehouse_dir=os.path.join(base, "wh"), now=now)
    yaml_runner.run(threads=8)  # materialize the full DAG per YAML config
    ref_runner = Runner(spark, main_registry, sources=sources,
                        warehouse_dir=None, now=now)
    for model in sorted(project.models):
        got = yaml_runner.ref(model)
        want = ref_runner.ref(model)
        cols = sorted(got.columns)
        assert sorted(want.columns) == cols, model
        a = sorted(
            (tuple(r) for r in got.select(*cols).collect()),
            key=repr,
        )
        b = sorted(
            (tuple(r) for r in want.select(*cols).collect()),
            key=repr,
        )
        assert a == b, f"{model}: YAML-driven != decorator-driven"


def test_checks_from_tests_relationships_to_ref(spark):
    """relationships to ref('model') resolves through the model_ref
    resolver (and is skipped, not an error, without one)."""
    from furchild_spark.engine import checks as C

    spec = D._one_test(
        "child", "parent_id",
        {"relationships": {"to": "ref('parent')", "field": "id"}},
    )
    assert dict(spec.params)["to"] == ("model", "parent")

    child = spark.createDataFrame([(1, 10), (2, 99)], "k long, parent_id long")
    parent = spark.createDataFrame([(10,)], "id long")
    suite = D.checks_from_tests([spec], model_ref=lambda n: parent)
    assert len(suite) == 1
    res = C.run_checks(lambda n: child, suite)
    assert res[0].failures == 1  # parent_id=99 is the orphan
    # no resolver -> skipped
    assert D.checks_from_tests([spec]) == []


def test_groups_and_access_from_yaml(tmp_path):
    """dbt 1.5 governance parsing (r10 VERDICT #6): groups: blocks (with
    dbt's required owner), model-level access:, and config.group all
    land in the derived config and flow through engine_model_kwargs."""
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(
        "name: demo\nmodels:\n  demo:\n    +materialized: table\n"
    )
    (proj / "models" / "m_private.sql").write_text("select 1 as x")
    (proj / "models" / "m_public.sql").write_text(
        "{{ config(group='core') }}\nselect 2 as x"
    )
    (proj / "models" / "schema.yml").write_text("""
groups:
  - name: core
    owner: {name: Platform}
models:
  - name: m_private
    access: private
    config: {group: core}
  - name: m_public
    access: public
""")
    groups = D.load_groups(str(proj))
    assert groups == {"core": {"name": "Platform"}}
    models = D.apply_yaml_governance(D.scan_models(str(proj)), str(proj))
    assert models["m_private"].access == "private"
    assert models["m_private"].group == "core"
    assert models["m_public"].access == "public"
    assert models["m_public"].group == "core"  # from the config() header
    kw = D.engine_model_kwargs(models["m_private"])
    assert kw["group"] == "core" and kw["access"] == "private"
    # dbt requires group owners
    (proj / "models" / "schema.yml").write_text(
        "groups:\n  - name: bad\n    owner: {}\n"
    )
    with pytest.raises(ValueError, match="owner"):
        D.load_groups(str(proj))


def test_exposures_from_yaml(tmp_path, spark):
    """dbt exposures: blocks parse into the registry's exposure shape and
    register cleanly (ref('model') strings resolve to model names)."""
    proj = tmp_path / "proj2"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: demo\n")
    (proj / "models" / "m1.sql").write_text("select 1 as x")
    (proj / "models" / "schema.yml").write_text("""
exposures:
  - name: weekly_kpis
    type: dashboard
    url: https://bi.example.com/kpis
    owner: {name: Analytics}
    depends_on:
      - ref('m1')
""")
    exps = D.load_exposures(str(proj))
    assert exps == [{
        "name": "weekly_kpis", "exposure_type": "dashboard",
        "depends_on": ("m1",), "owner": "Analytics",
        "url": "https://bi.example.com/kpis", "description": "",
    }]
    from furchild_spark.engine.registry import ModelRegistry

    reg = ModelRegistry()
    reg.model(name="m1")(lambda ctx: None)
    for e in exps:
        reg.exposure(**e)
    assert reg.exposures()["weekly_kpis"].depends_on == ("m1",)


def test_generate_schema_name_macro_parity(project):
    """The reference overrides generate_schema_name to use the custom
    schema VERBATIM (macros/generate_schema_name.sql:1-9) — so staging
    models resolve to SILVER.* and marts to GOLD.*, NOT dbt-default
    analytics_SILVER/analytics_GOLD. The alias config flows into the
    identifier (dim_customer materializes as DIM_CUSTOMERS)."""
    assert project.schema_naming == "verbatim"
    assert D.relation_name(
        project.models["stg_users"], naming=project.schema_naming
    ) == "SILVER.stg_users"
    assert D.relation_name(
        project.models["fct_orders"], naming=project.schema_naming,
        database="prod"
    ) == "prod.GOLD.fct_orders"
    assert D.relation_name(
        project.models["dim_customer"], naming=project.schema_naming
    ) == "GOLD.DIM_CUSTOMERS"
    # dbt-core default semantics differ — the macro override is
    # OBSERVABLE, which is why load_schema_naming must read it
    assert D.relation_name(
        project.models["stg_users"], naming="default"
    ) == "analytics_SILVER.stg_users"


def test_generate_schema_name_shapes(tmp_path):
    """Macro classification: absent -> dbt default; dbt-core's
    concatenating body -> default; unrecognized bodies fail loud."""
    proj = tmp_path / "p"
    (proj / "macros").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p\n")
    assert D.load_schema_naming(str(proj)) == "default"

    (proj / "macros" / "gsn.sql").write_text("""
{% macro generate_schema_name(custom_schema_name, node) -%}
    {%- set default_schema = target.schema -%}
    {%- if custom_schema_name is none -%}
        {{ default_schema }}
    {%- else -%}
        {{ default_schema }}_{{ custom_schema_name | trim }}
    {%- endif -%}
{%- endmacro %}
""")
    assert D.load_schema_naming(str(proj)) == "default"

    (proj / "macros" / "gsn.sql").write_text("""
{% macro generate_schema_name(custom_schema_name, node) -%}
    {{ env_var('SCHEMA_PREFIX') }}{{ custom_schema_name }}
{%- endmacro %}
""")
    with pytest.raises(ValueError, match="generate_schema_name"):
        D.load_schema_naming(str(proj))

    # no custom schema declared: target schema either way
    dm = D.DerivedModel(name="m", rel_path="m.sql", materialized="table")
    assert D.relation_name(dm, naming="verbatim") == "analytics.m"
    assert D.relation_name(dm, naming="default",
                           target_schema="dev_bob") == "dev_bob.m"
