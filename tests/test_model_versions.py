"""dbt 1.5 model versions + dbt 1.6 deprecation_date.

Public-dbt surface (docs.getdbt.com "model versions"): a versioned model
registers one node per version named ``<base>_v<v>`` (dbt's default
relation name), ``ref('base')`` resolves to the latest version with an
unpinned-ref warning, ``ref('base', v=N)`` pins, ``latest_version`` may
pin latest below the max (making higher versions prereleases), and
``deprecation_date`` past due warns on build/ref without failing. The
reference project declares no versions — this is engine-generic surface,
synthetic-tested like groups/access were in r11.
"""

import datetime as dt
import textwrap

import pytest

from furchild_spark.engine.registry import ModelRegistry, Runner


def _family(latest_declared=None):
    reg = ModelRegistry()

    @reg.model(name="rollup", version=1,
               **({"latest_version": latest_declared}
                  if latest_declared else {}))
    def r1(ctx):
        return ctx.spark.range(1)

    @reg.model(name="rollup", version=2)
    def r2(ctx):
        return ctx.spark.range(2)

    return reg


def test_registry_version_resolution():
    reg = _family()
    assert sorted(reg.names()) == ["rollup_v1", "rollup_v2"]
    assert reg.versions_of("rollup") == {1: "rollup_v1", 2: "rollup_v2"}
    assert reg.latest_version("rollup") == 2  # default: max registered
    assert reg.resolve("rollup") == "rollup_v2"
    assert reg.resolve("rollup", 1) == "rollup_v1"
    assert reg.resolve("rollup.v1") == "rollup_v1"  # dbt selection alias
    assert reg.resolve("rollup_v1") == "rollup_v1"
    assert "rollup" in reg and reg["rollup"].name == "rollup_v2"
    assert reg["rollup"].version == 2 and reg["rollup"].base_name == "rollup"


def test_registry_declared_latest_makes_prerelease():
    reg = _family(latest_declared=1)
    assert reg.latest_version("rollup") == 1
    assert reg.resolve("rollup") == "rollup_v1"  # v2 is a prerelease


def test_registry_version_validation():
    reg = _family()
    with pytest.raises(ValueError, match="registered twice"):
        reg.model(name="rollup", version=2)(lambda ctx: None)
    with pytest.raises(ValueError, match="version family"):
        reg.model(name="rollup")(lambda ctx: None)  # unversioned collision
    with pytest.raises(ValueError, match="positive int"):
        reg.model(name="x", version=0)(lambda ctx: None)
    with pytest.raises(ValueError, match="latest_version without"):
        reg.model(name="y", latest_version=2)(lambda ctx: None)

    @reg.model(name="plain")
    def plain(ctx):
        return None

    with pytest.raises(ValueError, match="already registered unversioned"):
        reg.model(name="plain", version=1)(lambda ctx: None)

    reg2 = _family(latest_declared=1)
    with pytest.raises(ValueError, match="conflicting latest_version"):
        reg2.model(name="rollup", version=3, latest_version=3)(
            lambda ctx: None
        )
    with pytest.raises(KeyError, match="no such version"):
        reg2.resolve("rollup", 9)
    with pytest.raises(KeyError, match="not a versioned model"):
        reg2.resolve("plainx", 1)


def test_unpinned_ref_warns_pinned_does_not(spark):
    reg = _family()
    r = Runner(spark, reg, sources=lambda n: None, warehouse_dir=None)
    with pytest.warns(UserWarning, match="unpinned"):
        assert r.ref("rollup").count() == 2  # latest = v2
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error")
        assert r.ref("rollup_v1").count() == 1
        assert r.ref("rollup", v=1).count() == 1


def test_deprecation_date_warns_past_never_fails(spark):
    reg = ModelRegistry()

    @reg.model(name="legacy", deprecation_date=dt.date(2020, 1, 1))
    def legacy(ctx):
        return ctx.spark.range(3)

    @reg.model(name="fresh", deprecation_date=dt.date(2999, 1, 1))
    def fresh(ctx):
        return ctx.spark.range(4)

    r = Runner(spark, reg, sources=lambda n: None, warehouse_dir=None,
               now=dt.datetime(2024, 6, 1))
    with pytest.warns(DeprecationWarning, match="deprecation_date"):
        assert r.ref("legacy").count() == 3  # warns, still builds
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error")
        assert r.ref("fresh").count() == 4  # future date: silent


def test_versioned_family_materializes_both(spark, tmp_path):
    """Each version is its own node end-to-end: both relations land in
    the warehouse under dbt's default names, a pinned consumer reads v1
    while an unpinned one reads latest."""
    import os

    reg = ModelRegistry()

    @reg.model(name="kpi", version=1)
    def k1(ctx):
        return ctx.spark.range(5)

    @reg.model(name="kpi", version=2)
    def k2(ctx):
        return ctx.spark.range(7)

    @reg.model(name="report_latest")
    def report_latest(ctx):
        return ctx.ref("kpi", v=2)

    @reg.model(name="report_pinned")
    def report_pinned(ctx):
        return ctx.ref("kpi", v=1)

    wh = str(tmp_path / "wh")
    r = Runner(spark, reg, sources=lambda n: None, warehouse_dir=wh)
    out = r.run(["kpi_v1", "kpi.v2", "report_latest", "report_pinned"])
    assert out["report_latest"].count() == 7
    assert out["report_pinned"].count() == 5
    assert os.path.isdir(os.path.join(wh, "kpi_v1"))
    assert os.path.isdir(os.path.join(wh, "kpi_v2"))


def test_sql_compiler_version_pin():
    from furchild_spark.engine.sql_compiler import render

    r = render("select * from {{ ref('kpi', v=1) }} "
               "join {{ ref('kpi', version=2) }} using (id) "
               "join {{ ref('kpi') }} using (id)")
    assert "ref__kpi_v1" in r.placeholders
    assert "ref__kpi_v2" in r.placeholders
    assert r.placeholders["ref__kpi_v1"] == ("ref", "kpi_v1")
    assert r.placeholders["ref__kpi"] == ("ref", "kpi")  # unpinned: base
    assert set(r.refs) == {"kpi_v1", "kpi_v2", "kpi"}


def _write_versioned_project(tmp_path):
    proj = tmp_path / "proj"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text(textwrap.dedent("""\
        name: vproj
        models:
          vproj:
            +materialized: table
    """))
    (proj / "models" / "dim_x_v1.sql").write_text(
        "select 1 as id from {{ source('raw', 't') }}")
    (proj / "models" / "dim_x_two.sql").write_text(
        "select 1 as id, 2 as extra from {{ source('raw', 't') }}")
    (proj / "models" / "other.sql").write_text(
        "select * from {{ ref('dim_x', v=1) }}")
    (proj / "models" / "schema.yml").write_text(textwrap.dedent("""\
        version: 2
        models:
          - name: dim_x
            latest_version: 2
            deprecation_date: 2021-06-30
            versions:
              - v: 1
                config:
                  materialized: view
                  tags: [old_surface]
              - v: 2
                defined_in: dim_x_two
          - name: other
    """))
    return str(proj)


def test_yaml_versions_loader(tmp_path):
    from furchild_spark.engine.dbt_yaml import engine_model_kwargs, load_project

    p = load_project(_write_versioned_project(tmp_path))
    names = set(p.models)
    assert {"dim_x_v1", "dim_x_v2", "other"} <= names
    assert "dim_x_two" not in names  # defined_in re-keyed to dim_x_v2
    v1, v2 = p.models["dim_x_v1"], p.models["dim_x_v2"]
    assert (v1.version, v1.base_name, v1.latest_version) == (1, "dim_x", 2)
    assert (v2.version, v2.base_name, v2.latest_version) == (2, "dim_x", 2)
    assert v1.materialized == "view"  # version-level config override
    assert v1.tags == ("old_surface",)
    assert v2.materialized == "table"  # directory default kept
    assert v1.deprecation_date == "2021-06-30"
    assert p.models["other"].version is None

    kw = engine_model_kwargs(v1)
    assert kw["version"] == 1 and kw["latest_version"] == 2
    assert kw["deprecation_date"] == dt.date(2021, 6, 30)
    assert "version" not in engine_model_kwargs(p.models["other"])

    # the kwargs round-trip into a registry that resolves dbt's way
    reg = ModelRegistry()
    for dm in (v1, v2):
        reg.model(name=dm.base_name, **engine_model_kwargs(dm))(
            lambda ctx: None
        )
    assert reg.resolve("dim_x") == "dim_x_v2"


def test_yaml_versions_latest_falls_back_to_unsuffixed_file(tmp_path):
    from furchild_spark.engine.dbt_yaml import load_project

    proj = tmp_path / "p2"
    (proj / "models").mkdir(parents=True)
    (proj / "dbt_project.yml").write_text("name: p2\n")
    (proj / "models" / "m_v1.sql").write_text("select 1 as a")
    (proj / "models" / "m.sql").write_text("select 1 as a, 2 as b")
    (proj / "models" / "schema.yml").write_text(textwrap.dedent("""\
        version: 2
        models:
          - name: m
            versions:
              - v: 1
              - v: 2
    """))
    p = load_project(str(proj))
    assert set(p.models) == {"m_v1", "m_v2"}
    assert p.models["m_v2"].rel_path == "m.sql"  # dbt latest fallback

    (proj / "models" / "schema.yml").write_text(textwrap.dedent("""\
        version: 2
        models:
          - name: m
            versions:
              - v: 1
              - v: 2
              - v: 3
    """))
    # with v3 now latest, v2 loses the unsuffixed-file fallback and has
    # no m_v2.sql — the loader names the missing file
    with pytest.raises(FileNotFoundError, match="no SQL file"):
        load_project(str(proj))


def test_cli_ls_marks_versions_and_deprecation(monkeypatch, capsys):
    import furchild_spark.models as M
    from furchild_spark.cli import main

    reg = ModelRegistry()
    reg.model(name="kpi", version=1,
              deprecation_date=dt.date(2021, 6, 30))(lambda ctx: None)
    reg.model(name="kpi", version=2)(lambda ctx: None)
    monkeypatch.setattr(M, "registry", reg)
    assert main(["ls"]) == 0
    out = capsys.readouterr().out
    assert "version=1" in out and "deprecated=2021-06-30" in out
    assert "version=2 (latest)" in out


def test_cli_version_selector_and_alias(monkeypatch):
    import furchild_spark.cli as cli
    import furchild_spark.models as M

    reg = ModelRegistry()
    for v in (1, 2, 3):
        reg.model(name="kpi", version=v, latest_version=2)(lambda ctx: None)
    reg.model(name="plain")(lambda ctx: None)
    monkeypatch.setattr(M, "registry", reg)

    class A:
        models = None
        exclude = None
        selector = None

    def expand(tok):
        a = A()
        return cli._expand_token_list(a, None, [tok])

    assert expand("version:latest") == ["kpi_v2"]
    assert expand("version:old") == ["kpi_v1"]
    assert expand("version:prerelease") == ["kpi_v3"]
    assert expand("version:none") == ["plain"]
    assert expand("kpi.v1") == ["kpi_v1"]  # dbt selection alias
    with pytest.raises(SystemExit):
        expand("version:nope")


def test_yaml_selector_method_version(monkeypatch):
    """selectors.yml {method: version, value: latest} composes through
    the shared token grammar (dbt: version is a selector method like
    tag/group)."""
    import furchild_spark.cli as cli
    import furchild_spark.models as M

    reg = ModelRegistry()
    for v in (1, 2):
        reg.model(name="kpi", version=v)(lambda ctx: None)
    monkeypatch.setattr(M, "registry", reg)

    class A:
        models = None
        exclude = None
        selector = None

    got = cli._eval_selector_definition(
        A(), None, {"method": "version", "value": "latest"}, {}
    )
    assert got == {"kpi_v2"}
    got = cli._eval_selector_definition(
        A(), None, {"union": [{"method": "version", "value": "old"},
                              {"method": "version", "value": "latest"}]}, {}
    )
    assert got == {"kpi_v1", "kpi_v2"}
