"""dbt project/schema YAML loader — the parity seam closer (SURVEY §3.4).

The reference IS a dbt project: its orchestration config lives in
``dbt_project.yml`` (materializations, schemas, vars — ref
``dbt_project.yml:12-39``), per-model ``{{ config(...) }}`` headers in the
SQL files, and ``schema.yml`` / per-model ``.yml`` files declaring columns,
generic tests, and source freshness (ref ``models/staging/schema.yml``).
This module parses those files with dbt's own precedence rules
(in-file config > nested directory config in dbt_project.yml, resolved
along the model's path under ``model-paths``) and derives:

- per-model registry config (:func:`engine_model_kwargs` maps dbt
  materializations onto the engine's — ``transient`` tables are plain
  tables, ``incremental`` defaults to the merge strategy like
  dbt-on-Snowflake),
- the generic-test suite (:func:`checks_from_tests` builds runnable
  :class:`~furchild_spark.engine.checks.Check` objects mechanically),
- source freshness specs (:func:`freshness_from_sources`).

The PYTHON declarations in ``furchild_spark.models`` remain the runtime
source of truth (the repo stays standalone — no reference checkout needed
to run); this loader exists so ``tests/test_dbt_yaml.py`` can PROVE the
two agree for every model and every declared test, and so one model can be
driven end-to-end from YAML-derived config (the ``dbt_yaml_model_e2e``
catalog entry).

Faithfulness notes:

- dbt resolves the ``models:`` config tree against each model's RESOURCE
  PATH. The reference's ``gold:`` subtree (``dbt_project.yml:24-39``)
  matches no directory (models/ has only ``staging`` and ``marts``), so
  its configs — including ``commerce.+tags`` and the facts'
  ``+materialized: incremental`` — are DEAD; the facts are incremental
  because their own config() headers say so.
- ``flags.require_generic_test_arguments_property: true``
  (``dbt_project.yml:11``) means generic test params may be nested under
  ``arguments:`` (dim_orders.yml does this); both spellings are parsed.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover - PyYAML is in the base image
    yaml = None


# ---------------------------------------------------------------------------
# parsed shapes
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TestSpec:
    """One generic test, canonicalized for cross-declaration comparison.

    ``kind`` drops the ``dbt_utils.`` namespace; ``params`` is a sorted
    tuple of (key, value) pairs with ``{{ column_name }}`` already
    substituted in expressions and list values tupled.
    """

    model: str  # model name, or "source:<table>" for source tests
    column: str | None
    kind: str
    params: tuple = ()
    severity: str = "error"


@dataclass(frozen=True)
class DerivedModel:
    """Effective config for one model after dbt precedence resolution."""

    name: str
    rel_path: str  # e.g. "staging/stg_users.sql"
    materialized: str  # table | view | incremental
    schema: str | None = None
    alias: str | None = None
    unique_key: str | None = None
    on_schema_change: str | None = None
    transient: bool = False
    tags: tuple = ()
    # dbt 1.5 governance: group from config (+group / config(group=...)),
    # access from the model's YAML `access:` property (or config) —
    # default protected, like dbt
    group: str | None = None
    access: str = "protected"
    # dbt 1.5 model versions (YAML `versions:` blocks): a versioned
    # model's entry is re-keyed to dbt's default relation name
    # `<base>_v<v>`; `base_name` keeps the family name ref() resolves,
    # `latest_version` the declared (or max) latest. dbt 1.6
    # `deprecation_date` parses to an ISO date string (warnings fire in
    # the registry, which owns the clock).
    version: int | None = None
    base_name: str | None = None
    latest_version: int | None = None
    deprecation_date: str | None = None


@dataclass(frozen=True)
class SourceFreshness:
    warn_after_hours: float
    error_after_hours: float


@dataclass(frozen=True)
class SourceTable:
    name: str
    loaded_at_field: str | None = None
    freshness: SourceFreshness | None = None


@dataclass
class DbtProject:
    name: str
    vars: dict = field(default_factory=dict)
    models: dict = field(default_factory=dict)  # name -> DerivedModel
    tests: list = field(default_factory=list)  # TestSpec (models + sources)
    sources: dict = field(default_factory=dict)  # table name -> SourceTable
    # generate_schema_name semantics: "default" (dbt target_custom
    # prefixing) or "verbatim" (the reference's override) — see
    # load_schema_naming
    schema_naming: str = "default"


# ---------------------------------------------------------------------------
# dbt_project.yml: vars + the directory config tree
# ---------------------------------------------------------------------------

def _require_yaml():
    if yaml is None:  # pragma: no cover
        raise ImportError("PyYAML is required to parse dbt project files")


def reference_dir() -> str | None:
    """Path of the reference dbt-project checkout, or None when absent.

    Resolved from ``$REFERENCE_DIR`` (default ``/root/reference``) so the
    repo stays standalone: everything that PARSES the reference's own
    files (the parity tests in tests/test_dbt_yaml.py and the
    ``dbt_yaml_*`` catalog entries) keys its skip/registration off this
    one helper instead of hardcoding a path that would crash the whole
    catalog sweep on a checkout without the reference."""
    d = os.environ.get("REFERENCE_DIR", "/root/reference")
    return d if os.path.isdir(os.path.join(d, "models")) else None


def _dir_config(models_cfg: dict, project: str, rel_dir: str) -> dict:
    """Effective +configs for a model directory, dbt-style: start at
    ``models.<project>`` and descend along the path segments, later
    (deeper) values overriding earlier; a segment with no matching key
    stops the descent (configs never apply across a missing level)."""
    node = (models_cfg or {}).get(project) or {}
    out = {
        k[1:]: v for k, v in node.items() if isinstance(k, str) and k.startswith("+")
    }
    for seg in [s for s in rel_dir.split(os.sep) if s and s != "."]:
        nxt = node.get(seg)
        if not isinstance(nxt, dict):
            break
        node = nxt
        out.update(
            {k[1:]: v for k, v in node.items()
             if isinstance(k, str) and k.startswith("+")}
        )
    return out


_CONFIG_RE = re.compile(r"\{\{\s*config\s*\((.*?)\)\s*\}\}", re.S)
# flat key = scalar pairs only — the reference's in-file configs carry no
# nested dicts (persist_docs lives in dbt_project.yml)
_KV_RE = re.compile(
    r"(\w+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\"|(true|false)|(\d+(?:\.\d+)?))",
    re.I,
)


def parse_config_block(sql_text: str) -> dict:
    """Parse a model SQL file's ``{{ config(...) }}`` header into a dict
    of scalar settings (strings, bools, numbers)."""
    m = _CONFIG_RE.search(sql_text)
    if not m:
        return {}
    out = {}
    for k, sq, dq, b, num in _KV_RE.findall(m.group(1)):
        if b:
            out[k] = b.lower() == "true"
        elif num:
            out[k] = float(num) if "." in num else int(num)
        else:
            out[k] = sq if sq else dq
    return out


def scan_models(project_dir: str) -> dict:
    """Walk ``<project>/models/**/*.sql`` and derive every model's
    effective config (directory defaults overridden by the in-file
    config() header)."""
    _require_yaml()
    proj = yaml.safe_load(open(os.path.join(project_dir, "dbt_project.yml")))
    project = proj["name"]
    models_cfg = proj.get("models") or {}
    models_root = os.path.join(project_dir, "models")
    out: dict = {}
    for root, _dirs, files in os.walk(models_root):
        for f in sorted(files):
            if not f.endswith(".sql"):
                continue
            rel = os.path.relpath(os.path.join(root, f), models_root)
            cfg = dict(_dir_config(models_cfg, project, os.path.dirname(rel)))
            cfg.update(parse_config_block(open(os.path.join(root, f)).read()))
            name = f[: -len(".sql")]
            out[name] = DerivedModel(
                name=name,
                rel_path=rel,
                materialized=str(cfg.get("materialized", "view")),
                schema=cfg.get("schema"),
                alias=cfg.get("alias"),
                unique_key=cfg.get("unique_key"),
                on_schema_change=cfg.get("on_schema_change"),
                transient=bool(cfg.get("transient", False)),
                tags=tuple(cfg.get("tags", ()) or ()),
                group=cfg.get("group"),
                access=str(cfg.get("access", "protected")),
            )
    return out


def apply_yaml_governance(models: dict, project_dir: str) -> dict:
    """Overlay per-model ``access:`` / ``config.group`` declared in the
    schema YAML files onto scanned models (dbt 1.5: access is a
    MODEL-LEVEL yml property, group lives in config). Returns the same
    dict with replaced entries; models absent from YAML keep their
    config-header/dir-config values."""
    import dataclasses as _dc
    import glob

    _require_yaml()
    for path in sorted(
        glob.glob(os.path.join(project_dir, "models", "**", "*.yml"),
                  recursive=True)
    ):
        doc = yaml.safe_load(open(path))
        if not isinstance(doc, dict):
            continue
        for m in doc.get("models") or []:
            name = m.get("name")
            if name not in models:
                continue
            updates = {}
            if "access" in m:
                updates["access"] = str(m["access"])
            grp = (m.get("config") or {}).get("group") or m.get("group")
            if grp:
                updates["group"] = str(grp)
            if updates:
                models[name] = _dc.replace(models[name], **updates)
    return models


def apply_yaml_versions(models: dict, project_dir: str) -> dict:
    """Re-key versioned models per dbt 1.5 ``versions:`` YAML blocks.

    For a YAML entry ``{name: m, latest_version: N, versions: [{v: 1},
    {v: 2, defined_in: other_file, config: {...}}]}`` each version's SQL
    file resolves dbt's way — ``defined_in`` if declared, else
    ``<name>_v<v>``, else (latest version only) ``<name>`` — and the
    scanned entry is re-keyed to the default relation name
    ``<name>_v<v>`` with ``version``/``base_name``/``latest_version``
    set. Version-level ``config:`` overrides (materialized, tags, group,
    access, unique_key, alias, schema) overlay the file-derived config.
    dbt 1.6 ``deprecation_date`` (model-level) lands on every version.
    Unversioned models pass through untouched."""
    import dataclasses as _dc
    import glob

    _require_yaml()
    for path in sorted(
        glob.glob(os.path.join(project_dir, "models", "**", "*.yml"),
                  recursive=True)
    ):
        doc = yaml.safe_load(open(path))
        if not isinstance(doc, dict):
            continue
        for m in doc.get("models") or []:
            name = m.get("name")
            vers = m.get("versions")
            dep = m.get("deprecation_date")
            dep = str(dep) if dep is not None else None
            if not vers:
                if dep and name in models:
                    models[name] = _dc.replace(
                        models[name], deprecation_date=dep
                    )
                continue
            declared = [int(v["v"]) for v in vers]
            latest = int(m.get("latest_version", max(declared)))
            for v in vers:
                vn = int(v["v"])
                stem = v.get("defined_in") or f"{name}_v{vn}"
                base_entry = models.get(stem)
                if base_entry is None and vn == latest:
                    base_entry = models.get(name)  # dbt latest fallback
                    stem = name if base_entry is not None else stem
                if base_entry is None:
                    raise FileNotFoundError(
                        f"versioned model {name} v{vn}: no SQL file "
                        f"{stem}.sql under models/ (declare defined_in?)"
                    )
                cfg = dict(v.get("config") or {})
                updates = {
                    k: cfg[k] for k in (
                        "materialized", "group", "access", "unique_key",
                        "alias", "schema",
                    ) if k in cfg
                }
                if "tags" in cfg:
                    updates["tags"] = tuple(cfg["tags"] or ())
                models[f"{name}_v{vn}"] = _dc.replace(
                    base_entry,
                    name=f"{name}_v{vn}",
                    version=vn,
                    base_name=name,
                    latest_version=latest,
                    deprecation_date=dep,
                    **updates,
                )
                if stem in models and stem != f"{name}_v{vn}":
                    del models[stem]
    return models


_REF_IN_YAML = re.compile(r"ref\(\s*['\"]([^'\"]+)['\"]\s*\)")


# ---------------------------------------------------------------------------
# relation naming: generate_schema_name + alias (dbt's database.schema.id)
# ---------------------------------------------------------------------------

_SCHEMA_MACRO = re.compile(
    r"\{%-?\s*macro\s+generate_schema_name\s*\(", re.I
)


def load_schema_naming(project_dir: str) -> str:
    """Which ``generate_schema_name`` rule the project uses.

    dbt resolves every model's schema through this overridable macro.
    Two shapes cover dbt practice (and both appear in dbt's own docs):

    - ``"default"`` — dbt-core's built-in: a model with a custom
      ``schema:`` lands in ``<target_schema>_<custom>`` (dev isolation
      by prefixing).
    - ``"verbatim"`` — the standard override (the reference ships it at
      ``macros/generate_schema_name.sql:1-9``): the custom schema name
      is used AS-IS (trimmed), so ``+schema: SILVER`` means schema
      ``SILVER``, not ``analytics_SILVER``.

    Classification is by the macro body's discriminating expression: a
    body concatenating ``default_schema`` with the custom name is
    dbt-default behavior; a body emitting the custom name alone is
    verbatim. A macro matching neither shape raises — better loud than a
    silently wrong physical layout."""
    import glob

    for path in sorted(
        glob.glob(os.path.join(project_dir, "macros", "**", "*.sql"),
                  recursive=True)
    ):
        text = open(path).read()
        if not _SCHEMA_MACRO.search(text):
            continue
        m = re.search(
            r"\{%-?\s*macro\s+generate_schema_name\s*\(.*?%\}(.*?)"
            r"\{%-?\s*endmacro", text, re.S | re.I,
        )
        body = m.group(1) if m else text
        # every emitted expression must be one of the two macro inputs
        # (or target.schema) — anything else (env_var, node.*, vars) is
        # a naming rule this engine can't replay; fail loud rather than
        # resolve a silently wrong physical layout
        for e in re.findall(r"\{\{-?\s*(.*?)\s*-?\}\}", body):
            if not re.fullmatch(
                r"default_schema|target\.schema|"
                r"custom_schema_name(\s*\|\s*trim)?", e.strip(),
            ):
                raise ValueError(
                    f"unrecognized generate_schema_name macro in {path} "
                    f"(expression {{{{ {e} }}}}) — supported shapes: dbt "
                    "default (target_custom) or verbatim custom schema"
                )
        if re.search(r"\}\}\s*_\s*\{\{", body):
            return "default"  # dbt-core's concatenating built-in
        return "verbatim"
    return "default"


def relation_name(dm: DerivedModel, *, naming: str = "default",
                  target_schema: str = "analytics",
                  database: str | None = None) -> str:
    """The model's resolved ``[database.]schema.identifier`` — what dbt
    records as ``relation_name`` in its manifest. The identifier is the
    ``alias`` config when declared, else the model name (for versioned
    models the node name already carries dbt's ``_v<N>`` suffix); the
    schema follows :func:`load_schema_naming` semantics."""
    if dm.schema is None:
        schema = target_schema
    elif naming == "verbatim":
        schema = str(dm.schema).strip()
    else:
        schema = f"{target_schema}_{str(dm.schema).strip()}"
    ident = dm.alias or dm.name
    return f"{database}.{schema}.{ident}" if database else f"{schema}.{ident}"


def load_exposures(project_dir: str) -> list:
    """Parse dbt ``exposures:`` blocks from the schema YAML files into
    the registry's exposure shape: (name, type, depends_on model names,
    owner, url, description). ``depends_on`` entries are dbt's
    ``ref('model')`` strings. Use with
    ``ModelRegistry.exposure(**e)`` to register a project's declared
    downstream consumers from its own files (the reference declares
    none — this is engine-generic surface, synthetic-tested)."""
    import glob

    _require_yaml()
    out = []
    for path in sorted(
        glob.glob(os.path.join(project_dir, "models", "**", "*.yml"),
                  recursive=True)
    ):
        doc = yaml.safe_load(open(path))
        if not isinstance(doc, dict):
            continue
        for e in doc.get("exposures") or []:
            deps = []
            for d in e.get("depends_on") or []:
                m = _REF_IN_YAML.search(str(d))
                deps.append(m.group(1) if m else str(d))
            owner = e.get("owner") or {}
            out.append({
                "name": e["name"],
                "exposure_type": str(e.get("type", "application")),
                "depends_on": tuple(deps),
                "owner": str(owner.get("name") or owner.get("email") or ""),
                "url": str(e.get("url") or ""),
                "description": str(e.get("description") or ""),
            })
    return out


def load_groups(project_dir: str) -> dict:
    """Parse dbt 1.5 ``groups:`` blocks from the schema YAML files:
    name -> owner dict (dbt requires an owner with name or email)."""
    import glob

    _require_yaml()
    groups: dict = {}
    for path in sorted(
        glob.glob(os.path.join(project_dir, "models", "**", "*.yml"),
                  recursive=True)
    ):
        doc = yaml.safe_load(open(path))
        if not isinstance(doc, dict):
            continue
        for g in doc.get("groups") or []:
            owner = g.get("owner") or {}
            if not (owner.get("name") or owner.get("email")):
                raise ValueError(
                    f"group {g.get('name')!r}: dbt requires an owner "
                    "with name or email"
                )
            groups[g["name"]] = dict(owner)
    return groups


# ---------------------------------------------------------------------------
# schema yml files: generic tests + sources
# ---------------------------------------------------------------------------

def _canon_expression(expr: str, column: str | None) -> str:
    """Substitute ``{{ column_name }}``, collapse whitespace, strip ONE
    redundant outer paren pair — '(a = b)' and 'a = b' are the same test."""
    e = re.sub(r"\{\{\s*column_name\s*\}\}", column or "", expr)
    e = " ".join(e.split())
    if e.startswith("(") and e.endswith(")"):
        depth = 0
        for i, ch in enumerate(e):
            depth += ch == "(";  depth -= ch == ")"
            if depth == 0 and i < len(e) - 1:
                break
        else:
            e = e[1:-1].strip()
    return e


def _one_test(owner: str, column: str | None, t) -> TestSpec:
    """Canonicalize one YAML test declaration (string or {name: params};
    params possibly nested under ``arguments:`` per dbt 1.8's
    require_generic_test_arguments_property flag)."""
    if isinstance(t, str):
        return TestSpec(owner, column, t.split(".")[-1])
    (kind, raw), = t.items()
    kind = kind.split(".")[-1]
    raw = dict(raw or {})
    severity = str(raw.pop("severity", "error")).lower()
    args = dict(raw.pop("arguments", {}) or {})
    args.update(raw)  # top-level spelling wins if both present
    args.pop("quote", None)  # SQL quoting hint — no analog here
    params: list = []
    if kind == "accepted_values":
        params.append(("values", tuple(args.get("values", ()))))
    elif kind == "relationships":
        to = str(args.get("to", ""))
        msrc = re.fullmatch(
            r"source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)", to
        )
        mref = re.fullmatch(r"ref\(\s*'([^']+)'\s*\)", to)
        if msrc:
            params.append(("to", ("source", msrc.group(2))))
        elif mref:
            params.append(("to", ("model", mref.group(1))))
        else:
            params.append(("to", ("raw", to)))
        params.append(("field", args.get("field")))
    elif kind == "expression_is_true":
        params.append(
            ("expression", _canon_expression(str(args.get("expression", "")), column))
        )
    elif kind == "unique_combination_of_columns":
        params.append(
            ("columns", tuple(args.get("combination_of_columns", ())))
        )
    return TestSpec(owner, column, kind, tuple(params), severity)


def load_schema_files(project_dir: str) -> tuple:
    """Parse every ``models/**/*.yml``: returns (tests, sources) where
    tests is a list of :class:`TestSpec` (model tests plus source-column
    tests under owner ``source:<table>``) and sources maps bronze table
    name -> :class:`SourceTable` (loaded_at + effective freshness, with
    source-level freshness inherited per dbt)."""
    _require_yaml()
    import glob

    tests: list = []
    sources: dict = {}
    for path in sorted(
        glob.glob(os.path.join(project_dir, "models", "**", "*.yml"),
                  recursive=True)
    ):
        doc = yaml.safe_load(open(path))
        if not isinstance(doc, dict):
            continue
        for m in doc.get("models") or []:
            for c in m.get("columns") or []:
                for t in c.get("tests") or []:
                    tests.append(_one_test(m["name"], c["name"], t))
            for t in m.get("tests") or []:
                tests.append(_one_test(m["name"], None, t))
        for s in doc.get("sources") or []:
            src_fresh = s.get("freshness")
            for tb in s.get("tables") or []:
                fresh = tb.get("freshness", src_fresh)
                fr = None
                # dbt only evaluates freshness where loaded_at_field is set
                if fresh and tb.get("loaded_at_field"):
                    fr = SourceFreshness(
                        warn_after_hours=_hours(fresh.get("warn_after")),
                        error_after_hours=_hours(fresh.get("error_after")),
                    )
                sources[tb["name"]] = SourceTable(
                    name=tb["name"],
                    loaded_at_field=tb.get("loaded_at_field"),
                    freshness=fr,
                )
                owner = f"source:{tb['name']}"
                for c in tb.get("columns") or []:
                    for t in c.get("tests") or []:
                        tests.append(_one_test(owner, c["name"], t))
    return tests, sources


def _hours(spec) -> float:
    if not spec:
        return 0.0
    count = float(spec.get("count", 0))
    period = str(spec.get("period", "hour"))
    return count * {"minute": 1 / 60, "hour": 1, "day": 24}[period]


def load_project(project_dir: str) -> DbtProject:
    """One-call loader: vars + derived model configs + test suite +
    sources for a dbt project checkout."""
    _require_yaml()
    proj = yaml.safe_load(open(os.path.join(project_dir, "dbt_project.yml")))
    tests, sources = load_schema_files(project_dir)
    return DbtProject(
        name=proj["name"],
        vars=dict(proj.get("vars") or {}),
        models=apply_yaml_versions(
            apply_yaml_governance(scan_models(project_dir), project_dir),
            project_dir,
        ),
        tests=tests,
        sources=sources,
        schema_naming=load_schema_naming(project_dir),
    )


# ---------------------------------------------------------------------------
# derived config -> engine registry / checks / freshness
# ---------------------------------------------------------------------------

def engine_model_kwargs(dm: DerivedModel) -> dict:
    """Map a dbt-derived model config onto
    :meth:`~furchild_spark.engine.registry.ModelRegistry.model` kwargs.

    - ``transient`` tables are plain tables (Spark has no session-scoped
      storage tier; the warehouse dir is already ephemeral per run)
    - ``incremental`` keeps dbt-on-Snowflake's default MERGE strategy
    - ``ephemeral`` and ``view`` are both lazy DataFrames here
    - ``on_schema_change`` needs no per-model knob: the engine reads
      tables with mergeSchema (append_new_columns) and full rebuilds are
      sync_all_columns by construction
    """
    materialized = {"ephemeral": "view"}.get(dm.materialized, dm.materialized)
    if dm.transient:
        materialized = "table"
    kw = {"materialized": materialized, "tags": dm.tags}
    if dm.unique_key:
        kw["unique_key"] = dm.unique_key
    if materialized == "incremental":
        kw["incremental_strategy"] = "merge"
    if dm.group:
        kw["group"] = dm.group
    if dm.access != "protected":
        kw["access"] = dm.access
    if dm.version is not None:
        # registry re-derives the node name from (base_name, version) —
        # callers register under name=dm.base_name
        kw["version"] = dm.version
        kw["latest_version"] = dm.latest_version
    if dm.deprecation_date:
        import datetime as _dt

        kw["deprecation_date"] = _dt.date.fromisoformat(
            dm.deprecation_date[:10]
        )
    return kw


def checks_from_tests(tests, source_ref=None, model_ref=None):
    """Build runnable :class:`~furchild_spark.engine.checks.Check`
    objects from YAML test specs — names generated mechanically as
    ``<model>_<column>_<kind>``. ``source_ref(table_name)`` resolves
    bronze DataFrames for relationships-to-source tests and for
    ``source:<table>`` owners; ``model_ref(model_name)`` resolves
    relationships-to-``ref('model')`` parents (pass ``runner.ref``).
    Without the matching resolver those checks are skipped."""
    from . import checks as C

    out = []
    for t in tests:
        is_source = t.model.startswith("source:")
        if is_source and source_ref is None:
            continue
        col = t.column or "model"
        name = f"{t.model.replace(':', '_')}_{col}_{t.kind}"
        params = dict(t.params)
        if t.kind == "not_null":
            fn = C._generic(C.not_null, t.column)
        elif t.kind == "unique":
            fn = C._generic(C.unique, t.column)
        elif t.kind == "accepted_values":
            fn = C._generic(C.accepted_values, t.column, list(params["values"]))
        elif t.kind == "expression_is_true":
            fn = C._generic(C.expression_is_true, params["expression"])
        elif t.kind == "unique_combination_of_columns":
            fn = C._generic(
                C.unique_combination_of_columns, list(params["columns"])
            )
        elif t.kind == "relationships":
            to_kind, to_name = params["to"]
            resolver = source_ref if to_kind == "source" else model_ref
            if to_kind not in ("source", "model"):
                raise ValueError(
                    f"relationships target {params['to']!r} is neither "
                    "source('...','...') nor ref('...')"
                )
            if resolver is None:
                continue
            parent, fld = resolver(to_name), params["field"]
            col_ = t.column
            fn = (lambda p, c_, f_: lambda df: C.relationships(df, c_, p, f_))(
                parent, col_, fld
            )
            fn.spec = ("relationships", col_, (to_kind, to_name), fld)
        else:
            raise ValueError(f"unknown generic test kind {t.kind!r}")
        model = t.model
        if is_source:
            # runnable via a resolver that understands the prefix; here we
            # bind the source df directly so plain run_checks(ref=...) works
            inner = fn
            df = source_ref(t.model.split(":", 1)[1])
            fn = (lambda i, d: lambda _df: i(d))(inner, df)
            fn.spec = getattr(inner, "spec", None)
            model = t.model
        out.append(
            C.Check(name, model, fn, severity=t.severity)
        )
    return out


def freshness_from_sources(sources) -> list:
    """Map YAML source freshness onto :class:`FreshnessSpec` — only
    tables with a ``loaded_at_field`` participate (dbt's rule)."""
    from .checks import FreshnessSpec

    return [
        FreshnessSpec(
            source=s.name,
            loaded_at_col=s.loaded_at_field,
            warn_after_hours=s.freshness.warn_after_hours,
            error_after_hours=s.freshness.error_after_hours,
        )
        for s in sources.values()
        if s.freshness is not None and s.loaded_at_field
    ]
