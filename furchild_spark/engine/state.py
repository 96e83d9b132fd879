"""State-based selection — dbt "slim CI" (``--select state:modified+``).

dbt compares each model's compiled SQL against a prior run's manifest
and rebuilds only what changed plus its descendant cone; everything
else is skipped. At 100 TB that is the single biggest rebuild-avoidance
lever an orchestrator has: a one-model edit must not re-materialize a
thousand-table warehouse.

Here the per-model fingerprint is a sha256 over the model's ANALYZED
logical plan (resolved through a VIEW-ONLY probe runner, so parent
models inline into the child's plan) plus its materialization config:

- The analyzed plan is what the model MEANS after resolution — renames,
  new filters, changed literals (including dbt-style ``vars``) all land
  in it, while formatting/comment churn in the Python model fn does not
  (a cosmetics-only edit correctly fingerprints identical, where dbt's
  raw-SQL hash would flag it).
- Parents inline, so a parent edit changes every descendant's
  fingerprint too: the modified set is already closed under
  descendants, exactly the ``state:modified+`` cone. The explicit
  closure in the CLI is therefore a safety net, not the mechanism.
- Plan strings carry session-ephemeral expression ids (``#123``); they
  are normalized away so fingerprints are stable across sessions. The
  ``maxToStringFields`` conf is raised during rendering so wide models
  aren't truncated into false-stable prefixes.
"""

from __future__ import annotations

import hashlib
import json
import re

_EXPR_ID = re.compile(r"#\d+")
_OBJ_ADDR = re.compile(r"@[0-9a-f]{6,}")

MANIFEST_VERSION = 1


def _normalize_plan(plan: str) -> str:
    """Strip session-ephemeral tokens: exprIds (#123 — a global
    per-session counter) and JVM object addresses."""
    return _OBJ_ADDR.sub("@", _EXPR_ID.sub("#", plan))


def model_fingerprint(df, model) -> str:
    """sha256 of the normalized analyzed plan + materialization config.

    ``df`` must come from a VIEW-ONLY runner (warehouse_dir=None): in
    table mode the plan would be a scan of the materialized output —
    identical for every model shape — instead of the composed transform.
    """
    spark = df.sparkSession
    key = "spark.sql.debug.maxToStringFields"
    prior = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    finally:
        spark.conf.set(key, prior)
    cfg = {
        "materialized": model.materialized,
        "unique_key": model.unique_key,
        "partition_by": list(model.partition_by),
        "snapshot_strategy": model.snapshot_strategy,
        "updated_at": model.updated_at,
        "check_cols": list(model.check_cols) if model.check_cols else None,
    }
    h = hashlib.sha256()
    h.update(_normalize_plan(plan).encode())
    h.update(json.dumps(cfg, sort_keys=True).encode())
    return h.hexdigest()


def build_manifest(probe_runner, names: list[str] | None = None) -> dict:
    """Fingerprint every model through ``probe_runner`` (MUST be
    view-only — no warehouse writes, no Spark actions: fingerprinting is
    pure plan construction)."""
    assert probe_runner.warehouse_dir is None, (
        "manifest fingerprints need a view-only probe runner"
    )
    reg = probe_runner.registry
    models = {}
    for name in names or reg.names():
        df = probe_runner.ref(name)
        models[name] = model_fingerprint(df, reg[name])
    return {"version": MANIFEST_VERSION, "models": models}


def save_manifest(manifest: dict, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)


def load_manifest(path: str) -> dict:
    with open(path) as fh:
        m = json.load(fh)
    if m.get("version") != MANIFEST_VERSION:
        raise ValueError(
            f"manifest version {m.get('version')!r} unsupported "
            f"(expected {MANIFEST_VERSION}): {path}"
        )
    return m


def modified_models(prior: dict, current: dict) -> list[str]:
    """Models whose fingerprint differs from (or is absent in) the prior
    manifest — dbt ``state:modified`` plus ``state:new``. A model that
    was DELETED since the prior manifest has nothing to build and is
    ignored, like dbt."""
    before = prior.get("models", {})
    return [
        name
        for name, fp in current["models"].items()
        if before.get(name) != fp
    ]
