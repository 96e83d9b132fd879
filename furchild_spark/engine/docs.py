"""dbt ``docs generate`` analogs: description extraction, the
catalog.json-style warehouse stats section, and a static HTML render.

dbt splits its docs artifact in two: ``manifest.json`` (declared nodes,
configs, edges) and ``catalog.json`` (what is ACTUALLY in the warehouse
— materialized columns, row counts, bytes). The CLI's ``docs`` command
emits both halves in one document; this module supplies the catalog half
and keeps it **metadata-only**: txlog tables answer from their commit
manifest (O(1) — every commit records per-file and total row counts),
parquet tables from their file footers via pyarrow (O(files), driver
side). No Spark job runs — at 100 TB a docs build that scans the
warehouse is a non-starter; one that reads footers finishes in seconds.
"""

from __future__ import annotations

import os


def description_of(model) -> str:
    """A model's description = the first paragraph of its function
    docstring (the rebuild's analog of schema.yml ``description:`` —
    docstrings already carry the reference citation per model)."""
    doc = (model.fn.__doc__ or "").strip()
    if not doc:
        return ""
    para = doc.split("\n\n", 1)[0]
    return " ".join(line.strip() for line in para.splitlines())


def _parquet_dir_stats(path: str) -> dict | None:
    """Row count / bytes / file count / schema from parquet FOOTERS —
    pyarrow, driver-side, no Spark job. Walks recursively so
    partition_by subdirectories (insert_overwrite layouts) are covered;
    skips staged/old swap dirs, which are not the committed table."""
    import json as _json

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return None
    rows, nbytes, nfiles = 0, 0, 0
    schema: dict[str, str] = {}
    part_vals: dict[str, list] = {}
    for root, dirs, files in os.walk(path):
        dirs[:] = [
            d for d in dirs
            if not d.endswith(("__staged", "__old")) and not d.startswith(".")
        ]
        # Hive-style partition directories (partition_by layouts): the
        # partition columns live in PATHS, never in footers — collect
        # their values so the catalog schema matches what a Spark read
        # of the table resolves
        for d in dirs:
            if "=" in d:
                k, _, v = d.partition("=")
                part_vals.setdefault(k, []).append(v)
        for f in files:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            md = pq.ParquetFile(fp).metadata
            rows += md.num_rows
            nbytes += os.path.getsize(fp)
            nfiles += 1
            # Spark stamps its OWN schema JSON into the footer's
            # key-value metadata — exact Spark type names (timestamp vs
            # timestamp_ntz survive), still zero data reads. Merged
            # across files so append_new_columns evolution is visible.
            kv = md.metadata or {}
            sj = kv.get(b"org.apache.spark.sql.parquet.row.metadata")
            if sj:
                from pyspark.sql.types import StructType

                for fld in StructType.fromJson(_json.loads(sj)).fields:
                    schema.setdefault(fld.name, fld.dataType.simpleString())
            else:  # non-Spark writer: fall back to arrow names
                sch = pq.read_schema(fp)
                for n, t in zip(sch.names, sch.types):
                    schema.setdefault(n, str(t))
    if nfiles == 0:
        return None
    for k, vals in part_vals.items():
        schema.setdefault(k, _infer_partition_type(vals))
    return {
        "row_count": rows,
        "bytes": nbytes,
        "files": nfiles,
        "columns": schema,
    }


def _infer_partition_type(vals: list) -> str:
    """Spark's partition-column type inference, the subset these
    warehouses produce: int -> bigint-if-needed -> date -> timestamp ->
    double -> string."""
    import datetime as _dt

    vals = [v for v in vals if v != "__HIVE_DEFAULT_PARTITION__"]

    def all_parse(fn) -> bool:
        try:
            for v in vals:
                fn(v)
            return bool(vals)
        except (ValueError, TypeError):
            return False

    if all_parse(int):
        return (
            "int"
            if all(-(2**31) <= int(v) < 2**31 for v in vals)
            else "bigint"
        )
    if all_parse(_dt.date.fromisoformat):
        return "date"
    if all_parse(
        lambda v: _dt.datetime.fromisoformat(v.replace("%3A", ":"))
    ):
        return "timestamp"
    if all_parse(float):
        return "double"
    return "string"


def _txlog_stats(spark_path: str) -> dict | None:
    """Stats from the txlog commit manifest: row count is O(1) (recorded
    at commit from the writers' footers), bytes/files/schema come from
    the manifest's file list — still zero data reads."""
    from furchild_spark.engine.txlog import TxTable

    tx = TxTable(None, spark_path)
    if not tx.exists():
        return None
    v = tx.current_version()
    m = tx._read_manifest(v)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(m["schema"])
    nbytes = 0
    for e in m["files"]:
        try:
            nbytes += os.path.getsize(tx._abs(e["path"]))
        except OSError:
            pass
    return {
        "row_count": m["num_rows"],
        "bytes": nbytes,
        "files": len(m["files"]),
        "columns": {f.name: f.dataType.simpleString() for f in schema.fields},
        "version": v,
    }


def warehouse_catalog(
    warehouse: str, order, registry, table_format: str = "parquet"
) -> dict:
    """The catalog.json half: one stats entry per model that is actually
    materialized in ``warehouse`` (views/ephemerals are correctly
    absent — they have no warehouse presence)."""
    out: dict[str, dict] = {}
    for name in order:
        m = registry[name]
        if m.materialized in ("view", "ephemeral"):
            continue
        path = os.path.join(warehouse, name)
        try:
            stats = (
                _txlog_stats(path)
                if table_format == "txlog"
                else _parquet_dir_stats(path)
            )
        except Exception:  # a single unreadable table must not kill docs
            stats = None
        if stats is not None:
            out[name] = stats
    return out


def _esc(s) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def render_html(doc: dict) -> str:
    """One self-contained static page (no JS deps, no server): model
    cards with config, description, columns+types, dependency edges,
    attached checks, and — when the catalog section exists — row/byte
    stats. The artifact a reader opens instead of running ``dag``."""
    cat = doc.get("catalog", {})
    rows = []
    for name in sorted(doc.get("nodes", {})):
        n = doc["nodes"][name]
        deps = n.get("depends_on", {})
        dep_str = ", ".join(
            [f"ref:{r}" for r in deps.get("refs", [])]
            + [f"src:{s}" for s in deps.get("sources", [])]
        ) or "—"
        cols = "".join(
            f"<tr><td><code>{_esc(c)}</code></td><td>{_esc(t)}</td></tr>"
            for c, t in sorted(n.get("columns", {}).items())
        )
        checks = ", ".join(
            f"{_esc(c['name'])} ({_esc(c['severity'])})"
            for c in n.get("checks", [])
        ) or "—"
        stats = cat.get(name)
        stat_str = (
            f"{stats['row_count']:,} rows · {stats['files']} files · "
            f"{stats['bytes']:,} B"
            if stats else ""
        )
        contract = (
            "<p><b>contract:</b> enforced "
            f"({len(n['contract']['columns'])} columns)</p>"
            if n.get("contract") else ""
        )
        rows.append(f"""
<details id="{_esc(name)}">
<summary><b>{_esc(name)}</b> <i>{_esc(n.get('materialized', ''))}</i>
 {stat_str}</summary>
<p>{_esc(n.get('description', ''))}</p>
{contract}
<p><b>depends on:</b> {_esc(dep_str)}</p>
<p><b>checks:</b> {checks}</p>
<table><tr><th>column</th><th>type</th></tr>{cols}</table>
</details>""")
    exp_rows = []
    for name in sorted(doc.get("exposures", {})):
        e = doc["exposures"][name]
        deps = ", ".join(f"ref:{r}" for r in e.get("depends_on", []))
        owner = f" · owner: {_esc(e['owner'])}" if e.get("owner") else ""
        exp_rows.append(f"""
<details id="{_esc(name)}">
<summary><b>{_esc(name)}</b> <i>exposure:{_esc(e.get('type', ''))}</i>
{owner}</summary>
<p>{_esc(e.get('description', ''))}</p>
<p><b>depends on:</b> {_esc(deps)}</p>
</details>""")
    exp_section = (
        f"<h2>exposures</h2>{''.join(exp_rows)}" if exp_rows else ""
    )
    return f"""<!doctype html>
<html><head><meta charset="utf-8"><title>furchild_spark catalog</title>
<style>
body {{ font: 14px/1.5 system-ui, sans-serif; margin: 2rem auto;
       max-width: 60rem; padding: 0 1rem; }}
details {{ border: 1px solid #ddd; border-radius: 6px;
           padding: .5rem .8rem; margin: .4rem 0; }}
summary {{ cursor: pointer; }}
table {{ border-collapse: collapse; margin: .5rem 0; }}
td, th {{ border: 1px solid #eee; padding: .15rem .6rem;
          text-align: left; }}
code {{ background: #f6f6f6; padding: 0 .25rem; }}
i {{ color: #777; }}
</style></head><body>
<h1>furchild_spark catalog</h1>
<p>{len(doc.get('nodes', {}))} models ·
{len(doc.get('sources', []))} sources ·
{len(cat)} materialized tables ·
{len(doc.get('exposures', {}))} exposures</p>
{''.join(rows)}
{exp_section}
</body></html>"""
