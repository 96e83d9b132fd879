"""``spark.read.format("txlog")`` — a PySpark 4 Python DataSource over
the engine's transactional table format (engine/txlog.py), batch AND
structured-streaming.

The reference's warehouse is Snowflake tables; this repo's analog is the
txlog format, which until now was reachable only through the
:class:`~furchild_spark.engine.txlog.TxTable` API. Registering it as a
native data source gives the Delta-style UX on public Spark surface
(``pyspark.sql.datasource``, Spark 4.0+):

- ``spark.read.format("txlog").load(path)`` — snapshot-isolated batch
  read of the latest (or ``versionAsOf``) commit: the file list comes
  from one immutable manifest, so concurrent commits/vacuums of other
  versions never change what a query reads.
- **File-pruning filter pushdown**: :meth:`TxLogReader.pushFilters`
  receives Catalyst's translated predicates and drops every data file
  whose manifest footer stats PROVE it cannot match (the same zone-map
  logic ``TxTable.snapshot(where=...)`` uses). All filters are returned
  as "unsupported" so Spark still applies them row-level — pruning is
  purely a scan reduction, correctness never depends on it. At 100 TB
  this is the difference between scanning a partition's worth of files
  and scanning the table.
- ``spark.readStream.format("txlog").load(path)`` — a version-offset
  micro-batch stream (Delta streaming-source parity): each txlog COMMIT
  is an offset; a batch emits exactly the data files ADDED between two
  versions. Append-only commits stream exactly-once by construction
  (files are immutable, offsets are durable versions). Non-append
  commits (merge/replace/delete/overwrite/restore) raise unless
  ``ignoreChanges=true``, which emits newly added files and skips
  removals — dbt/Delta's documented semantics for streaming from a
  mutating table.

Workers read the parquet files with pyarrow (Arrow batches go straight
back to the JVM — no per-row Python), reconciling each file's physical
schema against the manifest schema so ``append_new_columns`` evolution
yields nulls for columns an old file predates, exactly like
``TxTable.snapshot``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# ops whose commit only ADDS data files (safe to stream without
# ignoreChanges); version 1 is always the table's initial population
_APPEND_OPS = {"append"}


def _manifest_path(table_dir: str, version: int) -> str:
    from furchild_spark.engine.txlog import _PAD

    return os.path.join(table_dir, "_txlog", f"{version:0{_PAD}d}.json")


def _versions(table_dir: str) -> list[int]:
    log = os.path.join(table_dir, "_txlog")
    if not os.path.isdir(log):
        return []
    out = []
    for f in os.listdir(log):
        stem, ext = os.path.splitext(f)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def _current_version(table_dir: str) -> int:
    vs = _versions(table_dir)
    if not vs:
        raise ValueError(f"{table_dir}: not a txlog table (no _txlog dir)")
    return vs[-1]


def _abs(table_dir: str, file_path: str) -> str:
    """TxTable._abs semantics: clone manifests reference the source
    table's files by absolute path; normal entries are table-relative."""
    return file_path if os.path.isabs(file_path) else os.path.join(
        table_dir, file_path
    )


def _file_may_match(entry: dict, predicates) -> bool:
    """Delegates to the format's own conservative zone-map/bloom
    skipping (txlog.TxTable._file_may_match) — ONE pruning semantics,
    whichever door the read comes through."""
    from furchild_spark.engine.txlog import TxTable

    return TxTable._file_may_match(entry, predicates)


def _translate_filters(filters):
    """Catalyst Filter objects -> (col, op, value) triples for manifest
    pruning. Only top-level single-column comparisons translate; every
    other shape is simply not used for pruning (and ALL filters are
    re-applied by Spark row-level regardless)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    ops = {
        EqualTo: "==",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    out = []
    for f in filters:
        op = ops.get(type(f))
        if op is None or len(f.attribute) != 1:
            continue
        out.append((f.attribute[0], op, f.value))
    return out


class _FilesPartition(InputPartition):
    def __init__(self, paths: list[str], schema_json: str):
        self.paths = paths
        self.schema_json = schema_json


def _nullable(schema: StructType) -> StructType:
    """Widen every field to nullable — what Spark's own parquet reads
    do with a user schema. The manifest records the WRITER's nullability
    (a lit() column comes in non-null), but schema evolution means older
    files legitimately read back null for later columns; declaring the
    writer's tighter nullability at the READ boundary would NPE in the
    JVM on those rows."""
    import copy

    out = copy.deepcopy(schema)
    for f in out.fields:
        f.nullable = True
    return out


def _read_files_arrow(partition):
    """Yield Arrow record batches for the partition's files, reconciled
    to the manifest schema (missing evolved columns -> nulls, column
    order normalized). Runs on executors; pyarrow-only, no Spark."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _nullable(StructType.fromJson(json.loads(partition.schema_json)))
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(target)
    for path in partition.paths:
        t = pq.read_table(path)
        cols = []
        for field in arrow_schema:
            if field.name in t.schema.names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(t.num_rows, type=field.type))
        for batch in pa.Table.from_arrays(cols, schema=arrow_schema).to_batches():
            yield batch


class TxLogReader(DataSourceReader):
    def __init__(self, table_dir: str, version: int):
        self.table_dir = table_dir
        self.manifest = _read_manifest(table_dir, version)
        self.predicates: list = []

    def pushFilters(self, filters):
        self.predicates = _translate_filters(filters)
        # everything is "unsupported": Spark keeps row-level filtering,
        # we keep the translated triples for manifest file pruning
        return filters

    def partitions(self):
        schema_json = json.dumps(self.manifest["schema"])
        entries = self.manifest["files"]
        if self.predicates:
            entries = [
                e for e in entries if _file_may_match(e, self.predicates)
            ]
        parts = [
            _FilesPartition([_abs(self.table_dir, e["path"])], schema_json)
            for e in entries
        ]
        # an empty table (or fully pruned scan) still needs ≥1 partition
        return parts or [_FilesPartition([], schema_json)]

    def read(self, partition):
        yield from _read_files_arrow(partition)


class TxLogStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, options: dict):
        self.table_dir = table_dir
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        start = options.get("startingversion")
        # default: stream the whole table from its first commit
        self.start_version = int(start) if start is not None else 0

    def initialOffset(self):
        return {"version": self.start_version}

    def latestOffset(self):
        return {"version": _current_version(self.table_dir)}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        prev_paths: set = set()
        if v0 > 0:
            prev_paths = {
                e["path"] for e in _read_manifest(self.table_dir, v0)["files"]
            }
        parts = []
        for v in range(v0 + 1, v1 + 1):
            m = _read_manifest(self.table_dir, v)
            if (
                v > 1
                and m["op"] not in _APPEND_OPS
                and not self.ignore_changes
            ):
                raise ValueError(
                    f"txlog stream: version {v} is a {m['op']!r} commit — "
                    "streaming a mutating table re-emits rewritten rows; "
                    "pass ignoreChanges=true to stream newly added files "
                    "and skip removals (Delta semantics)"
                )
            cur = {e["path"] for e in m["files"]}
            new = cur - prev_paths
            if new:
                parts.append(
                    _FilesPartition(
                        [_abs(self.table_dir, p) for p in sorted(new)],
                        json.dumps(m["schema"]),
                    )
                )
            prev_paths = cur
        if not parts:
            schema = _read_manifest(
                self.table_dir, max(v1, 1)
            )["schema"] if _versions(self.table_dir) else {}
            parts = [_FilesPartition([], json.dumps(schema))]
        return parts

    def read(self, partition):
        yield from _read_files_arrow(partition)

    def commit(self, end):
        pass  # offsets are durable txlog versions; nothing to release


class _TxWriteMessage(WriterCommitMessage):
    def __init__(self, entries: list[dict], rows: int):
        self.entries = entries
        self.rows = rows


class TxLogArrowWriter(DataSourceArrowWriter):
    """``df.write.format("txlog")`` — the write half of the source.

    Each executor task streams its Arrow batches into ONE immutable
    parquet file under a fresh ``data/<uuid>/`` dir and returns the
    manifest entry (relative path, row count, footer min/max stats and
    bloom filter for ``statsCols``) as its commit message; the driver's
    :meth:`commit` then publishes a manifest through the format's
    hard-link commit protocol — the same exactly-one-writer-wins
    arbitration every TxTable write uses, with the same
    ConcurrentWriteError retry loop. Files from failed/aborted attempts
    are never referenced by any manifest (and :meth:`abort` unlinks the
    reported ones), so readers can't see partial writes — vacuum sweeps
    any orphans a hard crash leaves.

    ``mode("append")`` carries the prior version's files by reference
    (O(new data), never a rewrite) and requires the incoming columns to
    match the table's — schema evolution stays an explicit
    ``TxTable.append(allow_evolution=True)`` decision, not a write-path
    default. ``clusterBy`` layout is also TxTable's job (it needs a
    repartition the sink cannot impose); ``statsCols`` still lets an
    unclustered write record skipping stats."""

    def __init__(self, table_dir: str, schema: StructType, overwrite: bool,
                 options: dict):
        self.table_dir = table_dir
        self.schema = schema
        self.overwrite = overwrite
        cols = options.get("statscols", "")
        self.stats_cols = tuple(c.strip() for c in cols.split(",") if c.strip())

    def _tx(self):
        from furchild_spark.engine.txlog import TxTable

        # spark=None: only the filesystem/pyarrow half of TxTable is
        # used (footer stats, bloom, manifest commit) — no session needed
        return TxTable(None, self.table_dir, stats_cols=self.stats_cols)

    def write(self, iterator):
        import uuid

        import pyarrow.parquet as pq

        tx = self._tx()
        writer = None
        rel = None
        rows = 0
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                commit_id = uuid.uuid4().hex
                out_dir = os.path.join(self.table_dir, "data", commit_id)
                os.makedirs(out_dir, exist_ok=True)
                rel = os.path.join("data", commit_id, "part-0.parquet")
                writer = pq.ParquetWriter(
                    os.path.join(self.table_dir, rel), batch.schema
                )
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return _TxWriteMessage([], 0)  # empty task: nothing to commit
        writer.close()
        abspath = os.path.join(self.table_dir, rel)
        stats, n = tx._footer_stats(abspath)
        entry = {"path": rel, "rows": n, "stats": stats}
        bloom = tx._bloom_for(abspath)
        if bloom:
            entry["bloom"] = bloom
        return _TxWriteMessage([entry], n)

    def commit(self, messages):
        from furchild_spark.engine.txlog import ConcurrentWriteError

        tx = self._tx()
        entries = [e for m in messages if m for e in m.entries]
        rows = sum(m.rows for m in messages if m)
        for _ in range(3):
            base = tx.current_version()
            if self.overwrite or base == 0:
                files, total, op = entries, rows, "overwrite"
                schema_json = self.schema.jsonValue()
            else:
                prior = tx._read_manifest(base)
                have = {f["name"] for f in prior["schema"]["fields"]}
                got = {f.name for f in self.schema.fields}
                if have != got:
                    raise ValueError(
                        f"{self.table_dir}: append schema mismatch "
                        f"(missing={sorted(have - got)}, "
                        f"new={sorted(got - have)}); schema evolution is "
                        "an explicit TxTable.append(allow_evolution=True)"
                    )
                files = prior["files"] + entries
                total = prior["num_rows"] + rows
                op = "append"
                schema_json = prior["schema"]
            manifest = {
                "op": op,
                "files": files,
                "num_files": len(files),
                "num_rows": total,
                "schema": schema_json,
                "cluster_by": [],
            }
            try:
                tx._commit(manifest, base)
                return
            except ConcurrentWriteError:
                continue  # recompute against the new snapshot and retry
        raise ConcurrentWriteError(
            f"{self.table_dir}: lost the commit race 3 times"
        )

    def abort(self, messages):
        for m in messages:
            if not m:
                continue
            for e in m.entries:
                try:
                    os.unlink(os.path.join(self.table_dir, e["path"]))
                except FileNotFoundError:
                    pass


class TxLogStreamArrowWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("txlog")`` — transactional streaming sink.

    Tasks write files exactly like the batch writer (delegated); the
    driver commits each micro-batch as ONE ``stream_append`` manifest.
    With ``txnAppId`` set, the manifest records the Delta-style
    ``{app_id: batch_id}`` watermark IN THE SAME atomic commit as the
    data (txlog's ``write_stream_batch`` contract), so a redelivered
    batch — Structured Streaming's at-least-once failure mode — finds
    ``batchId <= last_txn`` and commits nothing: exactly-once, with no
    window where data landed but the watermark didn't. Without
    ``txnAppId`` the sink is plain at-least-once append; the option is
    deliberately explicit because a WRONG shared app id across two
    queries would silently drop the second query's batches (the same
    reason Delta's foreachBatch idempotence requires explicit
    txnAppId/txnVersion)."""

    def __init__(self, table_dir: str, schema: StructType, options: dict):
        self._w = TxLogArrowWriter(table_dir, schema, False, options)
        self.table_dir = table_dir
        self.schema = schema
        self.txn_app_id = options.get("txnappid")

    def write(self, iterator):
        return self._w.write(iterator)

    def commit(self, messages, batchId):
        from furchild_spark.engine.txlog import ConcurrentWriteError

        tx = self._w._tx()
        entries = [e for m in messages if m for e in m.entries]
        rows = sum(m.rows for m in messages if m)
        for attempt in range(4):
            if (
                self.txn_app_id is not None
                and batchId <= tx.last_txn(self.txn_app_id)
            ):
                # duplicate delivery: the batch is already inside a
                # committed manifest — drop OUR files (they are fresh
                # duplicates nothing references) and do nothing
                self._w.abort(messages)
                return
            base = tx.current_version()
            if base:
                prior = tx._read_manifest(base)
                have = {f["name"] for f in prior["schema"]["fields"]}
                got = {f.name for f in self.schema.fields}
                if have != got:
                    raise ValueError(
                        f"{self.table_dir}: stream batch schema mismatch "
                        f"(missing={sorted(have - got)}, "
                        f"new={sorted(got - have)})"
                    )
                files = prior["files"] + entries
                total = prior["num_rows"] + rows
                schema_json = prior["schema"]
            else:
                files, total = entries, rows
                schema_json = self.schema.jsonValue()
            manifest = {
                "op": "stream_append",
                "files": files,
                "num_files": len(files),
                "num_rows": total,
                "schema": schema_json,
                "cluster_by": [],
            }
            if self.txn_app_id is not None:
                manifest["txns"] = {self.txn_app_id: batchId}
            try:
                tx._commit(manifest, base)
                return
            except ConcurrentWriteError:
                if attempt == 3:
                    raise
                # competing writer advanced the log: re-read watermark
                # and prior files, retry

    def abort(self, messages, batchId):
        self._w.abort(messages)


class TxLogDataSource(DataSource):
    """``format("txlog")``: options ``path`` (table dir), ``versionAsOf``
    (batch time travel), ``startingVersion`` / ``ignoreChanges``
    (stream)."""

    @classmethod
    def name(cls):
        return "txlog"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("txlog source requires a path (load(path))")
        return path

    def _batch_version(self) -> int:
        v = self.options.get("versionasof")
        return int(v) if v is not None else _current_version(self._table_dir())

    def schema(self):
        return _nullable(StructType.fromJson(
            _read_manifest(self._table_dir(), self._batch_version())["schema"]
        ))

    def reader(self, schema):
        return TxLogReader(self._table_dir(), self._batch_version())

    def streamReader(self, schema):
        return TxLogStreamReader(self._table_dir(), dict(self.options))

    def writer(self, schema, overwrite):
        return TxLogArrowWriter(
            self._table_dir(), schema, overwrite, dict(self.options)
        )

    def streamWriter(self, schema, overwrite):
        return TxLogStreamArrowWriter(
            self._table_dir(), schema, dict(self.options)
        )


def register(spark) -> None:
    """Idempotently register the source on a session:
    ``spark.dataSource.register(TxLogDataSource)``.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — a runtime
    SQL conf checked at read-planning time: ``TxLogReader.pushFilters``
    (manifest file pruning) raises ``DATA_SOURCE_PUSHDOWN_DISABLED`` on
    any session that does not carry it. The repo's own session factory
    sets it, but externally constructed sessions (the bench driver, a
    bare ``SparkSession.builder``) do not, so the registration helper is
    the one place every consumer of the format must pass through.

    Idempotence is literal: a cloned session (``newSession()``) sees the
    parent's registration and raises ``DATA_SOURCE_ALREADY_EXISTS`` on
    re-register (same-session re-registration replaces silently) — the
    name being present IS the post-condition, so that error is
    swallowed."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(TxLogDataSource)
    except Exception as e:  # AnalysisException; avoid the pyspark import
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
