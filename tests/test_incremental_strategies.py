"""Incremental strategies beyond merge (dbt incremental_strategy):

- ``append``            — blind insert, no key matching
- ``insert_overwrite``  — replace exactly the partitions present in the
                          batch (dynamic partition overwrite / file-scoped
                          replace_scope)
- ``microbatch``        — dbt 1.9 event-time batching: the model fn runs
                          once per batch window and each batch's output
                          atomically replaces its own event-time slice

Each strategy runs on BOTH warehouse backends (parquet, txlog) through a
real Runner, and the scale property is asserted where the backend can
show it (txlog: untouched files carried forward by reference)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine.registry import ModelRegistry, Runner
from furchild_spark.engine.txlog import TxTable

_EPOCH = dt.datetime(1970, 1, 1)
_US = dt.timedelta(microseconds=1)


def _mk_registry_append():
    reg = ModelRegistry()

    @reg.model(
        name="ev_append", materialized="incremental",
        incremental_strategy="append",
    )
    def ev_append(ctx):
        return ctx.source("events")

    return reg


def _mk_registry_iow():
    reg = ModelRegistry()

    @reg.model(
        name="ev_part", materialized="incremental",
        incremental_strategy="insert_overwrite", partition_by=("day",),
    )
    def ev_part(ctx):
        return ctx.source("events")

    return reg


def _mk_registry_micro(lookback=1):
    reg = ModelRegistry()

    @reg.model(
        name="ev_daily", materialized="incremental",
        incremental_strategy="microbatch", event_time="ts",
        batch_size="day", lookback=lookback,
    )
    def ev_daily(ctx):
        return ctx.filter_batch(ctx.source("events"))

    return reg


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, day string, ts timestamp, v long")


def _ts(s):
    return dt.datetime.fromisoformat(s)


D1, D2, D3 = "2024-01-01", "2024-01-02", "2024-01-03"


def _rows(df):
    # hive-partitioned reads infer the partition col as DATE; pin string
    # so values compare across backends/layouts
    return sorted(
        tuple(r)
        for r in df.select(
            "id", F.col("day").cast("string").alias("day"), "ts", "v"
        ).collect()
    )


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_append_strategy(spark, tmp_path_factory, fmt):
    """Incremental append adds the batch without touching existing rows —
    including a re-sent id (duplicates are the caller's contract)."""
    wh = str(tmp_path_factory.mktemp(f"wh_app_{fmt}"))
    batch1 = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                             (2, D2, _ts(f"{D2}T01:00"), 20)])
    batch2 = _events(spark, [(2, D2, _ts(f"{D2}T02:00"), 21),
                             (3, D3, _ts(f"{D3}T01:00"), 30)])
    src = {"events": batch1}
    reg = _mk_registry_append()
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, table_format=fmt)
    assert r1.ref("ev_append").count() == 2
    src["events"] = batch2
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, table_format=fmt)
    out = _rows(r2.ref("ev_append"))
    assert len(out) == 4  # both id=2 rows live — append never merges
    assert (1, D1, _ts(f"{D1}T01:00"), 10) in out
    assert (2, D2, _ts(f"{D2}T02:00"), 21) in out


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_insert_overwrite_strategy(spark, tmp_path_factory, fmt):
    """The batch carries partitions D2 (changed) and D3 (new): D2's old
    rows are gone wholesale (no key matching — a dropped row disappears),
    D3 lands, D1 is untouched."""
    wh = str(tmp_path_factory.mktemp(f"wh_iow_{fmt}"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20),
                              (5, D2, _ts(f"{D2}T03:00"), 25)])
    batch = _events(spark, [(2, D2, _ts(f"{D2}T02:00"), 21),
                            (3, D3, _ts(f"{D3}T01:00"), 30)])
    src = {"events": initial}
    reg = _mk_registry_iow()
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, table_format=fmt)
    r1.ref("ev_part")
    src["events"] = batch
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, table_format=fmt)
    out = _rows(r2.ref("ev_part"))
    assert out == sorted([
        (1, D1, _ts(f"{D1}T01:00"), 10),   # untouched partition
        (2, D2, _ts(f"{D2}T02:00"), 21),   # D2 replaced wholesale...
        (3, D3, _ts(f"{D3}T01:00"), 30),   # ...new partition inserted
    ])  # id=5 (old D2) is gone — partition replacement, not merge


def test_insert_overwrite_txlog_carries_untouched_files(spark, tmp_path_factory):
    """The 100 TB property: replace_scope must carry files of untouched
    scope values forward BY REFERENCE — same path entries in the next
    manifest, no rewrite."""
    wh = str(tmp_path_factory.mktemp("wh_iow_files"))
    path = f"{wh}/ev"
    t = TxTable(spark, path, cluster_by=("day",))
    # AQE folds a column-only range repartition of a tiny batch into one
    # file; pin the file count so the clustered layout is observable
    t.target_files = 2
    t.overwrite(_events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                                (2, D2, _ts(f"{D2}T01:00"), 20)]))
    v1 = t.current_version()
    m1 = t._read_manifest(v1)
    d1_files = {
        e["path"] for e in m1["files"]
        if e.get("stats", {}).get("day", [None, None])[0] == D1
        and e["stats"]["day"][1] == D1
    }
    assert d1_files, "clustered write should isolate D1 into its own file(s)"
    t.replace_scope(_events(spark, [(2, D2, _ts(f"{D2}T02:00"), 21)]), "day")
    m2 = t._read_manifest(t.current_version())
    assert d1_files <= {e["path"] for e in m2["files"]}, (
        "untouched D1 files must carry forward by reference"
    )
    out = _rows(t.snapshot())
    assert out == sorted([(1, D1, _ts(f"{D1}T01:00"), 10),
                          (2, D2, _ts(f"{D2}T02:00"), 21)])


def test_replace_where_keeps_null_and_outside_rows(spark, tmp_path_factory):
    """SQL slice semantics: rows outside the window and NULL event times
    survive a replace_where; the commit is ONE version."""
    wh = str(tmp_path_factory.mktemp("wh_rw"))
    t = TxTable(spark, f"{wh}/ev")
    t.overwrite(_events(spark, [
        (1, D1, _ts(f"{D1}T01:00"), 10),
        (2, D2, _ts(f"{D2}T01:00"), 20),
        (9, D3, None, 90),  # NULL ts must survive any slice replace
    ]))
    v_before = t.current_version()
    t.replace_where(
        _events(spark, [(2, D2, _ts(f"{D2}T05:00"), 22)]),
        [("ts", ">=", _ts(f"{D2}T00:00")), ("ts", "<", _ts(f"{D3}T00:00"))],
    )
    assert t.current_version() == v_before + 1
    out = _rows(t.snapshot())
    assert out == sorted([(1, D1, _ts(f"{D1}T01:00"), 10),
                          (2, D2, _ts(f"{D2}T05:00"), 22),
                          (9, D3, None, 90)])
    with pytest.raises(ValueError):
        t.replace_where(_events(spark, []), [])


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_microbatch_rebuilds_only_window_batches(spark, tmp_path_factory, fmt):
    """The defining microbatch property: after the initial load, a source
    change in OLD history (outside lookback) is NOT picked up — only the
    window batches rebuild — while changes inside the window are. Batch
    bookkeeping lands in microbatch_results."""
    wh = str(tmp_path_factory.mktemp(f"wh_mb_{fmt}"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20),
                              (3, D3, _ts(f"{D3}T01:00"), 30)])
    # later source state: D1 row MUTATED (old history), D2 row mutated
    # (inside lookback), D3 gains a late row
    mutated = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11),
                              (2, D2, _ts(f"{D2}T01:00"), 22),
                              (3, D3, _ts(f"{D3}T01:00"), 30),
                              (4, D3, _ts(f"{D3}T09:00"), 40)])
    src = {"events": initial}
    reg = _mk_registry_micro(lookback=1)
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, now=_ts(f"{D3}T12:00"), table_format=fmt)
    assert r1.ref("ev_daily").count() == 3
    src["events"] = mutated
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, now=_ts("2024-01-04T00:00"), table_format=fmt)
    out = _rows(r2.ref("ev_daily"))
    assert out == sorted([
        (1, D1, _ts(f"{D1}T01:00"), 10),   # OLD history: v=10 kept, not 11
        (2, D2, _ts(f"{D2}T01:00"), 22),   # lookback batch rebuilt
        (3, D3, _ts(f"{D3}T01:00"), 30),
        (4, D3, _ts(f"{D3}T09:00"), 40),   # late row in the newest batch
    ])
    batches = r2.microbatch_results["ev_daily"]
    # max(ts)=D3, lookback 1 → window starts D2; end=Jan 4 → 2 day-batches
    assert [b["status"] for b in batches] == ["success", "success"]
    assert batches[0]["batch"][0].startswith(D2)
    assert batches[1]["batch"][0].startswith(D3)
    assert json.dumps(batches)  # serializable, run_results-style


def test_microbatch_txlog_skips_old_history_files(spark, tmp_path_factory):
    """The 100 TB property the docstring claims (r6 ADVICE made it real):
    a microbatch model's TxTable carries footer stats on its event_time
    column, so each batch's replace_where PRUNES files wholly outside the
    event-time slice — old-history files carry forward by reference
    across the incremental run, never rewritten."""
    reg = ModelRegistry()

    @reg.model(
        name="ev_daily", materialized="incremental",
        incremental_strategy="microbatch", event_time="ts",
        batch_size="day", lookback=1, partition_by=("day",),
    )
    def ev_daily(ctx):
        return ctx.filter_batch(ctx.source("events"))

    wh = str(tmp_path_factory.mktemp("wh_mb_files"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20),
                              (3, D3, _ts(f"{D3}T01:00"), 30)])
    src = {"events": initial}
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, now=_ts(f"{D3}T12:00"),
                table_format="txlog", tx_target_files=3)
    assert r1.ref("ev_daily").count() == 3
    t = TxTable(spark, f"{wh}/ev_daily", stats_cols=("day", "ts"))
    m1 = t._read_manifest(t.current_version())
    # event_time stats must be in every file entry (epoch-micros ints —
    # the comparable encoding; INT96 would have dropped them entirely)
    tstats = [e["stats"].get("ts") for e in m1["files"]]
    assert all(s is not None and isinstance(s[0], int) for s in tstats), tstats
    old_files = {
        e["path"] for e in m1["files"]
        if e["stats"]["ts"][1] < (_ts(f"{D2}T00:00") - _EPOCH) // _US
    }
    assert old_files, "clustered initial load should isolate D1 file(s)"
    src["events"] = _events(spark, [
        (2, D2, _ts(f"{D2}T01:00"), 22),
        (4, D3, _ts(f"{D3}T09:00"), 40),
    ])
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, now=_ts("2024-01-04T00:00"),
                table_format="txlog", tx_target_files=3)
    r2.ref("ev_daily")
    m2 = t._read_manifest(t.current_version())
    assert old_files <= {e["path"] for e in m2["files"]}, (
        "old-history files outside every batch slice must carry forward "
        "by reference"
    )


def test_microbatch_registration_validation():
    reg = ModelRegistry()
    with pytest.raises(ValueError, match="requires event_time"):
        @reg.model(name="m1", materialized="incremental",
                   incremental_strategy="microbatch")
        def m1(ctx):
            pass
    with pytest.raises(ValueError, match="unknown batch_size"):
        @reg.model(name="m2", materialized="incremental",
                   incremental_strategy="microbatch", event_time="ts",
                   batch_size="week")
        def m2(ctx):
            pass
    with pytest.raises(ValueError, match="unknown incremental_strategy"):
        @reg.model(name="m3", materialized="incremental",
                   incremental_strategy="delete+insert")
        def m3(ctx):
            pass
    with pytest.raises(ValueError, match="requires partition_by"):
        @reg.model(name="m4", materialized="incremental",
                   incremental_strategy="insert_overwrite")
        def m4(ctx):
            pass


def test_microbatch_filter_batch_is_noop_outside_batches(spark):
    """A model can call ctx.filter_batch unconditionally: outside a
    microbatch rebuild (initial full load) it must pass data through."""
    reg = _mk_registry_micro()
    r = Runner(spark, reg, sources=lambda n: _events(
        spark, [(1, D1, _ts(f"{D1}T01:00"), 10)]), warehouse_dir=None)
    assert r.ref("ev_daily").count() == 1


def test_calendar_arithmetic_units():
    from furchild_spark.engine.registry import _add_one, _sub_one, _trunc_to

    t = dt.datetime(2024, 3, 15, 13, 45, 7)
    assert _trunc_to(t, "hour") == dt.datetime(2024, 3, 15, 13)
    assert _trunc_to(t, "day") == dt.datetime(2024, 3, 15)
    assert _trunc_to(t, "month") == dt.datetime(2024, 3, 1)
    assert _trunc_to(t, "year") == dt.datetime(2024, 1, 1)
    jan = dt.datetime(2024, 1, 1)
    dec = dt.datetime(2024, 12, 1)
    assert _add_one(dec, "month") == dt.datetime(2025, 1, 1)
    assert _sub_one(jan, "month") == dt.datetime(2023, 12, 1)
    assert _add_one(jan, "year") == dt.datetime(2025, 1, 1)
    assert _sub_one(jan, "hour") == dt.datetime(2023, 12, 31, 23)


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_microbatch_explicit_backfill_window(spark, tmp_path_factory, fmt):
    """dbt --event-time-start/end: the backfill rebuilds EXACTLY the
    requested window — here day 1 only — leaving every other batch
    untouched even though the derived window would cover days 2-3."""
    wh = str(tmp_path_factory.mktemp(f"wh_bf_{fmt}"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20),
                              (3, D3, _ts(f"{D3}T01:00"), 30)])
    mutated = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11),
                              (2, D2, _ts(f"{D2}T01:00"), 22),
                              (3, D3, _ts(f"{D3}T01:00"), 33)])
    src = {"events": initial}
    reg = _mk_registry_micro()
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, table_format=fmt)
    r1.ref("ev_daily")
    src["events"] = mutated
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, table_format=fmt,
                backfill_start=_ts(f"{D1}T06:00"),  # snaps down to D1 00:00
                backfill_end=_ts(f"{D2}T00:00"))
    out = _rows(r2.ref("ev_daily"))
    assert out == sorted([
        (1, D1, _ts(f"{D1}T01:00"), 11),   # backfilled
        (2, D2, _ts(f"{D2}T01:00"), 20),   # untouched
        (3, D3, _ts(f"{D3}T01:00"), 30),   # untouched
    ])
    assert len(r2.microbatch_results["ev_daily"]) == 1


def test_backfill_window_validation(spark):
    reg = _mk_registry_micro()
    with pytest.raises(ValueError, match="go together"):
        Runner(spark, reg, sources={}, backfill_start=_ts(f"{D1}T00:00"))
    with pytest.raises(ValueError, match="before"):
        Runner(spark, reg, sources={}, backfill_start=_ts(f"{D2}T00:00"),
               backfill_end=_ts(f"{D1}T00:00"))


# -- full refresh (dbt --full-refresh) ---------------------------------------

def _mk_registry_merge():
    reg = ModelRegistry()

    @reg.model(
        name="ev_merge", materialized="incremental", unique_key="id",
    )
    def ev_merge(ctx):
        df = ctx.source("events")
        if ctx.is_incremental():
            # classic lookback predicate: only new-ish rows on
            # incremental runs, so an old-history source fix is invisible
            # until a full refresh
            df = df.filter(F.col("day") >= D2)
        return df

    return reg


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_full_refresh_rebuilds_from_scratch(spark, tmp_path_factory, fmt):
    """--full-refresh forces the is_incremental()=false branch and an
    overwrite materialization: an old-history fix the incremental
    lookback can never see lands, stale rows absent from the source
    vanish, and a following plain incremental run converges (reference
    fct_orders.sql:1-5 is the config shape this flag rebuilds)."""
    wh = str(tmp_path_factory.mktemp(f"wh_fr_{fmt}"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20)])
    # source later: old-history row CORRECTED (v=11), id=2 gone upstream
    fixed = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11),
                            (3, D3, _ts(f"{D3}T01:00"), 30)])
    src = {"events": initial}
    reg = _mk_registry_merge()
    r1 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=False, table_format=fmt)
    assert r1.ref("ev_merge").count() == 2
    src["events"] = fixed
    # plain incremental: lookback filter hides the D1 fix, merge keeps id=2
    r2 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, table_format=fmt)
    out2 = _rows(r2.ref("ev_merge"))
    assert (1, D1, _ts(f"{D1}T01:00"), 10) in out2   # stale old history
    assert (2, D2, _ts(f"{D2}T01:00"), 20) in out2   # upstream-deleted row
    # full refresh: table becomes exactly the (fixed) source
    r3 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, full_refresh=True, table_format=fmt)
    out3 = _rows(r3.ref("ev_merge"))
    assert out3 == sorted([(1, D1, _ts(f"{D1}T01:00"), 11),
                           (3, D3, _ts(f"{D3}T01:00"), 30)])
    # and a later plain incremental run converges (no resurrection)
    r4 = Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
                incremental=True, table_format=fmt)
    assert _rows(r4.ref("ev_merge")) == out3


def test_full_refresh_txlog_keeps_history(spark, tmp_path_factory):
    """txlog backend: a full refresh is a NEW VERSION (overwrite commit),
    not a table reset — the pre-refresh contents stay time-travelable."""
    wh = str(tmp_path_factory.mktemp("wh_fr_hist"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10)])
    fixed = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11)])
    src = {"events": initial}
    reg = _mk_registry_merge()
    Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
           incremental=False, table_format="txlog").ref("ev_merge")
    t = TxTable(spark, f"{wh}/ev_merge")
    v1 = t.current_version()
    src["events"] = fixed
    Runner(spark, reg, sources=lambda n: src[n], warehouse_dir=wh,
           incremental=True, full_refresh=True,
           table_format="txlog").ref("ev_merge")
    assert t.current_version() == v1 + 1
    assert [r["v"] for r in t.snapshot(version=v1).collect()] == [10]
    assert [r["v"] for r in t.snapshot().collect()] == [11]


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
@pytest.mark.parametrize("strategy", ["append", "insert_overwrite", "microbatch"])
def test_full_refresh_all_strategies(spark, tmp_path_factory, strategy, fmt):
    """Every incremental strategy honors --full-refresh: the second run
    overwrites to exactly the current source state (no doubled appends,
    no surviving stale partitions, no batch windowing)."""
    reg = {"append": _mk_registry_append,
           "insert_overwrite": _mk_registry_iow,
           "microbatch": _mk_registry_micro}[strategy]()
    name = {"append": "ev_append", "insert_overwrite": "ev_part",
            "microbatch": "ev_daily"}[strategy]
    wh = str(tmp_path_factory.mktemp(f"wh_frs_{strategy}_{fmt}"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20)])
    fixed = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11)])
    src = {"events": initial}
    kw = dict(sources=lambda n: src[n], warehouse_dir=wh, table_format=fmt,
              now=_ts(f"{D3}T12:00"))
    Runner(spark, reg, incremental=False, **kw).ref(name)
    src["events"] = fixed
    out = _rows(Runner(spark, reg, incremental=True, full_refresh=True,
                       **kw).ref(name))
    assert out == sorted([(1, D1, _ts(f"{D1}T01:00"), 11)])


def test_model_full_refresh_config_overrides_flag(spark, tmp_path_factory):
    """dbt precedence: full_refresh=False protects a model from the
    run-level flag; full_refresh=True rebuilds even without it."""
    reg = ModelRegistry()

    @reg.model(name="protected", materialized="incremental",
               unique_key="id", full_refresh=False)
    def protected(ctx):
        return ctx.source("events")

    @reg.model(name="always_fresh", materialized="incremental",
               unique_key="id", full_refresh=True)
    def always_fresh(ctx):
        return ctx.source("events")

    wh = str(tmp_path_factory.mktemp("wh_fr_cfg"))
    initial = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 10),
                              (2, D2, _ts(f"{D2}T01:00"), 20)])
    shrunk = _events(spark, [(1, D1, _ts(f"{D1}T01:00"), 11)])
    src = {"events": initial}
    kw = dict(sources=lambda n: src[n], warehouse_dir=wh)
    r1 = Runner(spark, reg, incremental=False, **kw)
    r1.ref("protected"); r1.ref("always_fresh")
    src["events"] = shrunk
    # flag set: protected still MERGES (id=2 survives) — config wins
    r2 = Runner(spark, reg, incremental=True, full_refresh=True, **kw)
    assert len(_rows(r2.ref("protected"))) == 2
    # flag NOT set: always_fresh still rebuilds from scratch
    r3 = Runner(spark, reg, incremental=True, **kw)
    assert _rows(r3.ref("always_fresh")) == sorted(
        [(1, D1, _ts(f"{D1}T01:00"), 11)])


# ---------------------------------------------------------------------------
# dbt --empty interplay: dry-run artifacts must not poison incrementals
# ---------------------------------------------------------------------------

def _mk_registry_lookback():
    reg = ModelRegistry()

    @reg.model(
        name="ev_merge", materialized="incremental", unique_key="event_id",
    )
    def ev_merge(ctx):
        df = ctx.source("events")
        if ctx.is_incremental():
            # classic lookback: incremental runs only see recent rows
            df = df.filter(F.col("day") >= "1970-01-09")
        return df

    return reg


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_empty_dry_run_does_not_poison_incremental(spark, tmp_path, fmt):
    """The --empty trap this engine refuses to inherit: a dry run
    materializes a ZERO-ROW target, and if a later incremental run
    treated it as existing, the model's lookback branch would merge a
    few recent days into an empty base and silently drop all history.
    The dry-run marker makes has_existing() ignore the artifact, so the
    first real run takes the from-scratch branch and loads everything —
    on both backends."""
    src = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"),
                       (F.col("id") % 10).cast("int")),
            "yyyy-MM-dd",
        ).alias("day"),
    )
    wh = str(tmp_path / f"wh_{fmt}")
    kw = dict(sources=lambda n: src, warehouse_dir=wh, table_format=fmt)

    out = Runner(spark, _mk_registry_lookback(), empty=True, **kw).ref(
        "ev_merge"
    )
    assert out.count() == 0
    assert os.path.exists(os.path.join(wh, "ev_merge", "_dry_run"))

    # the real incremental run must NOT see the artifact as existing:
    # full history (all 10 days), not just the lookback window
    r2 = Runner(spark, _mk_registry_lookback(), incremental=True, **kw)
    got = r2.ref("ev_merge")
    assert got.count() == 100
    assert not os.path.exists(os.path.join(wh, "ev_merge", "_dry_run"))

    # and a SUBSEQUENT incremental run behaves normally (merge branch)
    r3 = Runner(spark, _mk_registry_lookback(), incremental=True, **kw)
    assert r3.ref("ev_merge").count() == 100
