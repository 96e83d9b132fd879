"""dbt ``incremental_predicates`` (dbt 1.4+): (col, op, value) triples
that bound the merge's TARGET-side scan to a window — the classic
100 TB incremental-merge optimization (only the recent slice of a huge
fact table ever key-matches; history is carried forward untouched).

Semantics pinned here (dbt's own contract):

- existing rows INSIDE the window key-match as usual;
- existing rows OUTSIDE the window (including NULL predicate columns)
  carry forward verbatim — even when an update carries their key (the
  user promises keys only live inside the window; violating it yields a
  duplicate, exactly as in dbt);
- txlog backend: whole FILES provably outside the window are never read
  — carried by reference in the next manifest (asserted on file paths);
- parquet backend: the out-window slice never enters the anti-join.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine import materialize as mat
from furchild_spark.engine.registry import ModelRegistry, Runner
from furchild_spark.engine.txlog import TxTable

_MAY = dt.datetime(2024, 5, 1)


def _rows(spark, month_lo, month_hi, bump=0.0):
    return (
        spark.range(month_lo * 100, month_hi * 100)
        .select(
            F.col("id").alias("k"),
            F.make_date(
                F.lit(2024), (F.col("id") / 100).cast("int"), F.lit(15)
            ).cast("timestamp").alias("d"),
            (F.col("id") * 1.0 + bump).alias("v"),
        )
    )


def test_parquet_merge_prunes_to_window(spark):
    wh = tempfile.mkdtemp(prefix="incr_pred_pq_")
    path = os.path.join(wh, "t")
    initial = _rows(spark, 1, 7)  # Jan..Jun
    mat.overwrite(spark, path, initial)
    # updates: May keys re-sent (+1000), plus key 150 (a MARCH key —
    # violates the window contract on purpose, to pin the semantics)
    upd = _rows(spark, 5, 6, bump=1000.0).unionByName(
        _rows(spark, 1, 7).filter(F.col("k") == 150).withColumn(
            "v", F.lit(-1.0)
        )
    )
    out = mat.merge_upsert(
        spark, path, upd, "k", predicates=(("d", ">=", _MAY),)
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got[510] == 1510.0          # in-window key updated
    assert got[110] == 110.0           # out-window untouched
    # the contract-violating key: old MARCH row survives AND the update
    # inserted -> duplicate, dbt's documented failure mode
    assert out.filter(F.col("k") == 150).count() == 2


def test_txlog_merge_carries_out_of_window_files_by_reference(spark):
    base = tempfile.mkdtemp(prefix="incr_pred_tx_")
    tx = TxTable(spark, os.path.join(base, "t"), cluster_by=("d",))
    tx.target_files = 6  # narrow per-file d ranges -> prunable
    tx.overwrite(_rows(spark, 1, 7))
    m1 = tx._read_manifest(tx.current_version())
    tx.merge(
        _rows(spark, 5, 6, bump=1000.0), ["k"],
        predicates=(("d", ">=", _MAY),),
    )
    m2 = tx._read_manifest(tx.current_version())
    carried = {e["path"] for e in m1["files"]} & {
        e["path"] for e in m2["files"]
    }
    assert carried, "no files carried by reference — pruning never happened"
    # carried files must all be provably out-of-window (timestamp
    # footer stats are stored as epoch micros)
    from furchild_spark.engine.txlog import _ts_micros

    for e in m2["files"]:
        if e["path"] in carried:
            lo, hi = e["stats"]["d"]
            assert hi < _ts_micros(_MAY), "an in-window file was carried"
    got = {r["k"]: r["v"] for r in tx.snapshot().collect()}
    assert got[510] == 1510.0 and got[110] == 110.0
    assert tx.count() == 600  # no row lost, no duplicate


def test_txlog_out_window_rows_in_straddling_files_protected(spark):
    base = tempfile.mkdtemp(prefix="incr_pred_tx2_")
    # ONE file holding the whole table: the file straddles the window,
    # so it is touched — but its out-window rows must still be
    # protected from key matching
    tx = TxTable(spark, os.path.join(base, "t"), stats_cols=("d",))
    tx.target_files = 1
    tx.overwrite(_rows(spark, 1, 7))
    upd = _rows(spark, 1, 7).filter(F.col("k") == 150).withColumn(
        "v", F.lit(-1.0)
    )
    tx.merge(upd, ["k"], predicates=(("d", ">=", _MAY),))
    assert tx.snapshot().filter(F.col("k") == 150).count() == 2


@pytest.mark.parametrize("fmt", ["parquet", "txlog"])
def test_runner_incremental_predicates_config(spark, fmt):
    wh = tempfile.mkdtemp(prefix=f"incr_pred_runner_{fmt}_")
    reg = ModelRegistry()
    state = {"bump": False}

    @reg.model(
        name="fct", materialized="incremental", unique_key="k",
        incremental_predicates=(("d", ">=", _MAY),),
    )
    def fct(ctx):
        df = ctx.source("src")
        if state["bump"]:
            df = df.filter(F.col("d") >= F.lit(_MAY)).withColumn(
                "v", F.col("v") + 1000.0
            )
        return df

    src = _rows(spark, 1, 7)
    kw = dict(sources=lambda n: src, warehouse_dir=wh, table_format=fmt)
    Runner(spark, reg, incremental=False, **kw).ref("fct")
    state["bump"] = True
    out = Runner(spark, reg, incremental=True, **kw).ref("fct")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got[510] == 1510.0 and got[110] == 110.0
    assert out.count() == 600


def test_registration_validates_predicates():
    reg = ModelRegistry()
    with pytest.raises(ValueError, match="incremental_predicates entries"):
        reg.model(
            name="bad", materialized="incremental", unique_key="k",
            incremental_predicates=(("d", "!=", 1),),
        )(lambda ctx: None)
    with pytest.raises(ValueError, match="only apply to the merge"):
        reg.model(
            name="bad2", materialized="incremental", unique_key="k",
            incremental_strategy="append",
            incremental_predicates=(("d", ">=", 1),),
        )(lambda ctx: None)
