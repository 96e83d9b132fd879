"""Incremental materialization: merge semantics, partition scoping,
crash-safety, and full-pipeline idempotency (verify gate 3)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine import materialize as mat
from furchild_spark.engine.registry import Runner
from furchild_spark.sources.fixtures import INGEST, write_fixture_parquet


# ---------------------------------------------------------------------------
# materializer unit tests
# ---------------------------------------------------------------------------

def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, part string, v int")


def test_merge_full_upsert(spark, tmp_path):
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1), ("b", "p1", 2)]))
    out = mat.merge_upsert(
        spark, path, _mk(spark, [("b", "p1", 20), ("c", "p2", 3)]), "k"
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": 1, "b": 20, "c": 3}
    # no leftover swap dirs
    assert not os.path.exists(path + "__staged")
    assert not os.path.exists(path + "__old")


def test_merge_full_upsert_duplicate_update_keys(spark, tmp_path):
    """r11 optimization guard: the anti-join side no longer runs an
    explicit distinct (left_anti dedups its right side by definition).
    Duplicate keys in `updates` must still (a) drop the matching
    existing row exactly once and (b) insert verbatim — dbt's merge
    contract leaves duplicate-source handling to the caller, so the
    union side is unchanged by construction."""
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1), ("b", "p1", 2)]))
    out = mat.merge_upsert(
        spark, path,
        _mk(spark, [("b", "p1", 20), ("b", "p1", 21), ("c", "p2", 3)]),
        "k",
    )
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == [("a", 1), ("b", 20), ("b", 21), ("c", 3)]


def test_merge_partition_scoped_touches_only_update_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    mat.overwrite(
        spark,
        path,
        _mk(spark, [("a", "p1", 1), ("b", "p2", 2), ("c", "p3", 3)]),
        partition_by=("part",),
    )
    p2_files = sorted(glob.glob(f"{path}/part=p2/*.parquet"))
    p2_mtimes = [os.path.getmtime(f) for f in p2_files]

    out = mat.merge_upsert(
        spark,
        path,
        _mk(spark, [("a", "p1", 10), ("d", "p3", 4)]),
        "k",
        partition_by=("part",),
    )
    got = {r["k"]: (r["part"], r["v"]) for r in out.collect()}
    assert got == {"a": ("p1", 10), "b": ("p2", 2), "c": ("p3", 3), "d": ("p3", 4)}
    # untouched partition p2 was not rewritten
    assert sorted(glob.glob(f"{path}/part=p2/*.parquet")) == p2_files
    assert [os.path.getmtime(f) for f in p2_files] == p2_mtimes


def test_merge_schema_evolution_append_new_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1)]))
    updates = spark.createDataFrame(
        [("b", "p1", 2, "new")], "k string, part string, v int, extra string"
    )
    out = mat.merge_upsert(spark, path, updates, "k")
    rows = {r["k"]: r.asDict() for r in out.collect()}
    assert rows["b"]["extra"] == "new"
    assert rows["a"]["extra"] is None  # old row null-filled


def test_crash_recovery_restores_old_dir(spark, tmp_path):
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1)]))
    # simulate a crash between the two commit renames: live gone, __old left
    os.rename(path, path + "__old")
    assert not os.path.exists(path)
    assert mat.parquet_exists(spark, path)  # triggers recover()
    assert os.path.exists(path)
    assert {r["k"] for r in mat.read_table(spark, path).collect()} == {"a"}


def test_stale_staged_dir_is_ignored(spark, tmp_path):
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1)]))
    os.makedirs(path + "__staged")  # crashed write leftover
    out = mat.merge_upsert(spark, path, _mk(spark, [("b", "p1", 2)]), "k")
    assert out.count() == 2
    assert not os.path.exists(path + "__staged")


# ---------------------------------------------------------------------------
# pipeline-level incremental runs
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bronze_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bronze_inc")
    write_fixture_parquet(str(d))
    return str(d)


def _runner(spark, bronze_dir, warehouse, incremental, now):
    from furchild_spark.models import registry

    return Runner(
        spark,
        registry,
        sources=lambda n: spark.read.parquet(f"{bronze_dir}/{n}.parquet"),
        warehouse_dir=warehouse,
        incremental=incremental,
        now=now,
    )


def test_incremental_rerun_is_idempotent(spark, bronze_dir, tmp_path_factory):
    """Second run (incremental, everything inside the lookback) must leave
    the fact tables hash-identical — the reference's MERGE is idempotent
    on unchanged input (SURVEY §7.4 item 7)."""
    warehouse = str(tmp_path_factory.mktemp("wh"))
    now = INGEST + dt.timedelta(days=1)
    targets = ["fct_order_items", "fct_orders"]

    r1 = _runner(spark, bronze_dir, warehouse, incremental=False, now=now)
    first = {
        t: sorted(r1.ref(t).drop("_calculated_at").collect()) for t in targets
    }
    r2 = _runner(spark, bronze_dir, warehouse, incremental=True, now=now)
    second = {
        t: sorted(r2.ref(t).drop("_calculated_at").collect()) for t in targets
    }
    for t in targets:
        assert first[t] == second[t], f"{t} changed on idempotent re-run"


def test_incremental_lookback_filters_input(spark, bronze_dir, tmp_path_factory):
    """With now far past the fixture ingest time, the 7-day lookback makes
    the incremental input empty → the table is unchanged (and NOT truncated
    — the failure mode of a broken merge)."""
    warehouse = str(tmp_path_factory.mktemp("wh2"))
    r1 = _runner(
        spark, bronze_dir, warehouse, incremental=False, now=INGEST + dt.timedelta(days=1)
    )
    before = r1.ref("fct_order_items").count()
    assert before > 0

    r2 = _runner(
        spark,
        bronze_dir,
        warehouse,
        incremental=True,
        now=INGEST + dt.timedelta(days=90),
    )
    after = r2.ref("fct_order_items").count()
    assert after == before


def test_incremental_upsert_applies_update(spark, bronze_dir, tmp_path_factory):
    """A re-ingested line (newer _ingested_at, new price) must update in
    place: same key count, new value visible, old rows retained."""
    warehouse = str(tmp_path_factory.mktemp("wh3"))
    now = INGEST + dt.timedelta(days=30)
    r1 = _runner(
        spark, bronze_dir, warehouse, incremental=False, now=INGEST + dt.timedelta(days=1)
    )
    base = r1.ref("fct_order_items")
    n_before = base.count()
    victim = base.select("order_item_id").orderBy("order_item_id").first()[0]

    # patched bronze: one line re-ingested now with price 999
    items = spark.read.parquet(f"{bronze_dir}/transaction_items.parquet")
    patched = items.withColumn(
        "PRICE",
        F.when(F.col("ID") == victim, F.lit(999.0)).otherwise(F.col("PRICE")),
    ).withColumn(
        "_AIRBYTE_EXTRACTED_AT",
        F.when(F.col("ID") == victim, F.lit(now)).otherwise(
            F.col("_AIRBYTE_EXTRACTED_AT")
        ),
    )

    def sources(name):
        if name == "transaction_items":
            return patched
        return spark.read.parquet(f"{bronze_dir}/{name}.parquet")

    from furchild_spark.models import registry

    r2 = Runner(
        spark, registry, sources=sources, warehouse_dir=warehouse,
        incremental=True, now=now,
    )
    after = r2.ref("fct_order_items")
    assert after.count() == n_before
    updated = after.filter(F.col("order_item_id") == victim).collect()
    assert len(updated) == 1
    assert float(updated[0]["unit_price"]) == 999.0


def test_compact_shrinks_file_count_preserves_rows(spark, tmp_path):
    """20 tiny files -> 1 after compaction; rows and values unchanged."""
    path = str(tmp_path / "frag")
    spark.range(0, 2000).withColumn("v", F.col("id") * 2).repartition(20).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "part-*"))) == 20

    n_files = mat.compact(spark, path, target_file_bytes=1 << 30)
    assert n_files == 1
    assert len(glob.glob(os.path.join(path, "part-*"))) == 1
    out = spark.read.parquet(path)
    assert out.count() == 2000
    assert out.agg(F.sum("v")).first()[0] == sum(2 * i for i in range(2000))
    # no leftover staging/old dirs
    assert not os.path.exists(path + "__staged") and not os.path.exists(path + "__old")


def test_compact_respects_target_size(spark, tmp_path):
    """A small target yields multiple output files (ceil(total/target))."""
    path = str(tmp_path / "frag2")
    spark.range(0, 50000).withColumn("pad", F.md5(F.col("id").cast("string"))).repartition(
        30
    ).write.parquet(path)
    n_files = mat.compact(spark, path, target_file_bytes=64 * 1024)
    assert 1 < n_files < 30
    assert spark.read.parquet(path).count() == 50000


# ---------------------------------------------------------------------------
# swap-commit safety (ADVICE r2: stale __old, rename returns, mid-swap reads)
# ---------------------------------------------------------------------------

def test_stale_old_dir_is_cleared_before_next_swap(spark, tmp_path):
    """Crash AFTER the second rename but BEFORE the __old delete leaves a
    stale __old next to a committed live dir; the next merge must clear it
    and commit normally (local-FS rename into an existing dir would nest,
    HDFS would return false)."""
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1)]))
    os.makedirs(path + "__old")
    with open(path + "__old/zombie.txt", "w") as f:
        f.write("leftover")
    out = mat.merge_upsert(spark, path, _mk(spark, [("b", "p1", 2)]), "k")
    assert {r["k"] for r in out.collect()} == {"a", "b"}
    assert not os.path.exists(path + "__old")
    assert not os.path.exists(path + "__staged")


def test_read_table_falls_back_to_old_mid_swap(spark, tmp_path):
    """A reader arriving in the window between the two commit renames
    (live missing, __old holding the previous version) must see the
    previous committed table, not a path-not-found error."""
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, _mk(spark, [("a", "p1", 1)]))
    os.rename(path, path + "__old")  # freeze the mid-swap state
    got = {r["k"]: r["v"] for r in mat.read_table(spark, path).collect()}
    assert got == {"a": 1}


def test_merge_keep_newer_ts_rejects_stale_update(spark, tmp_path):
    """Conditional upsert: an update older (by ts) than the materialized
    row must NOT clobber it; same-or-newer ts wins (idempotent
    redelivery)."""
    def mk(rows):
        return spark.createDataFrame(rows, "k string, ts timestamp, v int")

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    path = str(tmp_path / "t")
    mat.overwrite(spark, path, mk([("a", t1, 10), ("b", t0, 1)]))
    out = mat.merge_upsert(
        spark, path,
        mk([("a", t0, 99),   # stale — loses to the newer row already there
            ("b", t0, 2),    # tie — incoming wins (redelivery idempotency)
            ("c", t1, 3)]),  # new key — inserts
        "k", keep_newer_ts="ts",
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"a": 10, "b": 2, "c": 3}


def test_hinted_read_back_schema_matches_inference(spark, tmp_path):
    """overwrite/_merge_full/replace_slice read their table back with the
    just-written frame's schema as an explicit hint (skips the
    schema-inference job). The hint must be byte-equivalent to what
    inference would produce — names, order, types, nullability —
    including after a merge that widened columns via allowMissingColumns."""
    from pyspark.sql import functions as F

    from furchild_spark.engine import materialize as mat

    path = str(tmp_path / "t")
    base = spark.range(5).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.lit("x").alias("s"),
    )
    out = mat.overwrite(spark, path, base)
    inferred = spark.read.option("mergeSchema", "true").parquet(path)
    assert out.schema == inferred.schema
    assert [r.k for r in out.orderBy("k").collect()] == [0, 1, 2, 3, 4]

    # merge that ADDS a column: merged schema = union, hint must match
    updates = spark.range(3).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
        F.lit("y").alias("s"),
        F.lit(7).cast("long").alias("extra"),
    )
    out2 = mat.merge_upsert(spark, path, updates, "k")
    inferred2 = spark.read.option("mergeSchema", "true").parquet(path)
    assert out2.schema == inferred2.schema
    assert out2.count() == 5
