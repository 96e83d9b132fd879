"""SCD2 snapshot materialization (engine/snapshot.py): dbt `snapshot`
semantics — timestamp + check strategies, interval chaining, idempotent
re-runs, Runner integration."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine import snapshot as S
from furchild_spark.engine.registry import ModelRegistry, Runner

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
T1 = dt.datetime(2024, 1, 2, 0, 0, 0)
T2 = dt.datetime(2024, 1, 3, 0, 0, 0)


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "id long, status string, updated_at timestamp"
    )


def _by_key(df):
    return {
        (r["id"], r["valid_from"], r["valid_to"]): r["status"]
        for r in df.collect()
    }


def test_timestamp_strategy_full_lifecycle(spark, tmp_path):
    path = str(tmp_path / "snap")
    v1 = _src(spark, [(1, "new", T0), (2, "new", T0)])
    out = S.snapshot_merge(spark, path, v1, "id", updated_at="updated_at")
    assert {r["valid_to"] for r in out.collect()} == {None}
    assert out.count() == 2

    # id=1 changes at T1, id=2 unchanged, id=3 appears
    v2 = _src(spark, [(1, "shipped", T1), (2, "new", T0), (3, "new", T1)])
    out = S.snapshot_merge(spark, path, v2, "id", updated_at="updated_at")
    got = _by_key(out)
    assert got == {
        (1, T0, T1): "new",        # closed: valid_to = replacement's valid_from
        (1, T1, None): "shipped",  # new open version
        (2, T0, None): "new",      # untouched
        (3, T1, None): "new",      # new key
    }

    # scd_id is deterministic (key + valid_from) and unique per version
    ids = [r["scd_id"] for r in out.collect()]
    assert len(set(ids)) == 4

    # re-running the identical source is a no-op (idempotent)
    out2 = S.snapshot_merge(spark, path, v2, "id", updated_at="updated_at")
    assert _by_key(out2) == got


def test_timestamp_strategy_ignores_stale_redelivery(spark, tmp_path):
    """A late file carrying an OLDER updated_at for a key must not create
    a version (strictly-newer predicate)."""
    path = str(tmp_path / "snap")
    S.snapshot_merge(spark, path, _src(spark, [(1, "b", T1)]), "id",
                     updated_at="updated_at")
    out = S.snapshot_merge(spark, path, _src(spark, [(1, "a", T0)]), "id",
                           updated_at="updated_at")
    assert _by_key(out) == {(1, T1, None): "b"}


def test_check_strategy_versions_on_value_change(spark, tmp_path):
    path = str(tmp_path / "snap")
    mk = lambda rows: spark.createDataFrame(rows, "id long, status string")  # noqa: E731
    S.snapshot_merge(spark, path, mk([(1, "a"), (2, None)]), "id",
                     strategy="check", check_cols=["status"], now=T0)
    # null-safe compare: 2's None → None is NOT a change; 1 changes
    out = S.snapshot_merge(spark, path, mk([(1, "b"), (2, None)]), "id",
                           strategy="check", check_cols=["status"], now=T1)
    got = {(r["id"], r["valid_from"], r["valid_to"]): r["status"]
           for r in out.collect()}
    assert got == {
        (1, T0, T1): "a",
        (1, T1, None): "b",
        (2, T0, None): None,
    }


def test_strategy_validation(spark, tmp_path):
    df = _src(spark, [(1, "x", T0)])
    with pytest.raises(ValueError, match="updated_at"):
        S.snapshot_merge(spark, str(tmp_path / "a"), df, "id")
    with pytest.raises(ValueError, match="check_cols"):
        S.snapshot_merge(spark, str(tmp_path / "b"), df, "id", strategy="check")
    with pytest.raises(ValueError, match="unknown"):
        S.snapshot_merge(spark, str(tmp_path / "c"), df, "id", strategy="scd6")
    stamped = df.withColumn("valid_to", F.lit(None).cast("timestamp"))
    with pytest.raises(ValueError, match="must not already carry"):
        S.snapshot_merge(spark, str(tmp_path / "d"), stamped, "id",
                         updated_at="updated_at")


def test_runner_snapshot_materialization(spark, tmp_path):
    """materialized='snapshot' through the Runner: first run initializes,
    a second Runner over mutated source data version-merges."""
    reg = ModelRegistry()

    @reg.model(name="dim_status_history", materialized="snapshot",
               unique_key="id", updated_at="updated_at")
    def dim_status_history(ctx):
        return ctx.source("raw")

    wh = str(tmp_path / "wh")
    r1 = Runner(spark, reg, sources={"raw": _src(spark, [(1, "new", T0)])},
                warehouse_dir=wh, now=T0)
    assert r1.run()["dim_status_history"].count() == 1

    r2 = Runner(spark, reg, sources={"raw": _src(spark, [(1, "done", T2)])},
                warehouse_dir=wh, now=T2)
    out = r2.run()["dim_status_history"]
    got = _by_key(out)
    assert got == {(1, T0, T2): "new", (1, T2, None): "done"}


def test_snapshot_rejects_null_and_duplicate_keys(spark, tmp_path):
    """Review regression: NULL or duplicate unique_key rows in one batch
    must fail loudly instead of corrupting the SCD2 chain."""
    import datetime as dt

    from furchild_spark.engine import snapshot as snap

    t0 = dt.datetime(2024, 1, 1)
    dup = spark.createDataFrame(
        [(1, "a", t0), (1, "b", t0)], "id long, v string, updated_at timestamp"
    )
    with pytest.raises(ValueError, match="dup_keys"):
        snap.snapshot_merge(spark, str(tmp_path / "s1"), dup, "id",
                            updated_at="updated_at")
    nullk = spark.createDataFrame(
        [(None, "a", t0)], "id long, v string, updated_at timestamp"
    )
    with pytest.raises(ValueError, match="null_keys"):
        snap.snapshot_merge(spark, str(tmp_path / "s2"), nullk, "id",
                            updated_at="updated_at")
    nullts = spark.createDataFrame(
        [(1, "a", None)], "id long, v string, updated_at timestamp"
    )
    with pytest.raises(ValueError, match="null_ts"):
        snap.snapshot_merge(spark, str(tmp_path / "s3"), nullts, "id",
                            updated_at="updated_at")


def test_snapshot_source_schema_evolution(spark, tmp_path):
    """Review regression: a source that GROWS a column must not crash the
    change-detection join; history rows read the new column as NULL."""
    import datetime as dt

    from furchild_spark.engine import snapshot as snap

    path = str(tmp_path / "ev")
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    snap.snapshot_merge(
        spark,
        path,
        spark.createDataFrame([(1, "gold", t0)],
                              "id long, tier string, updated_at timestamp"),
        "id",
        updated_at="updated_at",
    )
    out = snap.snapshot_merge(
        spark,
        path,
        spark.createDataFrame(
            [(1, "gold", t1, "x@y.z")],
            "id long, tier string, updated_at timestamp, email string",
        ),
        "id",
        updated_at="updated_at",
    )
    rows = sorted(out.collect(), key=lambda r: (r.valid_from,))
    assert len(rows) == 2
    assert rows[0].email is None and rows[0].valid_to == t1
    assert rows[1].email == "x@y.z" and rows[1].valid_to is None
