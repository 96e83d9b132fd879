"""Z-order clustering + metadata-only count for the txlog table format."""

from __future__ import annotations

from furchild_spark.engine.txlog import TxTable


def _grid(spark, n=4000):
    # two independent uniform dimensions — the layout-sensitivity fixture:
    # lexicographic clustering on (x, y) gives y no file locality at all
    return spark.range(n).selectExpr(
        "id", "CAST(id % 63 AS LONG) AS x", "CAST((id * 37) % 61 AS LONG) AS y"
    )


def _matching_files(t, version, where):
    m = t._read_manifest(version)
    return [e for e in m["files"] if t._file_may_match(e, where)]


def test_zorder_skips_on_every_cluster_column(spark, tmp_path):
    df = _grid(spark)

    linear = TxTable(spark, str(tmp_path / "linear"), cluster_by=("x", "y"))
    linear.target_files = 16
    linear.overwrite(df)

    z = TxTable(spark, str(tmp_path / "zorder"), cluster_by=("x", "y"))
    z.target_files = 16
    z.zorder = True
    z.overwrite(df)

    assert len(_matching_files(z, 1, [])) == 16  # both actually wrote 16
    assert len(_matching_files(linear, 1, [])) == 16

    # second-dimension filter: linear layout cannot skip (every file spans
    # ~the full y range); the Z-curve layout must prune a real fraction
    y_lin = len(_matching_files(linear, 1, [("y", "==", 30)]))
    y_z = len(_matching_files(z, 1, [("y", "==", 30)]))
    assert y_lin == 16, "fixture broken: linear layout unexpectedly has y locality"
    assert y_z <= 8, f"zorder should prune >=half the files on y, matched {y_z}"

    # first dimension still prunes too (zorder trades a little x locality)
    x_z = len(_matching_files(z, 1, [("x", "==", 10)]))
    assert x_z <= 8, f"zorder lost x locality entirely, matched {x_z}"


def test_zorder_snapshot_pruning_equals_filter(spark, tmp_path):
    df = _grid(spark, 2000)
    t = TxTable(spark, str(tmp_path / "zt"), cluster_by=("x", "y"))
    t.target_files = 9
    t.zorder = True
    t.overwrite(df)
    for where in ([("y", "==", 7)], [("x", ">=", 50)],
                  [("x", "<", 10), ("y", ">", 40)]):
        pruned = sorted(r.id for r in t.snapshot(where=where).collect())
        full = t.snapshot()
        for col, op, val in where:
            full = full.filter(f"{col} {'==' if op == '==' else op} {val}")
        assert pruned == sorted(r.id for r in full.collect()), where


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    df = _grid(spark, 1000)
    t = TxTable(spark, str(tmp_path / "zr"), cluster_by=("x", "y"))
    t.zorder = True
    t.overwrite(df)
    assert sorted(r.id for r in t.snapshot().collect()) == list(range(1000))


def test_manifest_count_is_metadata_only(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "c"))
    t.overwrite(spark.range(500).selectExpr("id", "id * 2 AS v"))
    assert t.count() == 500
    t.append(spark.range(500, 800).selectExpr("id", "id * 2 AS v"))
    assert t.count() == 800
    assert t.count(version=1) == 500
    # parity with an actual scan
    assert t.count() == t.snapshot().count()


def test_bloom_filters_skip_point_lookups(spark, tmp_path):
    """Random high-cardinality ids: every file's min/max range spans ~the
    whole domain (range skipping useless), but the per-file bloom prunes
    most files on a point lookup — and never prunes a file that actually
    holds the value (conservative)."""
    t = TxTable(spark, str(tmp_path / "b"), stats_cols=("rid",))
    t.bloom_cols = ("rid",)
    t.target_files = None
    # md5-scrambled ids: uniform across files whatever the write order
    df = spark.range(4000).selectExpr(
        "id", "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 14), 16, 10) "
        "AS LONG) AS rid"
    ).repartition(16)
    t.overwrite(df)

    m = t._read_manifest(1)
    assert len(m["files"]) == 16
    assert all("bloom" in e for e in m["files"])

    # a value that exists: its file must be kept, result identical to filter
    probe = df.limit(1).collect()[0]["rid"]
    kept = [e for e in m["files"] if t._file_may_match(e, [("rid", "==", probe)])]
    assert kept, "bloom pruned the file that holds the value"
    got = [r.id for r in t.snapshot(where=[("rid", "==", probe)]).collect()]
    want = [r.id for r in t.snapshot().filter(f"rid = {probe}").collect()]
    assert sorted(got) == sorted(want)

    # absent values: blooms must prune the large majority of files
    # (ranges alone prune none — each file spans ~the full rid domain)
    import statistics

    kept_counts = []
    for v in range(1000, 1020):
        preds = [("rid", "==", v)]  # tiny values never occur in md5-space
        kept_counts.append(
            sum(1 for e in m["files"] if t._file_may_match(e, preds))
        )
    assert statistics.mean(kept_counts) <= 4, kept_counts


def test_bloom_survives_merge_and_append(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "bm"))
    t.bloom_cols = ("k",)
    t.overwrite(spark.createDataFrame(
        [(i, i * 10) for i in range(100)], "k long, v long"))
    t.append(spark.createDataFrame([(200, 1)], "k long, v long"))
    t.merge(spark.createDataFrame([(5, 999)], "k long, v long"), ["k"])
    m = t._read_manifest(t.current_version())
    assert all("bloom" in e for e in m["files"])
    rows = {r.k: r.v for r in t.snapshot(where=[("k", "==", 5)]).collect()}
    assert rows == {5: 999}


def test_delete_where_sql_semantics_and_file_scope(spark, tmp_path):
    """DELETE removes only predicate-TRUE rows (NULL survives), carries
    provably-unmatching files untouched, and commits one new version."""
    t = TxTable(spark, str(tmp_path / "d"), cluster_by=("grp",))
    t.target_files = 4
    df = spark.createDataFrame(
        [(i, i % 4, (None if i == 17 else i * 10)) for i in range(40)],
        "id long, grp long, v long",
    )
    t.overwrite(df)
    before = {e["path"] for e in t._read_manifest(1)["files"]}

    t.delete([("grp", "==", 2), ("v", ">=", 100)])
    after = {e["path"] for e in t._read_manifest(2)["files"]}
    assert before & after, "delete rewrote files the stats prove untouched"

    rows = {r.id for r in t.snapshot().collect()}
    gone = {i for i in range(40) if i % 4 == 2 and i * 10 >= 100}
    assert rows == set(range(40)) - gone
    # NULL predicate row survives: id 17 (grp 1) was never in scope; add a
    # null INSIDE the scope to pin the semantics
    t2 = TxTable(spark, str(tmp_path / "d2"))
    t2.overwrite(spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "id long, v long"))
    t2.delete([("v", ">=", 10)])
    assert {r.id for r in t2.snapshot().collect()} == {1, 2}


def test_table_changes_cdf(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "cdf"), cluster_by=("k",))
    t.target_files = 4
    t.overwrite(spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"))
    t.append(spark.createDataFrame([(100, 1), (101, 2)], "k long, v long"))
    t.merge(spark.createDataFrame([(5, 999)], "k long, v long"), ["k"],
            scope_col="k")
    t.delete([("k", "==", 7)])

    # v1 → v2: pure append → inserts only
    ch = t.table_changes(1, 2).collect()
    assert {(r.change_type, r.k) for r in ch} == {
        ("insert", 100), ("insert", 101)}
    # v2 → v3: merge → delete+insert for the updated key only
    ch = {(r.change_type, r.k, r.v) for r in t.table_changes(2, 3).collect()}
    assert ch == {("delete", 5, 50), ("insert", 5, 999)}
    # v3 → v4 (delete): one row-level delete
    ch = {(r.change_type, r.k) for r in t.table_changes(3, 4).collect()}
    assert ch == {("delete", 7)}
    # full range composes
    ch = t.table_changes(1, 4)
    assert ch.filter("change_type = 'insert'").count() == 3


def test_check_constraints_abort_commit(spark, tmp_path):
    import pytest as _pytest

    from furchild_spark.engine.txlog import ConstraintViolationError

    t = TxTable(spark, str(tmp_path / "ck"))
    t.constraints = (("v_positive", "v > 0"), ("id_not_null", "id IS NOT NULL"))
    t.overwrite(spark.createDataFrame([(1, 5), (2, None)], "id long, v long"))
    # NULL passes (SQL CHECK semantics); table committed at v1
    assert t.current_version() == 1 and t.count() == 2

    with _pytest.raises(ConstraintViolationError, match="v_positive"):
        t.append(spark.createDataFrame([(3, -1)], "id long, v long"))
    # nothing committed, table unchanged and still readable
    assert t.current_version() == 1 and t.snapshot().count() == 2

    t.append(spark.createDataFrame([(3, 7)], "id long, v long"))
    assert t.count() == 3


def test_optimize_zorder_relayout(spark, tmp_path):
    """OPTIMIZE re-layout: switch a linearly-clustered table to Z-order —
    contents identical, second-dimension skipping appears."""
    df = _grid(spark)
    t = TxTable(spark, str(tmp_path / "opt"), cluster_by=("x", "y"))
    t.target_files = 16
    t.overwrite(df)
    assert len(_matching_files(t, 1, [("y", "==", 30)])) == 16

    t.zorder = True
    v = t.optimize()
    assert v == 2
    assert [h["op"] for h in t.history()][-1] == "optimize"
    assert sorted(r.id for r in t.snapshot().collect()) == sorted(
        r.id for r in df.collect())
    assert len(_matching_files(t, 2, [("y", "==", 30)])) <= 8
