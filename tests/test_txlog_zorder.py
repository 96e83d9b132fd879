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


def test_append_rejects_retyped_column(spark, tmp_path):
    """Review regression: a same-name, different-type column must be
    rejected at write time — committing it would leave the table
    unreadable for every later snapshot."""
    import pytest as _pytest

    t = TxTable(spark, str(tmp_path / "rt"))
    t.overwrite(spark.createDataFrame([(1, 10)], "id long, x long"))
    with _pytest.raises(ValueError, match="type change"):
        t.append(spark.createDataFrame([(2, "oops")], "id long, x string"))
    assert t.current_version() == 1
    assert t.snapshot().count() == 1  # table still readable


def test_bloom_bool_probe_never_silently_wrong(spark, tmp_path):
    """Review regression: a ==True probe on an int bloom column must not
    return a silently-wrong pruned answer. The bloom now canonicalizes
    bools through int (so file pruning agrees with int semantics), and
    Spark 4's ANSI comparison rejects the bool-vs-bigint residual filter
    loudly — either way, no silent empty result."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    t = TxTable(spark, str(tmp_path / "bb"))
    t.bloom_cols = ("status",)
    t.overwrite(spark.createDataFrame([(1, 1), (2, 0)], "id long, status long"))
    # int probe: bloom keeps the right file, result correct
    assert [r.id for r in t.snapshot(where=[("status", "==", 1)]).collect()] == [1]
    # bool probe: pruning no longer drops the file (canonicalized), and
    # the row-level filter fails loudly instead of returning 0 rows
    from furchild_spark.engine.txlog import _bloom_may_contain

    assert any(
        _bloom_may_contain(e["bloom"]["status"], True)
        for e in t._read_manifest(1)["files"]
    ), "bool probe pruned every file including the holder of 1s"
    with _pytest.raises(AnalysisException):
        t.snapshot(where=[("status", "==", True)]).collect()


def test_delete_nothing_is_a_noop_version(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "dn"), cluster_by=("day",))
    t.overwrite(spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, day string"))
    v = t.delete([("day", "==", "2099-12-31")])
    assert v == 1 and t.current_version() == 1  # no identical new version


def test_stream_scoped_merge_keeps_schema_when_no_files_touched(spark, tmp_path):
    """Review regression: a stream batch missing a table column that
    touches zero files must be rejected, not commit a narrowed schema."""
    import pytest as _pytest

    t = TxTable(spark, str(tmp_path / "ss"), cluster_by=("scope",))
    t.overwrite(spark.createDataFrame(
        [(1, "a", "payload1")], "id long, scope string, payload string"))
    bad = spark.createDataFrame([(9, "zzz")], "id long, scope string")
    with _pytest.raises(ValueError, match="schema mismatch"):
        t.write_stream_batch(bad, "app", 1, key_cols=["id"], scope_col="scope")
    # full batch with all columns still works
    good = spark.createDataFrame(
        [(9, "zzz", "p9")], "id long, scope string, payload string")
    t.write_stream_batch(good, "app", 1, key_cols=["id"], scope_col="scope")
    cols = set(t.snapshot().columns)
    assert cols == {"id", "scope", "payload"}
    assert t.snapshot().count() == 2


def test_pruning_equals_filter_property(spark, tmp_path):
    """Property: for ANY predicate combination over both layouts, file
    skipping (stats + bloom + zorder) must return exactly the rows a
    plain filter returns — conservative skipping can prune files, never
    rows."""
    import itertools

    df = _grid(spark, 1500)
    tables = []
    for name, zorder in [("pl", False), ("pz", True)]:
        t = TxTable(spark, str(tmp_path / name), cluster_by=("x", "y"))
        t.target_files = 8
        t.zorder = zorder
        t.bloom_cols = ("x",)
        t.overwrite(df)
        tables.append(t)

    ops = ["==", "<", "<=", ">", ">="]
    vals = [0, 7, 31, 62, 999]
    cases = list(itertools.product(["x", "y"], ops, vals))[::4]
    cases += [[("x", ">", 10), ("y", "<=", 20)],
              [("x", "==", 999)], [("y", ">=", 61), ("x", "<", 5)]]
    for case in cases:
        where = [case] if isinstance(case, tuple) else case
        for t in tables:
            pruned = sorted(r.id for r in t.snapshot(where=where).collect())
            full = t.snapshot()
            for col, op, val in where:
                full = full.filter(f"{col} {op if op != '==' else '='} {val}")
            want = sorted(r.id for r in full.collect())
            assert pruned == want, (where, t.path)
