"""Driver-checkable end-to-end entry for the transaction-log table format
(engine/txlog.py) — the snapshot-isolated upgrade of the staged-dir swap.

Like engine_e2e, the entry runs the REAL write machinery into a temp
warehouse and returns the final table read back from disk; the DuckDB
oracle reproduces the same end state relationally. Determinism: inputs
are date slices of the shared orders table, the update arithmetic
(+100.0 on a double) is IEEE-deterministic, and the driver sorts before
hashing so file/row order never matters.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from .catalog import query, table

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


@query(
    "txlog_merge_e2e",
    section=(
        "engine extra: transaction-log table (atomic commit, snapshot "
        "isolation, optimistic concurrency, stats-based file skipping, "
        "file-scoped merge; ref fct_orders.sql incremental MERGE semantics "
        "with the atomicity Snowflake provided there)"
    ),
    oracle="""
WITH init AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-03-01'
),
app AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-03-01'
    AND o_orderdate < TIMESTAMP '1997-06-01'
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice + 100.0 AS o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-05-01'
    AND o_orderdate < TIMESTAMP '1997-08-01'
)
SELECT * FROM upd
UNION ALL
SELECT * FROM (
  SELECT * FROM init UNION ALL SELECT * FROM app
) b WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
""",
)
def txlog_merge_e2e(spark, sf_dir):
    """The full transactional lifecycle on disk: overwrite clustered by
    month (v1), O(1) append of a disjoint slice (v2), a FILE-SCOPED merge
    whose update window OVERLAPS the appended slice — lookback rows are
    updates, newer rows inserts, the reference's incremental shape — that
    must carry pre-1997 files forward untouched (v3), an idempotent
    re-merge of the identical batch (v4), then vacuum of the superseded
    versions. Returns the final snapshot read from the committed
    manifest's file list, after asserting versions, carry-forward, and
    snapshot isolation behaved."""
    from furchild_spark.engine.txlog import TxTable

    # fixed, reused warehouse: each invocation replaces the previous
    # one instead of leaking a new mkdtemp per bench pass / driver run
    base = os.path.join(tempfile.gettempdir(), "furchild_txlog_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/orders_tx", cluster_by=("o_month",))
    t.target_files = 4  # multiple narrow-range files even at tiny sf

    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    o = table(spark, sf_dir, "orders").select(*_COLS, month)
    initial = o.filter(F.col("o_orderdate") < F.lit("1997-03-01").cast("timestamp"))
    appended = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    updates = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-05-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-08-01").cast("timestamp"))
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(100.0))

    assert t.overwrite(initial) == 1
    pinned_v1 = t.snapshot(version=1)  # must survive every later commit
    assert t.append(appended) == 2
    before = {e["path"] for e in t._read_manifest(2)["files"]}
    # o_month is functionally stable per o_orderkey (derived from the
    # row's own o_orderdate), so the file-scoped precondition holds
    assert t.merge(updates, ["o_orderkey"], scope_col="o_month") == 3
    after = {e["path"] for e in t._read_manifest(3)["files"]}
    carried = before & after
    assert carried, "scoped merge must carry untouched month files forward"
    assert t.merge(updates, ["o_orderkey"], scope_col="o_month") == 4
    v1_rows = pinned_v1.count()  # snapshot isolation: still version 1
    t.vacuum(retain_last=1, min_age_seconds=0)  # just-written fixture files
    assert [h["op"] for h in t.history()] == ["merge"]
    final = t.snapshot()
    assert v1_rows == initial.count()
    return final.select(*_COLS, "o_month")


@query(
    "orc_roundtrip_e2e",
    section="S1 source formats: ORC source scan (vectorized reader, pushdown parity with parquet)",
    oracle="""
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CAST(length(text) AS DECIMAL(18,0))) AS BIGINT) AS total_chars,
  CAST(MIN(doc_id) AS BIGINT) AS min_doc, CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
GROUP BY source
""",
)
def orc_roundtrip_e2e(spark, sf_dir):
    """documents → ORC on disk → vectorized ORC scan → rollup. The scan
    must behave exactly like the parquet source (same rows, same
    pushdown-friendly plan); the oracle aggregates the original table, so
    any loss or mangling in the ORC write/read path breaks the hash."""
    from furchild_spark.sources.readers import read_orc_source, write_orc

    base = os.path.join(tempfile.gettempdir(), "furchild_orc_e2e")
    shutil.rmtree(base, ignore_errors=True)
    path = f"{base}/documents_orc"
    write_orc(table(spark, sf_dir, "documents"), path)
    d = read_orc_source(spark, path)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text").cast("decimal(18,0)")).cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@query(
    "csv_jsonl_quarantine_e2e",
    section="S1 source formats: CSV + JSONL landing readers with declared "
    "schemas and PERMISSIVE corrupt-row quarantine (one bad line -> one "
    "quarantined row, never a lost batch)",
    oracle="""
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars,
  CAST(3 AS BIGINT) AS csv_corrupt, CAST(2 AS BIGINT) AS jsonl_corrupt
FROM documents WHERE doc_id < 50
""",
)
def csv_jsonl_quarantine_e2e(spark, sf_dir):
    """documents (doc_id < 50) written as CSV AND as JSON-lines, then read
    back through the schema-declared landing readers
    (sources/readers.read_csv_source / read_jsonl_source) with 3 corrupt
    CSV lines and 2 corrupt JSONL lines injected into the landing dirs.
    The clean sides inner-join on doc_id (both readers must reproduce
    every field bit-for-bit -- a type coercion or quoting bug breaks the
    hash); the quarantine counts ride along as broadcast scalars and must
    equal exactly the injected corruption (PERMISSIVE mode: a bad line
    becomes one _corrupt row, never an aborted read or a silent drop)."""
    import os as _os

    from furchild_spark.sources.readers import (
        quarantine, read_csv_source, read_jsonl_source,
    )

    base = _os.path.join(tempfile.gettempdir(), "furchild_csv_jsonl_e2e")
    shutil.rmtree(base, ignore_errors=True)
    csv_dir, jl_dir = f"{base}/csv", f"{base}/jsonl"
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    d.coalesce(1).write.option("header", "true").mode("overwrite").csv(csv_dir)
    d.coalesce(1).write.mode("overwrite").json(jl_dir)
    # corrupt lines (first line of the injected file is a header — with
    # header=True Spark skips line 1 of EVERY file): a doc_id that can't
    # cast, an over-length row, an unterminated quote / broken JSON
    with open(f"{csv_dir}/zz_corrupt.csv", "w") as fh:
        fh.write("doc_id,text,lang,source,n_chars\n")
        fh.write("abc,t,l,s,notanint\n")
        fh.write("1,2,3,4,5,6,7,8\n")
        fh.write('"unterminated,x,y,z,1\n')
    with open(f"{jl_dir}/zz_corrupt.json", "w") as fh:
        fh.write('{"doc_id": oops}\nnot json at all\n')
    c_clean, c_bad = quarantine(read_csv_source(spark, csv_dir, schema, header=True))
    j_clean, j_bad = quarantine(read_jsonl_source(spark, jl_dir, schema))
    counts = F.broadcast(
        c_bad.agg(F.count(F.lit(1)).alias("csv_corrupt")).crossJoin(
            j_bad.agg(F.count(F.lit(1)).alias("jsonl_corrupt"))
        )
    )
    c = c_clean.select("doc_id", "lang", "source", "n_chars")
    j = j_clean.select(F.col("doc_id").alias("jdoc"), F.col("text"))
    return (
        c.join(j, c["doc_id"] == j["jdoc"])
        .crossJoin(counts)
        .select(
            "doc_id", "lang", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("csv_corrupt").cast("long").alias("csv_corrupt"),
            F.col("jsonl_corrupt").cast("long").alias("jsonl_corrupt"),
        )
    )


@query(
    "txlog_runner_e2e",
    section=(
        "engine extra: Runner on the txlog backend (table_format='txlog' — "
        "dbt materializations on a transactional table format; the "
        "Delta/Iceberg-class upgrade of S3/S6 with atomic commits + time "
        "travel; ref fct_orders.sql:1-5 MERGE semantics)"
    ),
    oracle="""
WITH init AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice * 1.1 AS o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-12-01'
)
SELECT * FROM upd
UNION ALL
SELECT * FROM init
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
""",
)
def txlog_runner_e2e(spark, sf_dir):
    """The REGISTRY path on the transactional backend: an incremental
    model materialized through ``Runner(table_format="txlog")`` — full
    load commits v1, the overlapping-window merge commits v2 (file-scoped
    on the model's partition_by month), an identical re-run commits an
    idempotent v3. Asserts time travel (v1 still equals the initial load
    after the merges) before returning the committed current snapshot."""
    from furchild_spark.engine.registry import ModelRegistry, Runner
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_txlog_runner_e2e")
    shutil.rmtree(base, ignore_errors=True)

    reg = ModelRegistry()
    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")

    @reg.model(name="orders_inc", materialized="incremental",
               unique_key="o_orderkey", partition_by=("o_month",))
    def orders_inc(ctx):
        o = ctx.source("orders").select(*_COLS, month)
        if ctx.is_incremental():
            return o.filter(
                F.col("o_orderdate") >= F.lit("1996-12-01").cast("timestamp")
            ).withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
        return o.filter(
            F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
        )

    sources = {"orders": table(spark, sf_dir, "orders")}

    def runner(incremental):
        return Runner(spark, reg, sources=sources, warehouse_dir=base,
                      incremental=incremental, table_format="txlog",
                      tx_target_files=4)

    initial_n = runner(False).ref("orders_inc").count()      # v1
    runner(True).ref("orders_inc")                           # v2 merge
    final = runner(True).ref("orders_inc")                   # v3 idempotent

    t = TxTable(spark, f"{base}/orders_inc")
    assert [h["op"] for h in t.history()] == ["overwrite", "merge", "merge"]
    assert t.snapshot(version=1).count() == initial_n  # time travel intact
    assert final.count() == t.snapshot(version=2).count(), "merge not idempotent"
    return final.select(*_COLS, "o_month")


@query(
    "incremental_rollup_e2e",
    section=(
        "engine extra: incremental aggregate maintenance (hypertable-"
        "rollup pattern — reaggregate touched days, file-scoped merge)"
    ),
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate < TIMESTAMP '1997-09-01'
GROUP BY 1
""",
)
def incremental_rollup_e2e(spark, sf_dir):
    """Continuous-aggregate maintenance: a daily revenue rollup kept
    fresh by REAGGREGATING ONLY THE TOUCHED DAYS and merging them in —
    the TimescaleDB-continuous-aggregate / Druid-rollup pattern. v1
    builds days < 1997-06-01; a late batch covering [1997-05-15,
    1997-09-01) (overlapping the build, as real late data does)
    recomputes just those days and file-scope-merges on day, carrying
    every untouched day's files forward byte-identical. Cost per refresh
    is O(touched days), not O(history) — at 100 TB the difference
    between a minutes-refresh and a full rebuild. The final snapshot
    must equal the full groupBy the oracle runs."""
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_rollup_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/daily_rev", cluster_by=("day",))
    t.target_files = 4

    o = table(spark, sf_dir, "orders")

    def rollup(df):
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("revenue"),
        )

    t.overwrite(rollup(
        o.filter(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    ))
    touched = rollup(o.filter(
        (F.col("o_orderdate") >= F.lit("1997-05-15").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-09-01").cast("timestamp"))
    ))
    before = {e["path"] for e in t._read_manifest(1)["files"]}
    t.merge(touched, ["day"], scope_col="day")
    after = {e["path"] for e in t._read_manifest(2)["files"]}
    assert before & after, "rollup merge must carry untouched day files"
    return t.snapshot()


@query(
    "zorder_skipping_e2e",
    section=(
        "engine extra: Z-order clustering (multi-column file skipping — "
        "Delta OPTIMIZE ZORDER BY model) on the txlog format"
    ),
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_suppkey = 7
""",
)
def zorder_skipping_e2e(spark, sf_dir):
    """lineitem laid out along a Z-curve over (l_partkey, l_suppkey),
    then read back with a SECOND-dimension predicate — the case where
    lexicographic clustering skips nothing. Asserts the manifest pruned
    a real fraction of files before returning the (hash-compared) rows;
    correctness is pruning ≡ row-level filter by construction."""
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_zorder_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/li", cluster_by=("l_partkey", "l_suppkey"))
    t.target_files = 16
    t.zorder = True

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice"]
    t.overwrite(table(spark, sf_dir, "lineitem").select(*cols))

    where = [("l_suppkey", "==", 7)]
    kept = [e for e in t._read_manifest(1)["files"]
            if t._file_may_match(e, where)]
    total = len(t._read_manifest(1)["files"])
    assert len(kept) < total, (
        f"z-order layout skipped nothing ({len(kept)}/{total} files)"
    )
    return t.snapshot(where=where)


@query(
    "txlog_delete_e2e",
    section=(
        "engine extra: DELETE FROM + change data feed on the txlog format "
        "(file-scoped rewrite, GDPR erase path, version-diff CDF)"
    ),
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
  strftime(o_orderdate, '%Y-%m') AS o_month
FROM orders
WHERE NOT (o_orderdate >= TIMESTAMP '1997-03-01'
           AND o_orderdate < TIMESTAMP '1997-06-01')
""",
)
def txlog_delete_e2e(spark, sf_dir):
    """DELETE of a date slice: month-clustered files outside the window
    carry forward by reference (asserted); the change feed between the
    two versions contains exactly the deleted rows as 'delete' events
    and nothing else. Returns the post-delete snapshot for the hash
    compare; with vacuum the erased bytes physically leave the table —
    the right-to-be-forgotten lifecycle."""
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_txdelete_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/orders_del", cluster_by=("o_month",))
    t.target_files = 6

    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    o = table(spark, sf_dir, "orders").select(*_COLS, month)
    t.overwrite(o)
    n_total = t.count()

    lo, hi = "1997-03-01", "1997-06-01"
    before = {e["path"] for e in t._read_manifest(1)["files"]}
    t.delete([("o_month", ">=", "1997-03"), ("o_month", "<", "1997-06")])
    after = {e["path"] for e in t._read_manifest(2)["files"]}
    assert before & after, "delete rewrote provably-untouched month files"

    n_deleted = o.filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    ).count()
    cdf = t.table_changes(1, 2)
    assert cdf.filter("change_type = 'insert'").count() == 0
    assert cdf.filter("change_type = 'delete'").count() == n_deleted
    assert t.count() == n_total - n_deleted  # manifest count, no scan
    return t.snapshot()


@query(
    "join_ivm_e2e",
    section=(
        "engine extra: incremental JOIN maintenance (delta-join IVM — a "
        "materialized fact⋈dim view kept fresh from the fact table's "
        "change data feed, never recomputed from scratch)"
    ),
    oracle="""
WITH fact AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
    CASE WHEN o_orderdate >= TIMESTAMP '1996-12-15' THEN 'REPRICED'
         ELSE o_orderpriority END AS o_orderpriority,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-06-01'
    AND NOT (o_orderstatus = 'F'
             AND o_orderdate >= TIMESTAMP '1997-03-01'
             AND o_orderdate < TIMESTAMP '1997-06-01')
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       o_totalprice, o_orderpriority, o_month, c_mktsegment, c_name
FROM fact JOIN customer ON o_custkey = c_custkey
""",
)
def join_ivm_e2e(spark, sf_dir):
    """Materialized-view maintenance for a JOIN, the composition the
    txlog primitives exist for: with a static dim, ``Δ(F ⋈ D) = ΔF ⋈ D``
    exactly, so the view refreshes by joining only the fact table's
    change feed — never rescanning history.

    Lifecycle (all real commits against two txlog tables on disk):
      v1  fact := orders < 1997-01-01;  MV := fact ⋈ customer
      v2  late batch [1996-12-15, 1997-06-01) repriced and MERGEd into
          fact (insert + update mix)  →  MV merge of CDF-inserts ⋈ dim
      v3  DELETE from fact ('F' orders of [1997-03, 1997-06))
          →  MV partition-scoped refresh of the touched months only

    Asserted along the way: the CDF is strictly smaller than the fact
    table (maintenance cost is O(change)); untouched MV month files
    carry forward by reference across the scoped merge; and the final
    MV snapshot equals the oracle's from-scratch join — the IVM
    invariant."""
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_join_ivm_e2e")
    shutil.rmtree(base, ignore_errors=True)

    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    fcols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderdate", "o_orderpriority"]
    o = table(spark, sf_dir, "orders").select(*fcols, month)
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_name"
    )

    def enrich(fact_df):
        return (
            fact_df.join(F.broadcast(c), fact_df.o_custkey == c.c_custkey)
            .select(
                F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                F.col("o_custkey").cast("bigint").alias("o_custkey"),
                "o_totalprice", "o_orderpriority", "o_month",
                "c_mktsegment", "c_name",
            )
        )

    fact = TxTable(spark, f"{base}/fact", cluster_by=("o_month",))
    fact.target_files = 6
    mv = TxTable(spark, f"{base}/mv", cluster_by=("o_month",))
    mv.target_files = 6

    # v1: initial build — the ONLY full join this view ever runs
    fact.overwrite(o.filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ))
    mv.overwrite(enrich(fact.snapshot()))

    # v2: late repriced batch (overlaps the build → updates AND inserts)
    late = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-12-15").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    ).withColumn("o_orderpriority", F.lit("REPRICED"))
    fact.merge(late, ["o_orderkey"], scope_col="o_month")

    # the CDF is O(change) by the IVM invariant — materialize it ONCE:
    # the exceptAll diff otherwise recomputes for the count below, the
    # merge's scope-value collect, and the merge write (3 full diffs)
    cdf = fact.table_changes(1, 2).localCheckpoint()
    n_cdf = cdf.count()
    assert n_cdf < fact.count(), "CDF not smaller than the table itself"
    # updated rows surface as delete+insert with the same key: the
    # insert side alone is the complete per-key upsert payload
    delta = cdf.filter("change_type = 'insert'").drop("change_type")
    before = {e["path"] for e in mv._read_manifest(1)["files"]}
    mv.merge(enrich(delta), ["o_orderkey"], scope_col="o_month")
    after = {e["path"] for e in mv._read_manifest(2)["files"]}
    assert before & after, "IVM merge rewrote untouched month files"

    # v3: retraction — deletes cannot ride an upsert merge, so the MV
    # refreshes the TOUCHED MONTHS ONLY (partition-scoped refresh, the
    # standard IVM fallback for retractions): delete the affected month
    # range, re-enrich those months from the post-delete fact snapshot.
    # Cost is O(touched partitions); no per-key state reaches the driver.
    lo, hi = "1997-03", "1997-06"
    fact.delete([
        ("o_orderstatus", "==", "F"),
        ("o_month", ">=", lo), ("o_month", "<", hi),
    ])
    assert fact.table_changes(2, 3).filter(
        "change_type = 'insert'"
    ).count() == 0, "a pure DELETE produced CDF inserts"
    mv.delete([("o_month", ">=", lo), ("o_month", "<", hi)])
    mv.append(enrich(
        fact.snapshot(where=[("o_month", ">=", lo), ("o_month", "<", hi)])
    ))

    assert mv.count() == fact.count(), "MV row count drifted from fact"
    return mv.snapshot()


@query(
    "txlog_compact_e2e",
    section=(
        "engine extra: small-file compaction on the txlog format — the "
        "maintenance commit a streaming-append table needs (one commit "
        "dir per micro-batch accumulates thousands of KB-scale files); "
        "contents are bit-identical across the physical rewrite"
    ),
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
FROM orders WHERE o_orderkey % 5 < 4
""",
)
def txlog_compact_e2e(spark, sf_dir):
    """Simulate a streaming appender: four separate append commits (one
    small file each), then ``compact()`` folds the small files into one
    clustered file in a pure-physical commit. The proofs: the file count
    drops (asserted), readers of the PRE-compaction version still see
    the old layout (time travel), and the returned snapshot hash-matches
    the plain union of the four batches — compaction changed bytes on
    disk, never the logical table. At 100 TB this is the nightly
    maintenance job that keeps scan task counts sane under continuous
    ingestion."""
    from furchild_spark.engine.txlog import TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_txcompact_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/orders_cmp")

    o = table(spark, sf_dir, "orders").select(*_COLS)
    for r in range(4):  # four micro-batch-sized append commits
        t.append(o.filter(F.col("o_orderkey") % 5 == r).coalesce(1))
    v_before = t.current_version()
    n_files_before = len(t._read_manifest(v_before)["files"])
    assert n_files_before >= 4

    v_after = t.compact(small_file_bytes=64 * 1024 * 1024)
    assert v_after is not None and v_after > v_before
    n_files_after = len(t._read_manifest(v_after)["files"])
    assert n_files_after < n_files_before
    # the pre-compaction version remains readable with the OLD layout
    assert len(t._read_manifest(v_before)["files"]) == n_files_before
    assert t.snapshot(v_before).count() == t.count()
    return t.snapshot()


@query(
    "txlog_wap_e2e",
    section=(
        "engine extra: write-audit-publish — CHECK constraints enforced "
        "atomically at commit time; a violating batch aborts with ZERO "
        "trace in the table (snapshot isolation), then the corrected "
        "batch lands"
    ),
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
  CASE WHEN o_totalprice <= 0 THEN 1.0 ELSE o_totalprice END AS o_totalprice,
  o_orderdate
FROM orders
""",
)
def txlog_wap_e2e(spark, sf_dir):
    """The audit gate a production pipeline puts in front of every
    publish: the table carries CHECK constraints (positive price,
    non-null key), the good half of orders commits, a poisoned batch
    (prices negated) is REJECTED at commit — enforcement is fused into
    the write job via the Observation API, no second scan — and the
    table's version and row count are asserted unchanged after the
    failure (the aborted files stay uncommitted garbage for vacuum).
    The corrected batch then lands. The returned snapshot hash-matches
    good ∪ corrected — byte-level proof the poisoned write left
    nothing behind."""
    from furchild_spark.engine.txlog import ConstraintViolationError, TxTable

    base = os.path.join(tempfile.gettempdir(), "furchild_txwap_e2e")
    shutil.rmtree(base, ignore_errors=True)
    t = TxTable(spark, f"{base}/orders_wap")
    t.constraints = (
        ("positive_price", "o_totalprice > 0"),
        ("key_present", "o_orderkey IS NOT NULL"),
    )

    o = table(spark, sf_dir, "orders").select(*_COLS)
    good = o.filter(F.col("o_orderkey") % 2 == 0)
    bad = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    corrected = o.filter(F.col("o_orderkey") % 2 == 1).withColumn(
        "o_totalprice",
        F.when(F.col("o_totalprice") <= 0, F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )

    t.append(good)
    v_good, n_good = t.current_version(), t.count()
    try:
        t.append(bad)
        raise AssertionError("poisoned batch must violate positive_price")
    except ConstraintViolationError:
        pass
    assert t.current_version() == v_good, "failed write advanced the log"
    assert t.count() == n_good, "failed write leaked rows"
    t.append(corrected)
    return t.snapshot()
