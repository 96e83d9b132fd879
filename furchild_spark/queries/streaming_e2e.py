"""Driver-checkable END-TO-END streaming entry (SURVEY §2.8).

The two existing streaming catalog entries (`streaming_window_rollup`,
`session_window_rollup`) verify the *window semantics* via batch twins;
this entry runs the real thing: a file-source micro-batch stream
(``trigger(availableNow=True)``, ``maxFilesPerTrigger=1``) through the full
ingest pipeline — watermarked delivery-dedup → ``foreachBatch`` incremental
merge (``streaming/ingest.py:run_ingest``) — into a parquet table, then
returns that final table for the driver's hash compare against a plain
batch oracle.

Determinism argument (why a streaming run can be hash-compared at all):

- The landing dir holds three files: events split into two halves by
  ``event_id``, plus a REDELIVERED copy of the first half (at-least-once
  delivery, the failure mode the watermark dedup exists for).
- ``event_id`` is globally unique, so whatever the micro-batch order or
  watermark state, the merge-on-key collapses every delivery of an event
  to one row; redelivered rows carry identical payloads, so even
  "duplicate slipped past evicted dedup state" converges to the same table.
- Events are time-ordered by ``event_id`` and the slice spans ≪ 7 days, so
  the watermark never drops a first delivery.

Final table ≡ the distinct event rows — the oracle is a plain SELECT.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from .catalog import query, table

_COLS = ["event_id", "user_id", "event_type", "ts", "value"]


@query(
    "streaming_ingest_e2e",
    section="§2.8 streaming end-to-end: availableNow micro-batches → "
    "watermarked dedup → foreachBatch merge → parquet sink",
    oracle="""
SELECT event_id, user_id, event_type, ts, value
FROM events
WHERE event_id < 2000
""",
)
def streaming_ingest_e2e(spark, sf_dir):
    from furchild_spark.engine import materialize as mat
    from furchild_spark.streaming.ingest import run_ingest

    base = tempfile.mkdtemp(prefix="furchild_stream_e2e_")
    landing, table_path, ckpt = f"{base}/landing", f"{base}/table", f"{base}/ckpt"

    src = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(*_COLS)
    )
    schema = src.schema

    # land two halves + a redelivery of the first half, one file each
    first = src.filter(F.col("event_id") < 1000)
    second = src.filter(F.col("event_id") >= 1000)
    for i, (name, df) in enumerate(
        [("b1", first), ("b2", second), ("b1_redelivered", first)]
    ):
        tmp = f"{base}/stage_{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        import glob as _glob
        import os as _os

        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        _os.makedirs(landing, exist_ok=True)
        shutil.copy(part, f"{landing}/{name}.parquet")

    # state partitions sized to the stream, not the session (see
    # stream_stream_join_e2e — same rationale, measured ~2× on this entry)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = run_ingest(
            spark,
            src_dir=landing,
            schema=schema,
            table_path=table_path,
            unique_key="event_id",
            ts_col="ts",
            checkpoint_dir=ckpt,
            watermark_delay="7 days",
            available_now=True,
            # one file per trigger so dedup state genuinely crosses micro-batches
            max_files_per_trigger=1,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    return mat.read_table(spark, table_path).select(*_COLS)


@query(
    "stream_stream_join_e2e",
    section="§2.8 streaming: stream-stream event-time range join "
    "(watermark-bounded state) run as real micro-batches",
    oracle="""
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
  v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
  p.value AS purchase_value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
  AND v.event_id < 4000 AND p.event_id < 4000
""",
)
def stream_stream_join_e2e(spark, sf_dir):
    """REAL stream-stream join: views and purchases land as separate
    file-source streams (two files each, one per micro-batch, so join
    state must buffer across triggers and across the two sides), joined
    on user within a 30-minute attribution window, appended to parquet
    with checkpointed exactly-once commits. Determinism: inner join with
    globally-unique ids emits each qualifying pair exactly once whatever
    the micro-batch interleaving; the 7-day watermark never evicts state
    within the fixture's time span, so the result ≡ the batch join the
    oracle runs.

    Citation: the reference has no streaming surface (SURVEY §2.8) —
    engine extra."""
    import glob as _glob
    import os as _os

    from furchild_spark.engine import materialize as mat
    from furchild_spark.streaming.ingest import stream_stream_attribution

    base = tempfile.mkdtemp(prefix="furchild_ssj_e2e_")
    out_path, ckpt = f"{base}/joined", f"{base}/ckpt"

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 4000)
    views = ev.filter(F.col("event_type") == "view").select(*_COLS)
    purchases = ev.filter(F.col("event_type") == "purchase").select(*_COLS)
    schema = views.schema

    def land(df, sub):
        d = f"{base}/{sub}"
        _os.makedirs(d, exist_ok=True)
        # two halves, one file each → state must survive trigger boundaries
        for name, half in [
            ("h1", df.filter(F.col("event_id") % 2 == 0)),
            ("h2", df.filter(F.col("event_id") % 2 == 1)),
        ]:
            tmp = f"{base}/stage_{sub}_{name}"
            half.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(f"{tmp}/part-*.parquet")[0]
            shutil.copy(part, f"{d}/{name}.parquet")
        return d

    v_dir, p_dir = land(views, "views"), land(purchases, "purchases")
    read = lambda d: (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    joined = stream_stream_attribution(read(v_dir), read(p_dir))
    # The state-store partition count is frozen into the checkpoint at
    # first trigger from spark.sql.shuffle.partitions. Size it to the
    # data, not the session default: a stream-stream join runs FOUR
    # stateful operators per micro-batch, so 32 near-empty state
    # partitions × ~5 micro-batches is pure task overhead at fixture
    # scale (measured ~40% of entry wall time). At 100 TB this number
    # comes from cluster cores × state volume, set once at stream start.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return mat.read_table(spark, out_path)


@query(
    "stateful_alerts_e2e",
    section="§2.8 streaming: CUSTOM stateful operator via "
    "applyInPandasWithState — per-user running totals + threshold alerts, "
    "keyed state carried across real micro-batches, full SQL oracle",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, ts,
    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS mic
  FROM events WHERE event_id < 2000
)
SELECT user_id, event_id,
  CAST(row_number() OVER w AS BIGINT) AS seq,
  CAST(SUM(mic) OVER w AS DOUBLE) / CAST(1000000 AS DOUBLE) AS cum_value,
  ((SUM(mic) OVER w) - mic < 500000000 AND SUM(mic) OVER w >= 500000000)
    AS crossed
FROM e
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts ASC, event_id ASC
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
)
""",
)
def stateful_alerts_e2e(spark, sf_dir):
    """The custom-stateful-operator proof (streaming/stateful.py): a
    REAL availableNow stream (one file per micro-batch) through
    applyInPandasWithState — per-user (seq, cum_micros) state crosses
    the batch boundary — into a parquet sink, returned for the driver's
    hash compare. Determinism: the two landed files partition the
    events by EVENT TIME (every batch-1 row precedes every batch-2 row
    within any user — file mtimes force the source order), rows are
    sorted inside each batch, and the state is exact integer micros —
    so the emitted stream equals the oracle's per-user running-window
    batch computation, making a genuinely stateful streaming run fully
    hash-checkable. Threshold 500.0 → ``crossed`` marks the first
    crossing event per user."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from furchild_spark.streaming.stateful import run_stateful_alerts

    base = _tempfile.mkdtemp(prefix="furchild_stateful_e2e_")
    landing, out_path, ckpt = f"{base}/landing", f"{base}/out", f"{base}/ckpt"

    cols = ["user_id", "event_id", "ts", "value"]
    src = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(*cols)
    )
    split = "2024-01-04"
    halves = [
        ("b1", src.filter(F.col("ts") < F.lit(split).cast("timestamp"))),
        ("b2", src.filter(F.col("ts") >= F.lit(split).cast("timestamp"))),
    ]
    _os.makedirs(landing, exist_ok=True)
    for i, (name, df) in enumerate(halves):
        tmp = f"{base}/stage_{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{landing}/{name}.parquet"
        _shutil.copy(part, dst)
        # strictly increasing mtimes pin the file-source batch order
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = run_stateful_alerts(
            spark,
            src_dir=landing,
            schema=src.schema,
            out_path=out_path,
            checkpoint_dir=ckpt,
            threshold=500.0,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    return spark.read.parquet(out_path).select(
        "user_id", "event_id", "seq", "cum_value", "crossed"
    )
