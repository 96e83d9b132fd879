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

    return mat.read_table(spark, table_path).select(*_COLS)
