"""Custom stateful streaming operator: applyInPandasWithState.

The one Structured-Streaming surface the ingest pipeline (watermarked
dedup, foreachBatch merge, session windows, stream-stream join) does not
exercise: ARBITRARY per-key state carried across micro-batches. The
canonical use is running-total alerting — per-user cumulative value with
a threshold-crossing flag — which is also exactly the shape whose result
is INDEPENDENT of micro-batch slicing when (a) batches partition the
stream by event time (every row of batch N precedes every row of batch
N+1 within a key) and (b) rows within a batch are sorted before folding.
Under those two conditions the emitted stream equals a batch window
computation, so a full SQL oracle can hash-verify a genuinely stateful
streaming run.

Numeric discipline: state carries the cumulative value in EXACT integer
micros. Each incoming double is quantized through Python's Decimal on
the shortest repr with HALF_UP ties — bit-for-bit the double→DECIMAL(18,6)
cast semantics Spark and DuckDB share (see queries/__init__ parity rules)
— so the running sum is exact integer addition in every engine, and the
emitted double is one division of an exact integer by 10^6.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "user_id long, event_id long, seq long, cum_value double, crossed boolean"
)
_STATE_SCHEMA = "seq long, cum long"
_MICROS = Decimal("0.000001")


def _to_micros(v: float) -> int:
    """Exact integer micros of a double via the shared cast semantics:
    shortest decimal repr, HALF_UP at 6 dp."""
    return int(
        Decimal(repr(float(v))).quantize(_MICROS, rounding=ROUND_HALF_UP)
        * 1_000_000
    )


def make_alert_fn(ts_col: str, id_col: str, value_col: str, threshold: float):
    """Build the applyInPandasWithState function: per-key running
    (seq, cum_micros) state, one output row per event, ``crossed`` true
    on the transition where the cumulative total first meets
    ``threshold`` (re-armed if negative values ever pull it back)."""
    thr_micros = _to_micros(threshold)

    def fn(key, pdfs, state: GroupState):
        seq, cum = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return iter(())
        batch = batch.sort_values([ts_col, id_col])
        out = {
            "user_id": [], "event_id": [], "seq": [],
            "cum_value": [], "crossed": [],
        }
        uid = int(key[0])
        for eid, v in zip(batch[id_col], batch[value_col]):
            prev = cum
            cum += _to_micros(v)
            seq += 1
            out["user_id"].append(uid)
            out["event_id"].append(int(eid))
            out["seq"].append(seq)
            out["cum_value"].append(float(cum) / 1e6)
            out["crossed"].append(prev < thr_micros <= cum)
        state.update((seq, cum))
        return iter([pd.DataFrame(out)])

    return fn


def run_stateful_alerts(
    spark,
    src_dir: str,
    schema,
    out_path: str,
    checkpoint_dir: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    threshold: float = 500.0,
    max_files_per_trigger: int = 1,
):
    """availableNow micro-batch stream → applyInPandasWithState running
    totals → parquet append sink. State lives in the checkpointed state
    store partitioned by the user key — at scale this is the standard
    distributed keyed-state layout (RocksDB-backed on a real cluster),
    never driver memory."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    alerts = src.groupBy(user_col).applyInPandasWithState(
        make_alert_fn(ts_col, id_col, value_col, threshold),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        alerts.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
