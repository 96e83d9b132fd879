"""Property test: a TxTable subjected to a random op sequence always
agrees with a trivial in-memory model, and every historical version it
still retains replays exactly.

Hypothesis drives (op, key-range, value) sequences over a small keyspace
so collisions between overwrite/append/merge/compact/vacuum interleavings
are common; examples are kept small because each op is a real Spark
write. ``deadline=None`` — Spark job latency is not a property failure.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from furchild_spark.engine.txlog import TxTable

_KEYS = st.integers(min_value=0, max_value=9)
_VALS = st.sampled_from(["a", "b", "c"])

_OP = st.one_of(
    st.tuples(st.just("overwrite"), st.lists(_KEYS, min_size=0, max_size=5, unique=True), _VALS),
    st.tuples(st.just("append"), st.lists(_KEYS, min_size=1, max_size=4, unique=True), _VALS),
    st.tuples(st.just("merge"), st.lists(_KEYS, min_size=1, max_size=4, unique=True), _VALS),
    st.tuples(st.just("compact"), st.just([]), st.just("")),
    # restore target = 1 + (n mod current_version) resolved at run time
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=99).map(lambda n: [n]), st.just("")),
)


def _df(spark, keys, val):
    if not keys:
        return spark.createDataFrame([], "k bigint, v string")
    return spark.createDataFrame([Row(k=int(i), v=val) for i in keys])


@given(ops=st.lists(_OP, min_size=1, max_size=6))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_txtable_matches_model(spark, ops):
    base = tempfile.mkdtemp(prefix="txlog_prop_")
    t = TxTable(spark, os.path.join(base, "t"))
    model: dict[int, list[str]] = {}  # key -> multiset of values (append dups)
    snapshots: dict[int, dict] = {}  # version -> model copy at that version

    def flat(m):
        return sorted((k, v) for k, vs in m.items() for v in vs)

    for op, keys, val in ops:
        if op == "overwrite":
            t.overwrite(_df(spark, keys, val))
            model = {int(k): [val] for k in keys}
        elif op == "append":
            t.append(_df(spark, keys, val))
            for k in keys:
                model.setdefault(int(k), []).append(val)
        elif op == "merge":
            t.merge(_df(spark, keys, val), ["k"])
            for k in keys:
                model[int(k)] = [val]
        elif op == "compact":
            if t.compact() is None:
                continue  # nothing to compact — no new version
        elif op == "restore":
            cur = t.current_version()
            if cur == 0:
                continue
            target = 1 + (keys[0] % cur)
            t.restore(target)
            model = {k: list(v) for k, v in snapshots[target].items()}
        snapshots[t.current_version()] = {k: list(v) for k, v in model.items()}
        got = sorted((r["k"], r["v"]) for r in t.snapshot().collect())
        assert got == flat(model), f"after {op}: {got} != {flat(model)}"

    # time travel: every retained version replays its model exactly
    for v, m in snapshots.items():
        got = sorted((r["k"], r["v"]) for r in t.snapshot(version=v).collect())
        assert got == flat(m), f"version {v} replay mismatch"
