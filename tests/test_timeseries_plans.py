"""Plan audits for the time-series catalog (queries/timeseries.py)."""

from __future__ import annotations

import pytest

from test_plans import plan_of

TS = [
    "gapfill_forward_fill",
    "funnel_conversion",
    "retention_matrix",
    "rolling_active_users",
]


@pytest.mark.parametrize("name", TS)
def test_no_cartesian_or_nested_loop(spark, name):
    """The sliding-distinct and gap-fill paths must stay keyed fan-outs —
    the O(days × user-days) range self-join lives only in the DuckDB
    oracle, never in the Spark plan."""
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


@pytest.mark.parametrize("name", ["gapfill_forward_fill", "funnel_conversion"])
def test_event_type_filter_pushed(spark, name):
    """Queries that slice one event type must push that predicate to the
    parquet scan."""
    p = plan_of(spark, name)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("event_type" in ln for ln in pushed), pushed


@pytest.mark.parametrize("name", ["retention_matrix", "rolling_active_users"])
def test_unused_event_columns_pruned(spark, name):
    """These touch only (user_id, ts) — the wide props/value columns must
    be pruned out of the scan schema."""
    p = plan_of(spark, name)
    schemas = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schemas and all(
        "props" not in ln and "value" not in ln for ln in schemas
    ), schemas


def test_gapfill_window_is_per_user(spark):
    """LOCF must partition by user — a global ORDER BY day would funnel
    the whole calendar through one task."""
    p = plan_of(spark, "gapfill_forward_fill")
    assert "Window" in p
    assert "SinglePartition" not in p


def test_rolling_dau_has_no_range_join(spark):
    """WAU comes from the explode fan-out + hash aggregate; the plan must
    contain a Generate (explode) and only equi joins."""
    p = plan_of(spark, "rolling_active_users")
    assert "Generate" in p
