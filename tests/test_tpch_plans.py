"""Physical-plan audits for the TPC-H-shape catalog (queries/tpch.py).

Same contract as test_plans.py: the scale claims in each query's
docstring must be visible in the formatted plan at any scale factor.
"""

from __future__ import annotations

import pytest

from furchild_spark.queries import QUERIES
from test_plans import plan_of

TPCH = sorted(n for n in QUERIES if n.startswith("tpch_"))


def test_tpch_catalog_complete():
    # 18 adapted shapes (all 22 TPC-H query shapes are covered; some
    # entries fold multiple shapes); a rename that drops one from the
    # catalog should fail here, not silently shrink coverage
    assert len(TPCH) == 18, sorted(TPCH)


@pytest.mark.parametrize("name", TPCH)
def test_no_cartesian_products(spark, name):
    """The only cross joins in this module carry 1-row broadcast scalar
    aggregates (Q11/Q15/Q22 thresholds) — those compile to
    BroadcastNestedLoopJoin over a single-row build, never a
    CartesianProduct."""
    assert "CartesianProduct" not in plan_of(spark, name)


def test_q6_filters_reach_the_scan(spark):
    """Q6 is the pushdown proof: every predicate is a scan-column range,
    so PushedFilters must carry the shipdate bounds and the scan schema
    must prune to the 4 referenced columns."""
    p = plan_of(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed
    schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert schema and "l_returnflag" not in schema[0], schema


@pytest.mark.parametrize(
    "name, op",
    [
        ("tpch_q4_priority_exists", "LeftSemi"),
        ("tpch_q18_large_orders", "Inner"),  # HAVING-IN fused into one agg+join
        ("tpch_q21_waiting_supplier", "LeftSemi"),
        ("tpch_q21_waiting_supplier", "LeftAnti"),
        ("tpch_q22_sales_opportunity", "LeftAnti"),
    ],
)
def test_subquery_shapes_compile_to_hash_joins(spark, name, op):
    p = plan_of(spark, name)
    assert op in p, f"{name}: expected {op} join in plan"


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q14_promo_revenue",
        "tpch_q19_disjunctive_revenue",
        "tpch_q2_min_cost_supplier",
    ],
)
def test_dims_broadcast(spark, name):
    """Star joins must broadcast their dimension sides — a shuffle join
    against part/supplier/nation re-exchanges the fact table per dim."""
    assert "BroadcastHashJoin" in plan_of(spark, name)


def test_q19_derives_pushable_disjuncts(spark):
    """Catalyst should extract the implied per-side disjunctions from the
    OR-of-ANDs and push the part-side one below the join (visible as a
    Filter containing p_brand on the build side, or brand pushed to the
    scan)."""
    p = plan_of(spark, "tpch_q19_disjunctive_revenue")
    # the fact side must at least carry the derived quantity envelope
    assert "l_quantity" in p
    assert "BroadcastHashJoin" in p


def test_q13_preserves_orderless_customers(spark):
    """The priority exclusion must live in the join condition (left outer),
    not a post-join WHERE — dropping it to a filter would erase the
    c_count=0 bucket."""
    p = plan_of(spark, "tpch_q13_custdist")
    assert "LeftOuter" in p
