"""SQL-front-end guarantees (queries/sqlapi.py)."""

from __future__ import annotations

from furchild_spark.queries import QUERIES, sqlapi
from test_plans import plan_of


def test_identical_text_is_literally_shared():
    """The dialect-neutrality proof only holds if the Spark side and the
    oracle are the same string — not two strings that happen to agree
    today. All three entries share their text with the oracle."""
    assert QUERIES["sql_identical_text"].oracle is sqlapi._IDENTICAL_SQL
    assert QUERIES["grouping_sets_revenue"].oracle is sqlapi._GROUPING_SETS_SQL
    assert QUERIES["range_interval_window"].oracle is sqlapi._RANGE_INTERVAL_SQL
    assert QUERIES["recursive_date_spine"].oracle is sqlapi._RECURSIVE_SPINE_SQL
    assert QUERIES["lateral_topk_per_group"].oracle is sqlapi._LATERAL_TOPK_SQL


def test_grouping_sets_single_expand(spark):
    """GROUPING SETS must plan as one Expand + one shuffle, not a union of
    per-set scans."""
    p = plan_of(spark, "grouping_sets_revenue")
    assert p.count("Expand") >= 1
    assert "Union" not in p


def test_range_window_partitioned_by_user(spark):
    p = plan_of(spark, "range_interval_window")
    assert "SinglePartition" not in p


def test_sql_entries_no_cartesian(spark):
    for name in ("sql_identical_text", "grouping_sets_revenue",
                 "range_interval_window", "recursive_date_spine"):
        assert "CartesianProduct" not in plan_of(spark, name)


def test_lateral_topk_decorrelates_to_window(spark):
    """The correlated LIMIT subquery must decorrelate into one windowed
    rank over customer — not |nation| re-executions and not a cartesian."""
    p = plan_of(spark, "lateral_topk_per_group")
    assert "CartesianProduct" not in p
    assert "Window" in p


def test_recursive_spine_depth_and_gaps(spark):
    """731 calendar rows regardless of order sparsity — and the recursion
    conf raise is SCOPED: the entry materializes the spine while the
    limit is raised, then restores the prior value, so the session conf
    never leaks into later catalog entries (r5 ADVICE)."""
    from test_plans import SF

    key = "spark.sql.cteRecursionLevelLimit"
    prior = spark.conf.get(key)
    df = QUERIES["recursive_date_spine"].fn(spark, SF)
    assert spark.conf.get(key) == prior
    assert df.count() == 731
