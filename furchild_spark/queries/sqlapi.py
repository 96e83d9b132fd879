"""SQL-front-end catalog: entries whose Spark side is `spark.sql(...)`
over registered temp views — proving the engine's ANSI SQL surface, not
just the DataFrame API.

The reference is a SQL system (dbt models compiled to Snowflake SQL), so
a migrating user's first question is "can I keep writing SQL?".  These
entries answer it the strongest way available: for ``sql_identical_text``
the *byte-identical* SQL string runs on Spark SQL and on DuckDB — one
dialect-neutral text, two engines, hash-equal results.  The other two
exercise SQL-only surface area the DataFrame API lacks or expresses
differently: arbitrary GROUPING SETS, and time-interval RANGE window
frames (a sliding 7-day sum that ROWS frames cannot express when event
spacing is irregular).

Scale notes: these compile to exactly the plans their DataFrame twins
would — Catalyst does not care which front end built the logical plan.
GROUPING SETS is one Expand + one shuffle (like ROLLUP/CUBE); the RANGE
frame sorts within user partitions only.
"""

from __future__ import annotations


from .catalog import query, table

# Registered once per (session, sf_dir); view names shadow the DuckDB view
# names so one SQL text resolves against both engines.
_SQL_TABLES = ["nation", "customer", "orders", "lineitem", "events"]


def _register_views(spark, sf_dir):
    for name in _SQL_TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


# One dialect-neutral text, two engines.  Everything here is ANSI: decimal
# casts for order-insensitive sums, explicit BIGINT rank, total-order
# window tiebreak.
_IDENTICAL_SQL = """
WITH rev AS (
  SELECT n_name,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
         AS DOUBLE) AS revenue,
    COUNT(*) AS n_lines
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  GROUP BY n_name
)
SELECT n_name, revenue, n_lines,
  CAST(RANK() OVER (ORDER BY revenue DESC, n_name ASC) AS BIGINT) AS rev_rank
FROM rev
"""


@query(
    "sql_identical_text",
    section="§2 SQL front end (engine extra): the byte-identical ANSI text "
    "runs on Spark SQL and DuckDB",
    oracle=_IDENTICAL_SQL,
)
def sql_identical_text(spark, sf_dir):
    """`spark.sql` over registered views, string shared with the oracle —
    tests/test_sqlapi.py asserts the two texts are the same object, so
    the entry can never drift into dialect-specific territory."""
    _register_views(spark, sf_dir)
    return spark.sql(_IDENTICAL_SQL)


# Also dialect-neutral, also shared byte-for-byte between the two engines
# (same identity-assertion treatment in tests/test_sqlapi.py — two copies
# that "agree today" would be a drift hazard, not a parity proof).
_GROUPING_SETS_SQL = """
SELECT
  COALESCE(l_returnflag, '(all)') AS returnflag,
  COALESCE(l_linestatus, '(all)') AS linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query(
    "grouping_sets_revenue",
    section="§2.5 arbitrary GROUPING SETS (engine extra; completes the "
    "ROLLUP/CUBE family — SQL-only surface, no DataFrame equivalent)",
    oracle=_GROUPING_SETS_SQL,
)
def grouping_sets_revenue(spark, sf_dir):
    """Disjoint grouping sets — the shapes ROLLUP/CUBE can't express
    ((A),(B),()) without computing (A,B) too.  Spark plans one Expand
    (3 replicas) + one shuffle with map-side partials; gid reconstructs
    which set each row came from via the standard GROUPING bit encoding."""
    _register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


_RANGE_INTERVAL_SQL = """
SELECT event_id, user_id, ts,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS trailing_7d_value,
  CAST(COUNT(*) OVER (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS trailing_7d_events
FROM events
WHERE event_type = 'purchase'
"""


@query(
    "range_interval_window",
    section="§2.6 time-interval RANGE frame (engine extra; a sliding "
    "7-day sum over irregular event times — not expressible as a ROWS "
    "frame)",
    oracle=_RANGE_INTERVAL_SQL,
)
def range_interval_window(spark, sf_dir):
    """RANGE frames bound by *value* distance (here: event-time interval),
    so each row's frame is every purchase in its trailing 7 days —
    irregular spacing means no ROWS offset can reproduce it.  Partitioned
    by user: no SinglePartition sort at any scale.  Frame membership ties
    (identical ts) include peers by RANGE semantics on both engines, so
    no tiebreak is needed for determinism."""
    _register_views(spark, sf_dir)
    return spark.sql(_RANGE_INTERVAL_SQL)


# WITH RECURSIVE, byte-identical on both engines (Spark 4 added recursive
# CTEs; DuckDB has always had them). The dbt-utils `date_spine` macro —
# which the reference's dim_date family would call — is exactly this
# shape: generate the calendar, left-join the fact grain, keep the gaps.
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(d) AS (
  SELECT DATE '1996-01-01'
  UNION ALL
  SELECT d + INTERVAL '1' DAY FROM spine WHERE d < DATE '1997-12-31'
)
SELECT spine.d AS cal_date,
  CAST(COALESCE(x.n, 0) AS BIGINT) AS n_orders
FROM spine LEFT JOIN (
  SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS n
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
) x ON spine.d = x.od
"""


@query(
    "recursive_date_spine",
    section="§2 SQL front end (engine extra): WITH RECURSIVE — the "
    "dbt_utils.date_spine pattern (calendar generation + gap-preserving "
    "left join) as one byte-identical recursive CTE on both engines",
    oracle=_RECURSIVE_SPINE_SQL,
)
def recursive_date_spine(spark, sf_dir):
    """Recursive CTE front end: a 731-day calendar spine unions one day
    per recursion step, then LEFT JOINs daily order counts so zero-order
    days survive (the property a groupBy alone can't give you). The
    recursion is driver-free and bounded by the WHERE guard; Spark plans
    each step as a UnionLoop over the previous iteration's frame. For a
    pure calendar at 100 TB you'd use ``sequence()`` + explode (map-only)
    — this entry exists to prove the recursive SQL surface a migrating
    dbt user reaches for first. Spark caps recursion depth at 100 by
    default; the 731-day spine needs the conf raised (runtime-settable,
    so the SQL text itself stays byte-identical across engines).

    The limit is read at EXECUTION time, not plan time (measured: a
    restore before collect() fails with RECURSION_LEVEL_LIMIT_EXCEEDED),
    so a lazy return can't scope the conf. The spine is 731 rows —
    localCheckpoint materializes it while the raise is in effect, then
    the prior limit is restored so the session conf never leaks into
    later catalog entries sharing the session."""
    _register_views(spark, sf_dir)
    key = "spark.sql.cteRecursionLevelLimit"
    prior = spark.conf.get(key)
    spark.conf.set(key, "2000")
    try:
        return spark.sql(_RECURSIVE_SPINE_SQL).localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, prior)


# LATERAL correlated subquery — per-group top-k as the SQL front end
# writes it. Byte-identical on both engines (Spark 3.2+/4 lateral
# subquery support; DuckDB LATERAL). The DataFrame twin of this shape is
# a ranked window (shipping_priority_topk etc.); LATERAL is the form a
# migrating SQL user already has in their models.
_LATERAL_TOPK_SQL = """
SELECT n_name, x.c_name, x.c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name ASC LIMIT 3
) x
"""


@query(
    "lateral_topk_per_group",
    section="§2.3 LATERAL correlated subquery (engine extra): per-nation "
    "top-3 customers — the correlated form Catalyst decorrelates into a "
    "ranked window, proven by the shared byte-identical text",
    oracle=_LATERAL_TOPK_SQL,
)
def lateral_topk_per_group(spark, sf_dir):
    """A correlated LIMIT subquery per outer row looks like O(|nation|)
    separate queries; Catalyst decorrelates it into one windowed
    rank-and-filter over customer partitioned by nationkey joined back
    to nation — the same single-exchange plan the DataFrame top-k
    entries build explicitly (no per-row re-execution, no cartesian).
    Determinism: the (c_acctbal DESC, c_name ASC) total order makes the
    LIMIT-3 cut unique on both engines."""
    _register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)
