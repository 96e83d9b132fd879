"""TPC-H-shape analytics catalog (the shapes not already covered).

The repo's relational catalog already exercises Q1 (``pricing_summary``),
Q3 (``shipping_priority_topk``), Q5 (``revenue_by_region``) and Q10
(``returned_items_by_customer``).  This module adds the remaining classic
decision-support shapes, adapted to the driver's TPC-H-lite schema (no
``partsupp``, no commit/receipt dates, no comment/phone columns — each
docstring names the adaptation).  They matter less as benchmark trivia
than as *operator shapes* the reference's SQL surface implies
(SURVEY.md §2.4-§2.6: correlated-subquery rewrites, EXISTS/NOT-EXISTS
semi/anti joins, scalar-aggregate thresholds, disjunctive predicate
pushdown, conditional aggregation):

- Q2  → per-group-min rewrite (groupBy min + equi join back, no window
  over the whole fact)
- Q4  → EXISTS    → ``left_semi`` join
- Q6  → conjunctive range scan (filter pushdown proof)
- Q7/Q8/Q9 → multi-way star joins with CASE volume splits
- Q11 → scalar-subquery threshold → broadcast single-row cross join
- Q12 → CASE-split conditional double count over a fact-dim join
- Q13 → left join with ON-clause filter + distribution-of-counts
- Q14 → conditional-aggregation percentage
- Q15 → max-revenue via scalar-aggregate join (ties preserved)
- Q16 → NOT IN exclusion anti join + per-group COUNT DISTINCT
- Q17 → correlated AVG → broadcast per-key aggregate join
- Q18 → HAVING-IN → ``left_semi`` join on an aggregated key set
- Q19 → OR-of-ANDs predicate pushed through a part join
- Q20 → nested correlated aggregates → two-level rollup + semi join
- Q21 → EXISTS + NOT EXISTS self-joins → ``left_semi`` + ``left_anti``
- Q22 → scalar AVG threshold + NOT EXISTS anti join

With Q1/Q3/Q5/Q10 in the relational module, all 22 decision-support
shapes are covered.

Scale notes (100 TB): every aggregate here is a map-side-combined hash
agg on the natural key; small sides (part, supplier, nation, the
single-row scalar aggregates, the per-key AVG tables bounded by |part|)
are broadcast explicitly; the only shuffles are on join/group keys the
data is already keyed by.  No windows over unbounded partitions, no
cartesian products (the single-row broadcast cross joins are O(n)).

Cross-engine parity follows the package rules (queries/__init__.py):
decimal sums, IEEE-deterministic double division, BIGINT counts,
explicit total orders wherever LIMIT appears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import money, one_money, query, table


# money-domain casts — single definition in catalog.py
_m = money
_one = one_money


_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
            "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")


def _rev():
    return _m("l_extendedprice") * (_one() - _m("l_discount"))


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated MIN subquery → per-group min + join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q2_min_cost_supplier",
    section="§2.4 correlated MIN subquery rewrite (TPC-H Q2 shape; no "
    "partsupp table — supply cost is the min observed unit price in "
    "lineitem per (part, supplier))",
    oracle=f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, CAST(p_partkey AS BIGINT) AS p_partkey,
       p_brand, cost.unit_cost AS unit_cost
FROM cost
JOIN best ON cost.l_partkey = best.l_partkey AND cost.unit_cost = best.min_cost
JOIN part     ON cost.l_partkey = p_partkey
JOIN supplier ON cost.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC, unit_cost ASC
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Classic correlated-scalar-subquery shape: ``cost = (SELECT MIN ...)``
    becomes an aggregate at (part, supplier) grain, a second aggregate at
    part grain, and an equi join back — both aggregates shuffle once on
    keys bounded by |part|×|supplier|, and everything after the fact-table
    rollup is broadcast-size.  Unit price is a per-row IEEE double divide
    (deterministic), so the min and the equality join back are exact."""
    l = table(spark, sf_dir, "lineitem")
    cost = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # rename the grouping key on the min side: `best` shares lineage with
    # `cost`, and a same-name equi condition on a self-derived join is
    # ambiguous under Spark's self-join analysis
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost")).select(
        F.col("l_partkey").alias("b_partkey"), "min_cost"
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        cost.join(best, (F.col("l_partkey") == F.col("b_partkey"))
                  & (F.col("unit_cost") == F.col("min_cost")))
        .drop("b_partkey", "min_cost")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_brand", "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                 F.asc("p_partkey"), F.asc("unit_cost"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (EXISTS → left_semi)
# ---------------------------------------------------------------------------

@query(
    "tpch_q4_priority_exists",
    section="§2.4 EXISTS subquery → left_semi join (TPC-H Q4 shape; no "
    "commit/receipt dates — the EXISTS predicate is a returned line)",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4_priority_exists(spark, sf_dir):
    """EXISTS compiles to a left-semi hash join on the order key: the
    probe side is already filtered to a 6-month slice (pushed to the
    parquet scan) and the build side prunes to returned lines before the
    shuffle, so both exchange inputs are pre-shrunk."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    ret = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(ret, o.o_orderkey == ret.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan-filter-agg; pushdown proof)
# ---------------------------------------------------------------------------

@query(
    "tpch_q6_forecast_revenue",
    section="§2.3 conjunctive range predicates pushed to the scan "
    "(TPC-H Q6 shape)",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """The canonical filter-pushdown query: every predicate is a range on
    a scanned column, so the whole WHERE lands in PushedFilters and the
    scan reads 4 columns of the 11.  At 100 TB with shipdate-partitioned
    data this prunes to one year of partitions before any task runs."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(_m("l_extendedprice") * _m("l_discount")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@query(
    "tpch_q7_volume_shipping",
    section="§2.4 dual-dimension join with symmetric pair predicate "
    "(TPC-H Q7 shape)",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Two independent dimension chains (supplier→nation, order→customer→
    nation) hang off the fact table; all dims broadcast, so the only
    shuffle is orders⋈lineitem on the order key plus the final rollup.
    The symmetric nation-pair OR is applied after both broadcasts — at
    scale the nation filter could be pushed into each broadcast side, but
    that changes semantics (the OR couples the two sides), so it stays a
    post-join residual exactly as written."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — market share (conditional aggregation over a star join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    section="§2.5 CASE-split volume ratio (TPC-H Q8 shape)",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(CAST(SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {_REV_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
GROUP BY year(o_orderdate)
""",
)
def tpch_q8_market_share(spark, sf_dir):
    """Market share of one supplier nation inside one customer region for
    one part type: numerator and denominator are the same rollup split by
    CASE, so a single pass computes both (no self-join).  The part filter
    broadcasts and prunes the fact rows before the orders shuffle."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).cast("double").alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (no partsupp: retail-cost proxy, shape intact)
# ---------------------------------------------------------------------------

@query(
    "tpch_q9_product_profit",
    section="§2.5 profit rollup by nation×year (TPC-H Q9 shape; supply "
    "cost proxied by 8% of p_retailprice — no partsupp table)",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM({_REV_SQL}
           - CAST(0.08 AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
""",
)
def tpch_q9_product_profit(spark, sf_dir):
    """Profit per supplier-nation per year for one product family.  The
    LIKE filter rides the broadcast part dim, so fact rows drop before
    the one real shuffle (orders join); the amount expression is all
    decimal arithmetic (exact, order-insensitive sums)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = _rev() - (
        F.lit(0.08).cast("decimal(18,2)") * _m("p_retailprice") * _m("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (scalar-subquery threshold → broadcast cross join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q11_important_parts",
    section="§2.4 scalar aggregate threshold (TPC-H Q11 shape; part value "
    "is lineitem revenue from suppliers of one nation)",
    oracle=f"""
WITH value AS (
  SELECT l_partkey, SUM({_REV_SQL}) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
  GROUP BY l_partkey
)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(part_value AS DOUBLE) AS part_value
FROM value
WHERE CAST(part_value AS DECIMAL(20,4))
        * (SELECT CAST(COUNT(*) AS DECIMAL(9,0)) FROM value)
      > (SELECT CAST(2 AS DECIMAL(2,0))
               * SUM(CAST(part_value AS DECIMAL(30,4))) FROM value)
""",
)
def tpch_q11_important_parts(spark, sf_dir):
    """The HAVING-against-global-total idiom: compute per-part value once,
    derive the global threshold as a 1-row aggregate, broadcast it back
    over the per-part table (O(n) cross join with a single-row build
    side — not a cartesian hazard).  The threshold is SCALE-FREE —
    ``part_value > 2 × average part value`` (TPC-H itself scales Q11's
    fraction by 1/SF; a fixed fraction returns empty at 10× the parts) —
    and the comparison is kept exact by clearing the denominator:
    ``count × part_value > 2 × total`` in DECIMAL end-to-end, so no
    division, no double cast, and the classification agrees with DuckDB
    bit-for-bit."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    value = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
               F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("part_value"))
    )
    # denominator-cleared decimal comparison (see docstring): every
    # operand stays in exact DECIMAL, so there is no division and no
    # decimal->double cast anywhere near the classification boundary
    threshold = value.agg(
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n_parts"),
        (
            F.lit(2).cast("decimal(2,0)")
            * F.sum(F.col("part_value").cast("decimal(30,4)"))
        ).alias("total4"),
    )
    return (
        value.crossJoin(F.broadcast(threshold))
        .filter(
            F.col("part_value").cast("decimal(20,4)") * F.col("n_parts")
            > F.col("total4")
        )
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (ON-clause filter + double rollup)
# ---------------------------------------------------------------------------

@query(
    "tpch_q13_custdist",
    section="§2.4 left join with ON-clause filter, distribution of counts "
    "(TPC-H Q13 shape; the comment NOT-LIKE filter becomes a priority "
    "exclusion)",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def tpch_q13_custdist(spark, sf_dir):
    """The subtle part is the filter's position: it belongs in the join's
    ON clause (customers with only urgent orders still appear, with
    count 0), not a WHERE (which would drop them).  COUNT(o_orderkey)
    counts non-null matches only, so no-order customers land in the
    c_count=0 bucket.  Two shuffles, both on keys with bounded fanout."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional-aggregation percentage)
# ---------------------------------------------------------------------------

@query(
    "tpch_q14_promo_revenue",
    section="§2.5 conditional aggregation percent (TPC-H Q14 shape)",
    oracle=f"""
SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01'
  AND l_shipdate < TIMESTAMP '1998-04-01'
""",
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """One month of fact rows (scan-pruned) against the broadcast part
    dim; numerator/denominator in a single CASE-split pass."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).cast("double").alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar MAX join, ties preserved)
# ---------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    section="§2.4 scalar MAX against a derived table (TPC-H Q15 shape)",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15's view + scalar-MAX: the per-supplier rollup is computed once,
    its 1-row max broadcasts back over it (ties all surface, per spec).
    Exact decimal revenue makes the = join reliable cross-engine."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG → per-key agg join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q17_small_quantity",
    section="§2.4 correlated AVG subquery rewrite (TPC-H Q17 shape)",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ap_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part    ON l_partkey = p_partkey
JOIN avg_qty ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#11' AND l_quantity < threshold
""",
)
def tpch_q17_small_quantity(spark, sf_dir):
    """``l_quantity < 0.2 * (SELECT AVG(..) WHERE same part)`` becomes a
    per-part aggregate joined back on the part key.  The aggregate table
    is bounded by |part| → broadcast; the threshold is computed as
    decimal-sum / count (both exact) so the double compare agrees with
    the oracle.  Unlike the textbook plan, the brand filter ALSO prunes
    the avg-side probe via the broadcast part dim — the per-part AVG must
    still see all lines of qualifying parts (not all parts), preserving
    semantics while skipping the rollup of 24/25ths of the fact table."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    brand_lines = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (
        brand_lines.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(_m("l_quantity")).cast("double")
                   / F.count(F.lit(1)).cast("double"))
            ).alias("threshold")
        )
    )
    return (
        brand_lines.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(_m("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING-IN → left_semi on aggregated keys)
# ---------------------------------------------------------------------------

@query(
    "tpch_q18_large_orders",
    section="§2.4 IN (GROUP BY .. HAVING) → left_semi join (TPC-H Q18 "
    "shape)",
    oracle="""
SELECT c_name, CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(120 AS DECIMAL(18,2))
)
GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
""",
)
def tpch_q18_large_orders(spark, sf_dir):
    """The HAVING-IN list is itself an aggregate over the fact table;
    rather than materializing it and semi-joining (two passes over
    lineitem), aggregate once per order, filter on the decimal sum, and
    join orders to the surviving keys — same result, one fact-table
    shuffle.  LIMIT rides a total order (price, date, key)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_m("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(120).cast("decimal(18,2)"))
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderdate", "o_totalprice",
            F.col("qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue (OR-of-ANDs predicate through a join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q19_disjunctive_revenue",
    section="§2.3 disjunctive predicate pushdown through an equi join "
    "(TPC-H Q19 shape; brand/size/quantity bands replace the "
    "container/shipmode columns this schema lacks)",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """The classic OR-of-ANDs: each disjunct couples a dimension
    attribute with a fact attribute, so neither side's filter is a pure
    pushdown — but Catalyst derives the *implied* disjunctions per side
    (brand IN (..) on part, quantity ∈ [1,30] on lineitem) and pushes
    those, leaving the coupled OR as a post-join residual on a broadcast
    join.  Written as one filter expression to let that inference fire."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#20")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# ---------------------------------------------------------------------------

@query(
    "tpch_q21_waiting_supplier",
    section="§2.4 EXISTS + NOT EXISTS self-joins → left_semi + left_anti "
    "(TPC-H Q21 shape; 'late' is a returned line on a finished order — "
    "no receipt/commit dates in this schema)",
    oracle="""
WITH l1 AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
""",
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """The hardest subquery shape in the suite: a semi join ('some other
    supplier touched this order') AND an anti join ('no other supplier's
    line was returned') against the same fact table.  Both compile to
    hash joins on the order key with non-equi residuals (l_suppkey <>),
    so the three lineitem branches co-partition on l_orderkey — one
    shuffle key reused three times, no cartesian anywhere."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    l1 = (
        l.filter(F.col("l_returnflag") == "R")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_suppkey")
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        l.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "left_semi")
        .join(l3, (F.col("l_orderkey") == l3.k3) & (F.col("l_suppkey") != l3.s3), "left_anti")
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar AVG + NOT EXISTS anti join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q22_sales_opportunity",
    section="§2.4 scalar AVG threshold + NOT EXISTS anti join (TPC-H Q22 "
    "shape; country code becomes the nation dim — no phone column; "
    "'never ordered' becomes 'no order since 2000' — every customer in "
    "this testdata has at least one order)",
    oracle="""
WITH candidates AS (
  SELECT c_custkey, c_acctbal, c_nationkey
  FROM customer
  WHERE c_nationkey IN (0, 3, 7, 11, 14, 19, 21)
)
SELECT n_name AS cntry, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM candidates
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE)
    FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 3, 7, 11, 14, 19, 21)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY n_name
""",
)
def tpch_q22_sales_opportunity(spark, sf_dir):
    """Rich-but-dormant customers per nation: a 1-row AVG broadcast sets
    the balance floor, a left_anti join against orders keeps only
    customers who never ordered, and the nation dim broadcasts for the
    final rollup.  AVG is decimal-sum/count (exact) on both engines."""
    nations = [0, 3, 7, 11, 14, 19, 21]
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_m("c_acctbal")).cast("double")
             / F.count(F.lit(1)).cast("double")).alias("floor_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("floor_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_m("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 — shipping delay vs priority (conditional aggregation over a join)
# ---------------------------------------------------------------------------

@query(
    "tpch_q12_late_priority",
    section="§2.5 conditional aggregation over a fact-dim join (TPC-H Q12 "
    "shape; no shipmode/commit/receipt dates — the group key is a derived "
    "late/on-time bucket: shipped more than 60 days after the order date)",
    oracle="""
SELECT delay_bucket,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) > 60
              THEN 'LATE' ELSE 'ONTIME' END AS delay_bucket,
         o_orderpriority
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
)
GROUP BY delay_bucket
""",
)
def tpch_q12_late_priority(spark, sf_dir):
    """Q12's operator shape is the CASE-split double count: one
    lineitem⋈orders equi join (shipdate slice pushed to the scan), then
    conditional sums bucketed by a derived column.  Two counts come out
    of ONE pass — the naive two-query formulation would scan the fact
    twice.  The join shuffles on the order key both sides are keyed by;
    the rollup output is 2 rows."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                ) > 60,
                F.lit("LATE"),
            ).otherwise(F.lit("ONTIME")).alias("delay_bucket"),
            "o_orderpriority",
        )
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 — supplier relationship counts (NOT IN exclusion + COUNT DISTINCT)
# ---------------------------------------------------------------------------

@query(
    "tpch_q16_supplier_counts",
    section="§2.4 NOT-IN exclusion anti join + COUNT DISTINCT per group "
    "(TPC-H Q16 shape; no partsupp — the supply relation is the distinct "
    "(part, supplier) pairs observed in lineitem; the complaint filter "
    "becomes a negative account balance)",
    oracle="""
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM supply
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35, 40, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_counts(spark, sf_dir):
    """Three classic sub-shapes in one query: the supply relation is a
    DISTINCT on the fact's (part, supplier) pair (one exchange, bounded
    by |part|x|supplier|); the NOT IN compiles to a broadcast left_anti
    join against the (tiny, null-free) excluded-supplier set; the part
    dim broadcasts with its filters applied before the build.  The final
    COUNT DISTINCT re-aggregates a set already distinct per (part,
    supplier), so Spark's two-phase distinct-agg adds no extra exchange
    beyond the group-key shuffle."""
    supply = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    excl = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 35, 40, 49)
    )
    return (
        supply.join(
            F.broadcast(excl), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess share of a part's flow (nested aggregates)
# ---------------------------------------------------------------------------

@query(
    "tpch_q20_excess_share",
    section="§2.4 nested correlated aggregates → two-level rollup + semi "
    "join (TPC-H Q20 shape; no partsupp availqty — a supplier qualifies "
    "when their 1997 shipped quantity of some red part exceeds half that "
    "part's total 1997 flow)",
    oracle="""
WITH demand AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
), total AS (
  SELECT l_partkey AS t_partkey, SUM(supp_qty) AS part_qty
  FROM demand GROUP BY l_partkey
), qualifying AS (
  SELECT DISTINCT d.l_suppkey
  FROM demand d
  JOIN total ON d.l_partkey = t_partkey
  JOIN part ON d.l_partkey = p_partkey
  WHERE p_name LIKE 'red%' AND d.supp_qty * 2 > part_qty
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM qualifying)
ORDER BY s_name
""",
)
def tpch_q20_excess_share(spark, sf_dir):
    """The deepest nesting in the suite: an aggregate at (part, supplier)
    grain compared against an aggregate of that aggregate at part grain —
    the correlated ``> 0.5 * SUM(...)`` becomes an equi join between the
    two rollup levels (both shuffles on keys bounded by the pair domain,
    the second reusing the first's output), a broadcast filter to red
    parts, and a left_semi back to the supplier dim.  Quantities sum as
    DECIMAL(18,2) and the half-share test is the integer-exact
    ``supp_qty * 2 > part_qty`` — no float division anywhere."""
    demand = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_m("l_quantity")).alias("supp_qty"))
    )
    total = demand.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    red = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    qualifying = (
        demand.join(total, F.col("l_partkey") == F.col("t_partkey"))
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy(F.asc("s_name"))
    )
