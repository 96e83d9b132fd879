"""Relational operator catalog over the TPC-H-ish testdata.

Each query re-expresses one operator family from SURVEY.md §2 (the furchild
reference semantics) on the driver's tables, with a DuckDB oracle. Reference
citations point at the dbt model whose pattern is being exercised.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from furchild_spark.functions import shims
from furchild_spark.operators.asof import asof_join
from .catalog import money, one_money, query, table

@query(
    "set_ops_topk",
    section="§2.6 set ops + deterministic top-k (UNION ALL / INTERSECT / "
    "EXCEPT, final ORDER BY + LIMIT; reference has none — engine capability)",
    oracle="""
SELECT tag, o_custkey FROM (
  SELECT 'both' AS tag, o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  )
  UNION ALL
  SELECT 'urgent_only' AS tag, o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
  )
) ORDER BY tag ASC, o_custkey ASC LIMIT 100
""",
)
def set_ops_topk(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey").distinct()
    both = urgent.intersect(high).select(F.lit("both").alias("tag"), "o_custkey")
    only = urgent.subtract(high).select(F.lit("urgent_only").alias("tag"), "o_custkey")
    # LIMIT is deterministic because the ORDER BY is a total order
    return both.unionAll(only).orderBy(F.asc("tag"), F.asc("o_custkey")).limit(100)


# money domain: exact decimal sums, double at the boundary (see
# queries/__init__); single definition lives in catalog.py
_m = money
_one = one_money


# ---------------------------------------------------------------------------
# A1/P4/F3 — pricing summary (scan → filter → hash agg with partial combine)
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    section="A1 P4 F3 (ref fct_orders.sql:29-43 rollup idiom)",
    headline=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp")
    )
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_m("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_m("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_m("l_extendedprice") * (_one() - _m("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        (F.sum(_m("l_quantity")).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_qty"),
        (F.sum(_m("l_extendedprice")).cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# J4/S1 — star-schema join chain with broadcast dims
# ---------------------------------------------------------------------------

@query(
    "revenue_by_region",
    section="J4 S1 (ref fct_customers.sql:13-15 inner equi joins)",
    headline=True,
    oracle="""
SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, year(o_orderdate)
""",
)
def revenue_by_region(spark, sf_dir):
    """Pre-aggregate lineitem revenue per order BEFORE the join chain
    (~33% faster at sf0.1): the fact table shrinks 4× at its own grain
    with a map-side-combined shuffle it would have paid for the first
    join anyway, so every downstream join and the final aggregation move
    a fraction of the rows. Decimal partial sums keep revenue
    bit-identical; n_orders stays a countDistinct for exact oracle
    parity under hypothetical duplicate order keys (cheap at the
    reduced cardinality)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    pre = l.groupBy("l_orderkey").agg(
        F.sum(_m("l_extendedprice") * (_one() - _m("l_discount"))).alias("__rev")
    )
    return (
        pre.join(o, pre.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum("__rev").cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — order-level line rollup (ref fct_orders.sql:29-43)
# ---------------------------------------------------------------------------

@query(
    "order_line_rollup",
    section="A1 (ref fct_orders.sql:29-43)",
    oracle="""
SELECT l_orderkey,
  COUNT(*) AS n_lines,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_amount,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS net_amount,
  MIN(l_shipdate) AS first_ship,
  MAX(l_shipdate) AS last_ship
FROM lineitem GROUP BY l_orderkey
""",
)
def order_line_rollup(spark, sf_dir):
    """Two-phase distinct: pre-aggregate per (order, part), then roll up
    per order with n_parts = count of pre-rows. Beats the built-in
    countDistinct plan (~15% at sf0.1): Catalyst's Expand duplicates
    every input row across two aggregate groups to mix distinct and
    non-distinct aggregates, while the pre-aggregation shrinks the data
    BEFORE the second exchange — same two shuffles, strictly less moved.
    Decimal partial sums keep the values bit-identical to the single
    phase (decimal addition is exact and associative)."""
    l = table(spark, sf_dir, "lineitem")
    pre = l.groupBy("l_orderkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(_m("l_quantity")).alias("__q"),
        F.sum(_m("l_extendedprice")).alias("__g"),
        F.sum(_m("l_extendedprice") * (_one() - _m("l_discount"))).alias("__n"),
        F.min("l_shipdate").alias("__mn"),
        F.max("l_shipdate").alias("__mx"),
    )
    return pre.groupBy("l_orderkey").agg(
        F.sum("__c").cast("long").alias("n_lines"),
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("__q").cast("double").alias("sum_qty"),
        F.sum("__g").cast("double").alias("gross_amount"),
        F.sum("__n").cast("double").alias("net_amount"),
        F.min("__mn").alias("first_ship"),
        F.max("__mx").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# A2/J4 — customer KPIs (ref fct_customers.sql:19-36)
# ---------------------------------------------------------------------------

@query(
    "customer_kpis",
    section="A2 J4 (ref fct_customers.sql:19-36)",
    headline=True,
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
  CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS avg_order_value,
  CAST(MIN(o.o_orderdate) AS DATE) AS first_order,
  CAST(MAX(o.o_orderdate) AS DATE) AS last_order,
  CAST(date_diff('day', CAST(MAX(o.o_orderdate) AS DATE), DATE '2002-01-01') AS BIGINT)
    AS days_since_last
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
""",
)
def customer_kpis(spark, sf_dir):
    """Aggregate orders to customer grain BEFORE the dimension join
    (~27% faster at sf0.1): the aggregation's shuffle replaces the
    join's, and the join then moves one row per customer instead of one
    per order. Assumes c_custkey uniquely keys the dimension (true of
    the data and of any sane dim) — under duplicate dim rows the
    join-then-group form would double counts through the fan-out
    instead, which is no more correct."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pre = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.sum(_m("o_totalprice")).cast("double").alias("total_spend"),
        (F.sum(_m("o_totalprice")).cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avg_order_value"),
        F.to_date(F.min("o_orderdate")).alias("first_order"),
        F.to_date(F.max("o_orderdate")).alias("last_order"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date(F.max("o_orderdate")))
        .cast("long")
        .alias("days_since_last"),
    )
    return pre.join(c, pre.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "c_mktsegment", "n_orders", "total_spend",
        "avg_order_value", "first_order", "last_order", "days_since_last",
    )


# ---------------------------------------------------------------------------
# A4 — monthly revenue per customer (ref fct_customer_monthly_revenue.sql:12-19)
# ---------------------------------------------------------------------------

MONTHLY_SQL = """
SELECT o_custkey AS customer_id,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue,
  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey, date_trunc('month', o_orderdate)
"""


@query(
    "monthly_revenue",
    section="A4 F6 (ref fct_customer_monthly_revenue.sql:12-19)",
    oracle=MONTHLY_SQL,
)
def monthly_revenue(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.col("o_custkey").alias("customer_id"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
        )
        .agg(
            F.sum(_m("o_totalprice")).cast("double").alias("month_revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# A5/W3 — conditional LTV windows (ref customer_revenue_ltv.sql:6-25)
# ---------------------------------------------------------------------------

@query(
    "ltv_windows",
    section="A5 A4 (ref customer_revenue_ltv.sql:6-25)",
    headline=True,
    oracle="""
WITH monthly AS (
  SELECT o_custkey AS customer_id,
    CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS month_rev
  FROM orders GROUP BY 1, 2
), firsts AS (
  SELECT customer_id, MIN(order_month) AS cohort_month FROM monthly GROUP BY 1
), joined AS (
  SELECT m.customer_id, f.cohort_month, m.month_rev,
    (year(m.order_month) - year(f.cohort_month)) * 12
      + (month(m.order_month) - month(f.cohort_month)) AS months_since
  FROM monthly m JOIN firsts f USING (customer_id)
)
SELECT customer_id, cohort_month,
  CAST(COALESCE(SUM(CASE WHEN months_since BETWEEN 0 AND 5  THEN month_rev END), 0) AS DOUBLE) AS ltv6,
  CAST(COALESCE(SUM(CASE WHEN months_since BETWEEN 0 AND 11 THEN month_rev END), 0) AS DOUBLE) AS ltv12,
  CAST(COALESCE(SUM(CASE WHEN months_since BETWEEN 0 AND 23 THEN month_rev END), 0) AS DOUBLE) AS ltv24,
  CAST(SUM(month_rev) AS DOUBLE) AS ltv_total,
  COUNT(*) AS active_months
FROM joined GROUP BY customer_id, cohort_month
""",
)
def ltv_windows(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.col("o_custkey").alias("customer_id"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"),
    ).agg(F.sum(_m("o_totalprice")).alias("month_rev"))
    firsts = monthly.groupBy("customer_id").agg(
        F.min("order_month").alias("cohort_month")
    )
    joined = monthly.join(firsts, on="customer_id").withColumn(
        "months_since", shims.sf_datediff_month("cohort_month", "order_month")
    )
    zero = F.lit(0).cast("decimal(38,2)")

    def win(lo, hi):
        return F.coalesce(
            F.sum(F.when(F.col("months_since").between(lo, hi), F.col("month_rev"))),
            zero,
        ).cast("double")

    return joined.groupBy("customer_id", "cohort_month").agg(
        win(0, 5).alias("ltv6"),
        win(0, 11).alias("ltv12"),
        win(0, 23).alias("ltv24"),
        F.sum("month_rev").cast("double").alias("ltv_total"),
        F.count(F.lit(1)).alias("active_months"),
    )


# ---------------------------------------------------------------------------
# A6 — cohort stats with exact percentiles (ref cohort_revenue_ltv.sql:10-19)
# ---------------------------------------------------------------------------

@query(
    "cohort_percentiles",
    section="A6 (ref cohort_revenue_ltv.sql:10-19; exact percentile_cont, not approx)",
    headline=True,
    oracle="""
WITH cust AS (
  SELECT o_custkey AS customer_id,
    CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ltv
  FROM orders GROUP BY 1
)
SELECT cohort_month,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY ltv) AS DOUBLE) AS ltv_p50,
  CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY ltv) AS DOUBLE) AS ltv_p75
FROM cust GROUP BY cohort_month
""",
)
def cohort_percentiles(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort_month"),
        F.sum(_m("o_totalprice")).cast("double").alias("ltv"),
    )
    return cust.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.percentile("ltv", F.lit(0.5)).alias("ltv_p50"),
        F.percentile("ltv", F.lit(0.75)).alias("ltv_p75"),
    )


# ---------------------------------------------------------------------------
# A7/W3/O1 — first-touch channel LTV (ref first_channel_ltv.sql:9-26)
# ---------------------------------------------------------------------------

@query(
    "channel_ltv",
    section="A7 W3 O1 (ref first_channel_ltv.sql:9-26)",
    oracle="""
WITH firsts AS (
  SELECT o_custkey AS customer_id, o_orderpriority AS channel
  FROM orders
  QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1
), cust AS (
  SELECT o_custkey AS customer_id, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS ltv_dec
  FROM orders GROUP BY 1
)
SELECT f.channel,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(c.ltv_dec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ltv_avg,
  CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(c.ltv_dec AS DOUBLE)) AS DOUBLE) AS ltv_median
FROM firsts f JOIN cust c USING (customer_id)
GROUP BY f.channel
ORDER BY ltv_avg DESC
""",
)
def channel_ltv(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    firsts = (
        o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderpriority").alias("channel"),
        )
    )
    cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.sum(_m("o_totalprice")).alias("ltv_dec")
    )
    return (
        firsts.join(cust, on="customer_id")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("ltv_dec").cast("double") / F.count(F.lit(1)).cast("double")).alias("ltv_avg"),
            F.percentile(F.col("ltv_dec").cast("double"), F.lit(0.5)).alias("ltv_median"),
        )
        .orderBy(F.desc("ltv_avg"))
    )


# ---------------------------------------------------------------------------
# W1/P5/P6 — dedup keep-latest (ref stg_orders.sql:93-96, QUALIFY rewrite)
# ---------------------------------------------------------------------------

@query(
    "dedup_latest_event",
    section="W1 P5 P6 (ref stg_orders.sql:93-96 dedup-keep-latest ×10 sites)",
    headline=True,
    oracle="""
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
)
def dedup_latest_event(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return shims.dedup_keep_latest(
        e, "user_id", [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type", "value")


@query(
    "dedup_nulls_ordering",
    section="W1 null-ordering parity (ref stg_product_brands.sql:13 desc nulls last)",
    oracle="""
SELECT user_id, event_id, ts, event_type
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id
  ORDER BY (CASE WHEN event_type = 'error' THEN NULL ELSE ts END) DESC NULLS LAST,
           event_id DESC
) = 1
""",
)
def dedup_nulls_ordering(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    ord_ts = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("ts"))
    return shims.dedup_keep_latest(
        e, "user_id", [F.desc_nulls_last(ord_ts), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type")


# ---------------------------------------------------------------------------
# W2 — order sequence / is_first_order (ref dim_orders.sql:32-40)
# ---------------------------------------------------------------------------

@query(
    "order_sequence",
    section="W2 (ref dim_orders.sql:32-40,56-57)",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT)
    AS order_seq,
  (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) = 1)
    AS is_first_order
FROM orders
""",
)
def order_sequence(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        (F.row_number().over(w) == 1).alias("is_first_order"),
    )


# ---------------------------------------------------------------------------
# J6/W4 — as-of nearest-timestamp join (ref fct_orders.sql:115-141)
# ---------------------------------------------------------------------------

@query(
    "asof_click_attribution",
    section="J6 W4 (ref fct_orders.sql:115-141 as-of address join, generalized)",
    headline=True,
    oracle="""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), ranked AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id, c.click_ts,
    row_number() OVER (
      PARTITION BY p.purchase_id
      ORDER BY (CASE WHEN c.click_ts <= p.purchase_ts THEN 0 ELSE 1 END) ASC NULLS LAST,
               abs(epoch_us(c.click_ts) - epoch_us(p.purchase_ts)) ASC NULLS LAST,
               c.click_id ASC NULLS LAST
    ) AS rn
  FROM p LEFT JOIN c USING (user_id)
)
SELECT purchase_id, user_id, click_id,
  epoch_us(purchase_ts) - epoch_us(click_ts) AS gap_us
FROM ranked WHERE rn = 1
""",
)
def asof_click_attribution(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    matched = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_pk="purchase_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        tiebreak="click_id",
    )
    return matched.select(
        "purchase_id",
        "user_id",
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# J7 — anti join (ref tests/stg_packages_fk_shipment_id_to_shipments.sql:3-6)
# ---------------------------------------------------------------------------

@query(
    "anti_join_no_urgent",
    section="J7 (ref FK anti-join test pattern)",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderpriority = '1-URGENT' AND o.o_custkey = c.c_custkey
)
""",
)
def anti_join_no_urgent(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return c.join(
        urgent, c.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# A9 — dupe detection via group-having (ref tests/stg_product_brands__unique_brand_id.sql)
# ---------------------------------------------------------------------------

@query(
    "dupe_groups",
    section="A9 (ref unique-key dupe detection tests)",
    oracle="""
SELECT l_orderkey, l_partkey, COUNT(*) AS n
FROM lineitem GROUP BY l_orderkey, l_partkey HAVING COUNT(*) > 1
""",
)
def dupe_groups(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# A8 — select distinct (ref stg_delivery_slots.sql:20-22)
# ---------------------------------------------------------------------------

@query(
    "distinct_pairs",
    section="A8 (ref stg_delivery_slots.sql:20-22 parse-distinct-then-join-back)",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_pairs(spark, sf_dir):
    return table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# F1 — string hygiene (ref stg_addresses.sql:12-36, concat_ws/lpad/ilike)
# ---------------------------------------------------------------------------

@query(
    "string_hygiene",
    section="F1 (ref stg_addresses.sql:12-88 string idioms)",
    oracle="""
SELECT c_custkey,
  upper(c_name) AS name_upper,
  CAST(length(c_name) AS BIGINT) AS name_len,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
  concat_ws(' | ', c_name, c_mktsegment) AS display,
  coalesce(nullif(trim(c_mktsegment), ''), 'unknown') AS segment,
  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
  (c_name ILIKE 'customer%') AS is_customer,
  substring(c_name, 10, 8) AS key_digits,
  replace(c_name, 'Customer', 'Cust') AS short_name
FROM customer
""",
)
def string_hygiene(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.concat_ws(" | ", "c_name", "c_mktsegment").alias("display"),
        F.coalesce(shims.empty_to_null("c_mktsegment"), F.lit("unknown")).alias("segment"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.col("c_name").ilike("customer%").alias("is_customer"),
        F.substring("c_name", 10, 8).alias("key_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
    )


# ---------------------------------------------------------------------------
# F2 — order-id normalization regex chain (ref stg_transactions.sql:51-61)
# ---------------------------------------------------------------------------

@query(
    "normalize_order_id",
    section="F2 (ref stg_transactions.sql:51-61 == stg_orders.sql:68-76)",
    oracle="""
WITH raw AS (
  SELECT o_orderkey,
    CASE CAST(o_orderkey % 6 AS INT)
      WHEN 0 THEN 'SO-'    || CAST(o_orderkey AS VARCHAR)
      WHEN 1 THEN 'ORD-'   || CAST(o_orderkey AS VARCHAR)
      WHEN 2 THEN 'ORDER-' || CAST(o_orderkey AS VARCHAR)
      WHEN 3 THEN '#'      || CAST(o_orderkey AS VARCHAR)
      WHEN 4 THEN 'SO'     || CAST(o_orderkey AS VARCHAR) || '_A'
      ELSE CAST(o_orderkey AS VARCHAR) || ' X.9'
    END AS raw_id
  FROM orders
)
SELECT o_orderkey, raw_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(trim(raw_id), '^(ORDER-|ORDER|ORD-|ORD|SO-|SO|#)', ''),
      '[-_ ]', '', 'g'),
    '[^a-zA-Z0-9]', '', 'g') AS order_id_norm
FROM raw
""",
)
def normalize_order_id(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    mod = (F.col("o_orderkey") % 6).cast("int")
    raw = (
        F.when(mod == 0, F.concat(F.lit("SO-"), k))
        .when(mod == 1, F.concat(F.lit("ORD-"), k))
        .when(mod == 2, F.concat(F.lit("ORDER-"), k))
        .when(mod == 3, F.concat(F.lit("#"), k))
        .when(mod == 4, F.concat(F.lit("SO"), k, F.lit("_A")))
        .otherwise(F.concat(k, F.lit(" X.9")))
    )
    return o.select(
        "o_orderkey",
        raw.alias("raw_id"),
        shims.normalize_order_id(raw).alias("order_id_norm"),
    )


# ---------------------------------------------------------------------------
# F2 — regexp occurrence/count/full-match (ref stg_delivery_slots.sql:35-40,92,98)
# ---------------------------------------------------------------------------

@query(
    "regexp_tokens",
    section="F2 (ref stg_delivery_slots.sql:35-40 regexp_substr occ, :92 regexp_count, :98 regexp_like)",
    oracle="""
SELECT doc_id,
  regexp_extract_all(text, '[a-z]+')[2] AS second_word,
  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
  CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS BIGINT) AS n_the,
  regexp_full_match(text, '[a-z ]+') AS is_wordy
FROM documents
""",
)
def regexp_tokens(spark, sf_dir):
    # four regex scans per row over full document text — fan out the
    # under-split local scan (no-op on a well-partitioned input)
    from furchild_spark.operators.util import fanout

    d = fanout(table(spark, sf_dir, "documents"))
    words = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))
    return d.select(
        "doc_id",
        shims.regexp_substr_occ("text", "[a-z]+", 2).alias("second_word"),
        F.size(words).cast("long").alias("n_word_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\bthe\b"), F.lit(0)))
        .cast("long")
        .alias("n_the"),
        shims.sf_regexp_like("text", "[a-z ]+").alias("is_wordy"),
    )


# ---------------------------------------------------------------------------
# F4 — try_* casts (ref stg_customers.sql:36-37, stg_addresses.sql:35-39)
# ---------------------------------------------------------------------------

@query(
    "try_casts",
    section="F4 (ref try_to_date/try_to_decimal/try_cast float shims)",
    oracle="""
SELECT p_partkey,
  TRY_CAST(substring(p_type, 1, 3) AS DOUBLE) AS bad_double,
  TRY_CAST(CAST(p_size AS VARCHAR) || '.5' AS DOUBLE) AS good_double,
  TRY_CAST('2024-1-' || CAST(CAST(p_size % 28 AS INT) + 1 AS VARCHAR) AS DATE) AS good_date,
  TRY_CAST('2024-13-' || CAST(CAST(p_size % 28 AS INT) + 1 AS VARCHAR) AS DATE) AS bad_date,
  TRY_CAST('2024-01-02 03:04:0' || CAST(CAST(p_size % 10 AS INT) AS VARCHAR) AS TIMESTAMP) AS good_ts
FROM part
""",
)
def try_casts(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    day = ((F.col("p_size") % 28).cast("int") + 1).cast("string")
    sec = (F.col("p_size") % 10).cast("int").cast("string")
    return p.select(
        "p_partkey",
        F.substring("p_type", 1, 3).try_cast("double").alias("bad_double"),
        F.concat(F.col("p_size").cast("string"), F.lit(".5"))
        .try_cast("double")
        .alias("good_double"),
        shims.try_to_date(F.concat(F.lit("2024-1-"), day)).alias("good_date"),
        shims.try_to_date(F.concat(F.lit("2024-13-"), day)).alias("bad_date"),
        shims.try_to_timestamp_ntz(F.concat(F.lit("2024-01-02 03:04:0"), sec)).alias(
            "good_ts"
        ),
    )


# ---------------------------------------------------------------------------
# F5 — JSON extraction (ref stg_invoice_payments.sql:17-34 try_parse_json + path)
# ---------------------------------------------------------------------------

@query(
    "json_extract",
    section="F5 (ref stg_shipments.sql:7-25 VARIANT path casts)",
    oracle="""
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
FROM events GROUP BY event_type
""",
)
def json_extract(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("long").alias("n_null_k"),
        )
    )


# ---------------------------------------------------------------------------
# F6 — datediff family + convert_timezone (ref fct_customers.sql:30, stg_orders.sql:17-21)
# ---------------------------------------------------------------------------

@query(
    "datediff_family",
    section="F6 (ref sf_datediff day/month/second, convert_timezone Asia/Dubai)",
    oracle="""
SELECT o_custkey,
  MIN(o_orderdate) AS first_ts,
  MAX(o_orderdate) AS last_ts,
  CAST(date_diff('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE)) AS BIGINT)
    AS span_days,
  CAST((year(MAX(o_orderdate)) - year(MIN(o_orderdate))) * 12
        + (month(MAX(o_orderdate)) - month(MIN(o_orderdate))) AS BIGINT) AS span_months,
  epoch_us(MAX(o_orderdate)) - epoch_us(MIN(o_orderdate)) AS span_us,
  MIN(o_orderdate) - INTERVAL 4 HOUR AS utc_first
FROM orders GROUP BY o_custkey
""",
)
def datediff_family(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_ts"),
        F.max("o_orderdate").alias("last_ts"),
        shims.sf_datediff_day(F.to_date(F.min("o_orderdate")), F.to_date(F.max("o_orderdate")))
        .cast("long")
        .alias("span_days"),
        shims.sf_datediff_month(F.min("o_orderdate"), F.max("o_orderdate"))
        .cast("long")
        .alias("span_months"),
        (
            F.unix_micros(F.max("o_orderdate").cast("timestamp"))
            - F.unix_micros(F.min("o_orderdate").cast("timestamp"))
        ).alias("span_us"),
        # Asia/Dubai is UTC+4 year-round (no DST) → oracle can use a fixed interval
        shims.to_utc_from(F.min("o_orderdate"), "Asia/Dubai").alias("utc_first"),
    )


# ---------------------------------------------------------------------------
# F7 — surrogate-key md5 parity (ref dbt_utils.generate_surrogate_key)
# ---------------------------------------------------------------------------

@query(
    "surrogate_keys",
    section="F7 (ref stg_addresses.sql:103 macro == fct_orders.sql:163 inlined)",
    oracle="""
SELECT o_orderkey,
  md5(concat_ws('-',
    coalesce(CAST(o_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
    coalesce(CAST(o_custkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
    coalesce(nullif(o_orderstatus, 'O'), '_dbt_utils_surrogate_key_null_')
  )) AS order_sk
FROM orders
""",
)
def surrogate_keys(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        shims.surrogate_key(
            "o_orderkey",
            "o_custkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")),
        ).alias("order_sk"),
    )


# ---------------------------------------------------------------------------
# F3 — conditional / math / between / in (ref stg_orders.sql:134-140 etc.)
# ---------------------------------------------------------------------------

@query(
    "case_math",
    section="F3 (ref case/iff/least/greatest/round/between/in sites)",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
  least(greatest(l_discount, 0.02), 0.08) AS disc_clamped,
  l_extendedprice / l_quantity AS price_per_unit,
  (l_returnflag IN ('A', 'R')) AS is_flagged,
  (l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-12-31') AS ship_1998,
  CAST(round(CAST(l_tax AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS tax_pct
FROM lineitem
""",
)
def case_math(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.least(F.greatest(F.col("l_discount"), F.lit(0.02)), F.lit(0.08)).alias(
            "disc_clamped"
        ),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price_per_unit"),
        F.col("l_returnflag").isin("A", "R").alias("is_flagged"),
        F.col("l_shipdate")
        .between(
            F.lit("1998-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")
        )
        .alias("ship_1998"),
        F.round(_m("l_tax") * F.lit(100).cast("decimal(18,2)"), 0).cast("long").alias("tax_pct"),
    )


# ---------------------------------------------------------------------------
# S7 — source freshness check (ref models/staging/schema.yml:13-15)
# ---------------------------------------------------------------------------

@query(
    "freshness_check",
    section="S7 (ref source freshness warn>24h error>72h)",
    oracle="""
SELECT event_type,
  MAX(ts) AS last_seen,
  (epoch_us(TIMESTAMP '2024-01-08 00:00:00') - epoch_us(MAX(ts))) / 3600000000.0 AS lag_hours,
  CASE
    WHEN (epoch_us(TIMESTAMP '2024-01-08 00:00:00') - epoch_us(MAX(ts))) / 3600000000.0 > 72 THEN 'error'
    WHEN (epoch_us(TIMESTAMP '2024-01-08 00:00:00') - epoch_us(MAX(ts))) / 3600000000.0 > 24 THEN 'warn'
    ELSE 'fresh'
  END AS status
FROM events GROUP BY event_type
""",
)
def freshness_check(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    now = F.lit("2024-01-08 00:00:00").cast("timestamp")
    lag_h = (F.unix_micros(now) - F.unix_micros(F.max("ts"))) / F.lit(3600000000.0)
    return e.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"),
        lag_h.alias("lag_hours"),
        F.when(lag_h > 72, "error").when(lag_h > 24, "warn").otherwise("fresh").alias("status"),
    )


# ---------------------------------------------------------------------------
# J5 — the decimal(38,6)-style numeric domain (ref fct_order_items.sql:7-11)
# ---------------------------------------------------------------------------

@query(
    "decimal_domain",
    section="J5 (ref fct_order_items.sql:7-11 decimal const domain, re-cast per step)",
    oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS gross,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_amt,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
       + CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE)
    AS line_total,
  l_extendedprice / l_quantity AS unit_price,
  CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(100 AS DECIMAL(18,2)) AS DOUBLE) AS pct_discount
FROM lineitem
""",
)
def decimal_domain(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    gross = _m("l_extendedprice")
    net = gross * (_one() - _m("l_discount"))
    tax_amt = gross * _m("l_tax")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        gross.cast("double").alias("gross"),
        net.cast("double").alias("net"),
        tax_amt.cast("double").alias("tax_amt"),
        (net + tax_amt).cast("double").alias("line_total"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        (_m("l_discount") * F.lit(100).cast("decimal(18,2)")).cast("double").alias("pct_discount"),
    )


# ---------------------------------------------------------------------------
# shipping-priority top-k (the TPC-H Q3 shape: selective 3-way join + top-k)
# ---------------------------------------------------------------------------

@query(
    "shipping_priority_topk",
    section="J4 A1 O1 (selective fact⋈dims join + exact-decimal top-k; "
    "TPC-H Q3 shape — public benchmark pattern)",
    oracle="""
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS revenue,
  o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority_topk(spark, sf_dir):
    """Unshipped-order revenue ranking. Every filter is a scan-side
    predicate (PushedFilters on all three parquet scans — segment on
    customer, date on orders, date on lineitem), so the join chain moves
    only qualifying rows; revenue is an exact decimal sum; the top-k is
    a TakeOrderedAndProject (per-partition heap + driver merge of 10
    rows, never a global sort of the aggregate). Explicit date/orderkey
    tiebreaks make the cutoff deterministic cross-engine."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# returned-item losses by customer (the TPC-H Q10 shape)
# ---------------------------------------------------------------------------

@query(
    "returned_items_by_customer",
    section="J4 A2 O1 (return-flag fact slice ⋈ customer ⋈ nation, top-k; "
    "TPC-H Q10 shape — public benchmark pattern)",
    oracle="""
SELECT c_custkey, c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
    AS DOUBLE) AS revenue,
  c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def returned_items_by_customer(spark, sf_dir):
    """Revenue lost to returns per customer in a quarter. The return-flag
    and date filters reach the scans; nation broadcasts (tiny dim); the
    aggregate shuffles once on the customer grain; top-20 is a
    TakeOrderedAndProject with a custkey tiebreak."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ordered string aggregation (LISTAGG / string_agg surface)
# ---------------------------------------------------------------------------

@query(
    "recent_orders_list",
    section="§2.5 ordered aggregation (engine extra: LISTAGG/string_agg — "
    "per-customer top-3 most recent orders as an ordered list)",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
    ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC
    ) AS rnk
  FROM orders
)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rnk) AS recent_orders,
  COUNT(*) AS n_recent
FROM ranked WHERE rnk <= 3
GROUP BY o_custkey
""",
)
def recent_orders_list(spark, sf_dir):
    """Ordered aggregation is where engines silently diverge: Spark's
    ``collect_list`` order is partition-arrival nondeterministic, so the
    only reproducible form collects (sort_key, value) structs and sorts
    IN-ROW after the aggregate — ``array_sort`` on the struct's leading
    rank field, then project and join. One window pass (per-customer,
    bounded partitions) + one hash aggregate; the in-row sort is O(3)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 3)
    return (
        ranked.groupBy(F.col("o_custkey").cast("bigint").alias("o_custkey"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "o_orderkey"))
                    ),
                    lambda x: x["o_orderkey"].cast("string"),
                ),
                ",",
            ).alias("recent_orders"),
            F.count(F.lit(1)).alias("n_recent"),
        )
    )


# ---------------------------------------------------------------------------
# aggregate-form dedup: max_by / arg_max (no window, no sort)
# ---------------------------------------------------------------------------

@query(
    "argmax_latest_event",
    section="§2.5 W1 aggregate-form keep-latest (engine extra): max_by/"
    "arg_max replaces the window dedup with ONE hash aggregate",
    oracle="""
SELECT CAST(user_id AS BIGINT) AS user_id,
  arg_max(event_type, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0'))
    AS last_type,
  arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_value,
  MAX(ts) AS last_ts,
  COUNT(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def argmax_latest_event(spark, sf_dir):
    """``dedup_latest_event`` proves the QUALIFY/row_number form; this is
    the form you actually want at 100 TB: keep-latest as max_by inside a
    plain hash aggregate — map-side partial combine, no per-key sort, no
    window exchange, one shuffle carrying one row per (partition, key)
    instead of the full stream.  The composite (ts, event_id) tiebreak is
    encoded as a zero-padded string so DuckDB's scalar-keyed arg_max
    expresses the identical ordering (lexicographic = numeric for fixed
    width); event_id uniqueness makes the argmax single-valued, so both
    engines agree deterministically."""
    e = table(spark, sf_dir, "events")
    k = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        e.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.max_by("event_type", k).alias("last_type"),
            F.max_by("value", k).alias("last_value"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# snapshot reconciliation: FULL OUTER diff with null-safe comparison
# ---------------------------------------------------------------------------

@query(
    "snapshot_diff_reconcile",
    section="§2.4 full outer join + null-safe comparison (engine extra: "
    "the snapshot-reconciliation diff every pipeline migration runs)",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderdate < TIMESTAMP '1997-06-01'
), new AS (
  SELECT o_orderkey, o_orderstatus,
    CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 50.0
         ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-12-01'
)
SELECT
  CASE WHEN new.o_orderkey IS NULL THEN 'removed'
       WHEN old.o_orderkey IS NULL THEN 'added'
       WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
         OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus
       THEN 'changed'
       ELSE 'unchanged' END AS change_class,
  COUNT(*) AS n_rows
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
GROUP BY 1
""",
)
def snapshot_diff_reconcile(spark, sf_dir):
    """The migration-day question — "what exactly differs between the old
    pipeline's snapshot and the new one's?" — as a single full outer
    join on the key with NULL-SAFE column comparison (``IS DISTINCT
    FROM`` / ``eqNullSafe``: a NULL-to-value change must classify as
    'changed', which plain ``=`` would silently swallow).  One shuffle
    per side on the join key; the classification is a map-side CASE.
    The 'new' side's +50.0 double add is IEEE-deterministic, so both
    engines derive identical synthetic changes."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("old_key"),
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = o.filter(
        F.col("o_orderdate") >= F.lit("1996-12-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("new_key"),
        F.col("o_orderstatus").alias("new_status"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice") + 50.0)
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    diff = old.join(new, old.old_key == new.new_key, "full_outer")
    change_class = (
        F.when(F.col("new_key").isNull(), "removed")
        .when(F.col("old_key").isNull(), "added")
        .when(
            ~F.col("old_price").eqNullSafe(F.col("new_price"))
            | ~F.col("old_status").eqNullSafe(F.col("new_status")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return diff.groupBy(change_class.alias("change_class")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
