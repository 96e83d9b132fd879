"""CORRECTNESS entries for the furchild staging/mart models themselves.

Each entry runs a registered model through a view-only Runner over the
committed bronze fixtures (fixtures/bronze/*.parquet, generated
deterministically by furchild_spark.sources.fixtures) and pairs it with a
DuckDB port of the *reference* SQL reading the same parquet files — so the
driver's hash compare validates the model logic end to end, not just the
operator shims.

Output discipline (same as the catalog): money decimals cast to DOUBLE,
ints to BIGINT, no raw decimal columns. Decimal math parity notes:

- decimal÷100 is emulated in SQL as ×0.01 (an exact scale shift) — DuckDB
  decimal division returns DOUBLE, Spark rounds to the result scale;
  the multiplication form is exact in both.
- p/1.05 (the VAT back-out): Spark divides decimals exactly then rounds
  half-up to scale 6; the oracle rounds the double quotient to 6. For
  2-decimal prices the true quotient is never closer than ~5e-8 to a
  6-dp rounding boundary (denominator 21 argument), so both round the
  same way.
- every Spark `a*b` over decimal(38,6) rounds the exact product to scale
  6 once; the oracle multiplies at (18,6)→(36,12) exactly and casts to
  (38,6) — also a single half-up rounding of the exact product.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from .catalog import query

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "bronze",
)
FROZEN_NOW = dt.datetime(2024, 6, 2, 0, 0, 0)


_RUNNERS: dict[int, object] = {}


def _runner(spark):
    """One view-only Runner per SparkSession, shared by every model__*
    entry. The Runner memoizes ref() DataFrames — lazy, immutable plans —
    so the expensive part of these entries (py4j plan construction +
    analysis of the deep staging subtrees, ~1-3s for the stg_orders chain)
    is paid once per session instead of once per entry. No execution state
    is shared: warehouse_dir=None means nothing is ever written, and
    cache_refs is OFF (persisting wide staging models blocks column pruning
    below the cache boundary; at fixture scale recompute is ~even with the
    materialization), so spark.catalog.clearCache() between bench passes
    cannot invalidate anything here."""
    from furchild_spark.engine.registry import Runner
    from furchild_spark.models import registry

    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    if key not in _RUNNERS:
        _RUNNERS[key] = Runner(
            spark,
            registry,
            sources=lambda n: spark.read.parquet(f"{FIXTURE_DIR}/{n}.parquet"),
            warehouse_dir=None,  # view-only: no writes in the driver's sandbox
            now=FROZEN_NOW,
        )
    return _RUNNERS[key]


def _b(t: str) -> str:
    return f"'{FIXTURE_DIR}/{t}.parquet'"


def _dbl(*cols):
    return [F.col(c).cast("double").alias(c) for c in cols]


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB ports of the reference models)
# ---------------------------------------------------------------------------

def _norm_id(c: str) -> str:
    """normalize_order_id (ref stg_transactions.sql:51-61)."""
    return (
        "regexp_replace(regexp_replace(regexp_replace(trim(" + c + "), "
        "'^(ORDER-|ORDER|ORD-|ORD|SO-|SO|#)', ''), "
        "'[-_ ]', '', 'g'), '[^a-zA-Z0-9]', '', 'g')"
    )


_SQL_STG_TRANSACTIONS = f"""
SELECT
  {_norm_id("CAST(t.ID AS VARCHAR)")} AS order_id,
  CAST(t.TRANSACTION_DATE AS DATE) AS order_date,
  CAST(u.CUSTOMER_ACCOUNT_ID AS VARCHAR) AS customer_id,
  lower(coalesce(CAST(t.DEVICE_TYPE AS VARCHAR), 'unknown')) AS channel,
  trim(upper(coalesce(CAST(t.PAYMENT_STATUS AS VARCHAR), ''))) AS payment_status,
  trim(upper(coalesce(CAST(t.DELIVERY_STATUS AS VARCHAR), ''))) AS delivery_status
FROM {_b("transactions")} t
LEFT JOIN {_b("users")} u ON CAST(t.USER_ID AS VARCHAR) = CAST(u.ID AS VARCHAR)
"""

# stg_items decimal chain (ref stg_items.sql:17-44; see module docstring for
# the division-emulation argument)
_SQL_STG_ITEMS = f"""
SELECT
  CAST(ID AS VARCHAR) AS transaction_item_id,
  trim(CAST(TRANSACTION_ID AS VARCHAR)) AS transaction_id,
  CAST(PRODUCT_ID AS VARCHAR) AS product_id,
  PRODUCT_NAME AS product_name,
  CAST(STOCK_ID AS VARCHAR) AS stock_id,
  STOCK_NAME AS stock_name,
  UNIT AS unit,
  CAST(QUANTITY AS DECIMAL(38,6)) AS quantity,
  CASE WHEN TRY_CAST(CAST(HAS_VAT AS VARCHAR) AS DECIMAL(38,6)) = 1
       THEN CAST(round(CAST(PRICE AS DOUBLE) / 1.05, 6) AS DECIMAL(38,6))
       ELSE CAST(PRICE AS DECIMAL(38,6)) END AS unit_price_ex_vat,
  least(
    CAST(1 AS DECIMAL(18,6)),
    greatest(
      CAST(0 AS DECIMAL(18,6)),
      CAST((coalesce(CAST(DISCOUNT_PERCENTAGE AS DECIMAL(10,2)), 0)
            + coalesce(CAST(BULK_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)), 0)
            + coalesce(CAST(FRIENDBUY_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)), 0))
           * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(18,6))
    )
  ) AS total_discount_pct
FROM {_b("transaction_items")}
"""

_SQL_STG_ITEMS_FULL = f"""
SELECT i.*,
  CAST(round(CAST(i.unit_price_ex_vat AS DECIMAL(18,6))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(i.total_discount_pct AS DECIMAL(18,6))), 6)
    AS DECIMAL(38,6)) AS realized_unit_price_ex_vat
FROM ({_SQL_STG_ITEMS}) i
"""
# ⚠ round(.,6) before the downscale cast: DuckDB's decimal→decimal cast
# TRUNCATES where Spark's precision-loss rounding is HALF_UP; round() is
# half-up in both.

# stg_orders, the columns needed downstream (ref stg_orders.sql:8-160);
# Asia/Dubai is UTC+4 year-round → convert_timezone = minus 4 hours
_SQL_STG_ORDERS = f"""
WITH src AS (
  SELECT
    t._AIRBYTE_EXTRACTED_AT AS _ingested_at,
    {_norm_id("CAST(t.ID AS VARCHAR)")} AS order_id,
    t.TRANSACTION_DATE AS created_at_local,
    coalesce(t.TRANSACTION_DATE - INTERVAL 4 HOUR, t._AIRBYTE_EXTRACTED_AT) AS created_at_utc,
    t.DATE_UPDATED - INTERVAL 4 HOUR AS updated_at_utc,
    TRY_CAST(t.DELIVERY_DATE AS DATE) AS expected_delivery_date,
    CAST(t.GROSS_AMOUNT AS DECIMAL(18,2)) AS gross_amount,
    CAST(t.TOTAL_AMOUNT AS DECIMAL(18,2)) AS total_amount,
    CAST(t.VAT_PERCENTAGE AS DECIMAL(5,2)) AS vat_percentage,
    coalesce(CAST(t.DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.BW_DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.NDC_DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.BULK_DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.POINTS_DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.SPECIAL_DISCOUNT_AMOUNT AS DECIMAL(18,2)), 0)
      + coalesce(CAST(t.GIFT_CARD_AMOUNT_DISCOUNT AS DECIMAL(18,2)), 0) AS discount_total,
    CASE WHEN TRY_CAST(CAST(t.PAYMENT_STATUS AS VARCHAR) AS DECIMAL(38,6)) = 1 THEN 'paid'
         WHEN TRY_CAST(CAST(t.PAYMENT_STATUS AS VARCHAR) AS DECIMAL(38,6)) = 0 THEN 'unpaid'
         ELSE 'unknown' END AS payment_status,
    CASE WHEN TRY_CAST(CAST(t.DELIVERY_STATUS AS VARCHAR) AS DECIMAL(38,6)) = 1 THEN 'delivered'
         WHEN TRY_CAST(CAST(t.DELIVERY_STATUS AS VARCHAR) AS DECIMAL(38,6)) = 0 THEN 'pending'
         ELSE 'unknown' END AS delivery_status,
    CAST(t.PAYMENT_METHOD AS VARCHAR) AS payment_method_raw,
    CAST(t.COUPON_CODE AS VARCHAR) AS coupon_code,
    CAST(t.DEVICE_TYPE AS VARCHAR) AS device_type,
    CAST(t.FULL_NAME AS VARCHAR) AS customer_name
  FROM {_b("transactions")} t
), dedup AS (
  SELECT * FROM src
  QUALIFY row_number() OVER (
    PARTITION BY order_id
    ORDER BY coalesce(updated_at_utc, created_at_utc) DESC NULLS FIRST,
             _ingested_at DESC NULLS FIRST
  ) = 1
)
SELECT d.*, x.customer_id,
  CAST(d.created_at_local AS DATE) AS order_date_local,
  CAST(d.created_at_utc AS DATE) AS order_date_utc
FROM dedup d
LEFT JOIN ({_SQL_STG_TRANSACTIONS}) x USING (order_id)
WHERE d.order_id IS NOT NULL
"""

_SQL_FCT_ORDERS_REVENUE = f"""
WITH items AS (
  SELECT transaction_id,
    SUM(CAST(round(CAST(realized_unit_price_ex_vat AS DECIMAL(18,6))
                   * CAST(quantity AS DECIMAL(18,6)), 6) AS DECIMAL(38,6))) AS order_revenue_ex_vat
  FROM ({_SQL_STG_ITEMS_FULL}) GROUP BY 1
)
SELECT o.customer_id, o.order_id,
  CAST(o.created_at_local AS DATE) AS order_date,
  'unknown' AS channel,
  i.order_revenue_ex_vat
FROM ({_SQL_STG_ORDERS}) o
JOIN items i ON i.transaction_id = o.order_id
WHERE o.customer_id IS NOT NULL AND o.created_at_local IS NOT NULL
"""

_SQL_MONTHLY = f"""
WITH o AS (
  SELECT customer_id, order_date, order_revenue_ex_vat FROM ({_SQL_FCT_ORDERS_REVENUE})
), firsts AS (
  SELECT customer_id, MIN(order_date) AS first_order_date FROM o GROUP BY 1
), by_month AS (
  SELECT customer_id, CAST(date_trunc('month', order_date) AS DATE) AS month_start,
    SUM(order_revenue_ex_vat) AS month_revenue
  FROM o GROUP BY 1, 2
)
SELECT b.customer_id, f.first_order_date, b.month_start,
  (year(b.month_start) - year(date_trunc('month', f.first_order_date))) * 12
    + (month(b.month_start) - month(date_trunc('month', f.first_order_date))) AS months_since_acq,
  b.month_revenue
FROM by_month b JOIN firsts f USING (customer_id)
WHERE (year(b.month_start) - year(date_trunc('month', f.first_order_date))) * 12
    + (month(b.month_start) - month(date_trunc('month', f.first_order_date))) >= 0
"""

_SQL_LTV = f"""
WITH m AS (SELECT * FROM ({_SQL_MONTHLY})),
roll AS (
  SELECT customer_id, first_order_date,
    SUM(CASE WHEN months_since_acq BETWEEN 0 AND 5  THEN month_revenue END) AS ltv_revenue_6m,
    SUM(CASE WHEN months_since_acq BETWEEN 0 AND 11 THEN month_revenue END) AS ltv_revenue_12m,
    SUM(CASE WHEN months_since_acq BETWEEN 0 AND 23 THEN month_revenue END) AS ltv_revenue_24m
  FROM m GROUP BY 1, 2
),
fr AS (SELECT * FROM ({_SQL_FCT_ORDERS_REVENUE})),
orders_cnt AS (SELECT customer_id, COUNT(*) AS orders_count FROM fr GROUP BY 1),
rev_to_date AS (SELECT customer_id, SUM(order_revenue_ex_vat) AS revenue_to_date FROM fr GROUP BY 1)
SELECT r.customer_id, r.first_order_date,
  coalesce(o.orders_count, 0) AS orders_count,
  coalesce(rt.revenue_to_date, 0) AS revenue_to_date,
  coalesce(r.ltv_revenue_6m, 0) AS ltv_revenue_6m,
  coalesce(r.ltv_revenue_12m, 0) AS ltv_revenue_12m,
  coalesce(r.ltv_revenue_24m, 0) AS ltv_revenue_24m
FROM roll r
LEFT JOIN orders_cnt o ON o.customer_id = r.customer_id
LEFT JOIN rev_to_date rt ON rt.customer_id = r.customer_id
"""

_SK = "md5(concat_ws('-', coalesce(CAST({} AS VARCHAR), '_dbt_utils_surrogate_key_null_')))"


# ---------------------------------------------------------------------------
# entries
# ---------------------------------------------------------------------------

@query(
    "model__stg_users",
    section="model S1 (ref stg_users.sql:1-4)",
    oracle=f"SELECT CAST(ID AS VARCHAR) AS user_id, CAST(CUSTOMER_ACCOUNT_ID AS VARCHAR) AS customer_id FROM {_b('users')}",
)
def model_stg_users(spark, sf_dir):
    return _runner(spark).ref("stg_users")


@query(
    "model__stg_transactions",
    section="model P1 F2 J3 (ref stg_transactions.sql:1-67)",
    oracle=_SQL_STG_TRANSACTIONS,
)
def model_stg_transactions(spark, sf_dir):
    return _runner(spark).ref("stg_transactions")


@query(
    "model__stg_items",
    section="model P2 F3 (ref stg_items.sql:1-44, decimal chain)",
    oracle=f"""
SELECT transaction_item_id, transaction_id, product_id, product_name,
  stock_id, stock_name, unit,
  CAST(quantity AS DOUBLE) AS quantity,
  CAST(unit_price_ex_vat AS DOUBLE) AS unit_price_ex_vat,
  CAST(total_discount_pct AS DOUBLE) AS total_discount_pct,
  CAST(realized_unit_price_ex_vat AS DOUBLE) AS realized_unit_price_ex_vat
FROM ({_SQL_STG_ITEMS_FULL})
""",
)
def model_stg_items(spark, sf_dir):
    df = _runner(spark).ref("stg_items")
    return df.select(
        "transaction_item_id", "transaction_id", "product_id", "product_name",
        "stock_id", "stock_name", "unit",
        *_dbl("quantity", "unit_price_ex_vat", "total_discount_pct",
              "realized_unit_price_ex_vat"),
    )


@query(
    "model__stg_order_items",
    section="model P1 P5 W1 (ref stg_order_items.sql:1-80)",
    oracle=f"""
WITH src AS (
  SELECT _AIRBYTE_EXTRACTED_AT AS _ingested_at,
    CAST(ID AS VARCHAR) AS order_item_id,
    CAST(TRANSACTION_ID AS VARCHAR) AS order_id,
    CAST(PRODUCT_ID AS VARCHAR) AS product_id,
    CAST(PRODUCT_NAME AS VARCHAR) AS product_name,
    CAST(STOCK_ID AS VARCHAR) AS stock_id,
    CAST(STOCK_NAME AS VARCHAR) AS stock_name,
    CAST(UNIT AS VARCHAR) AS unit,
    CAST(PRICE AS DECIMAL(18,2)) AS price,
    CAST(QUANTITY AS DECIMAL(18,2)) AS quantity,
    TRY_CAST(CAST(HAS_VAT AS VARCHAR) AS BOOLEAN) AS has_vat,
    CAST(DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS discount_percentage,
    CAST(BULK_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS bulk_discount_percentage,
    TRY_CAST(DISCOUNT_APPLICATION_TYPE AS INT) AS discount_application_type,
    CAST(FRIENDBUY_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS friendbuy_discount_percentage,
    TRY_CAST(FRIENDBUY_DISCOUNT_APPLICATION_TYPE AS INT) AS friendbuy_discount_application_type,
    CAST(MEAL_PLAN_REQUEST_ID AS VARCHAR) AS meal_plan_request_id
  FROM {_b("transaction_items")}
), dedup AS (
  SELECT * FROM src
  QUALIFY row_number() OVER (PARTITION BY order_item_id ORDER BY _ingested_at DESC NULLS FIRST) = 1
)
SELECT order_item_id, order_id, product_id, product_name, stock_id,
  stock_name, unit,
  CAST(quantity AS DOUBLE) AS quantity,
  CAST(price AS DOUBLE) AS price,
  CAST(quantity * price AS DOUBLE) AS line_amount,
  has_vat,
  CAST(discount_percentage AS DOUBLE) AS discount_percentage,
  CAST(bulk_discount_percentage AS DOUBLE) AS bulk_discount_percentage,
  CAST(discount_application_type AS BIGINT) AS discount_application_type,
  CAST(friendbuy_discount_percentage AS DOUBLE) AS friendbuy_discount_percentage,
  CAST(friendbuy_discount_application_type AS BIGINT) AS friendbuy_discount_application_type,
  meal_plan_request_id,
  _ingested_at
FROM dedup WHERE order_id IS NOT NULL
""",
)
def model_stg_order_items(spark, sf_dir):
    df = _runner(spark).ref("stg_order_items")
    return df.select(
        "order_item_id", "order_id", "product_id", "product_name", "stock_id",
        "stock_name", "unit",
        *_dbl("quantity", "price", "line_amount"),
        "has_vat",
        *_dbl("discount_percentage", "bulk_discount_percentage"),
        F.col("discount_application_type").cast("long").alias("discount_application_type"),
        F.col("friendbuy_discount_percentage").cast("double").alias("friendbuy_discount_percentage"),
        F.col("friendbuy_discount_application_type").cast("long").alias("friendbuy_discount_application_type"),
        "meal_plan_request_id",
        "_ingested_at",
    )


@query(
    "model__stg_orders",
    section="model P1 P3 W1 F6 J1 J2 (ref stg_orders.sql:1-160)",
    oracle=f"""
SELECT order_id, customer_id, created_at_local, created_at_utc,
  updated_at_utc, order_date_local, order_date_utc, expected_delivery_date,
  CAST(gross_amount AS DOUBLE) AS gross_amount,
  CAST(total_amount AS DOUBLE) AS total_amount,
  CAST(vat_percentage AS DOUBLE) AS vat_percentage,
  CAST(discount_total AS DOUBLE) AS discount_total,
  payment_status, delivery_status, payment_method_raw, coupon_code,
  device_type, customer_name
FROM ({_SQL_STG_ORDERS})
""",
)
def model_stg_orders(spark, sf_dir):
    df = _runner(spark).ref("stg_orders")
    return df.select(
        "order_id", "customer_id", "created_at_local", "created_at_utc",
        "updated_at_utc", "order_date_local", "order_date_utc",
        "expected_delivery_date",
        *_dbl("gross_amount", "total_amount", "vat_percentage", "discount_total"),
        "payment_status", "delivery_status", "payment_method_raw",
        "coupon_code", "device_type", "customer_name",
    )


@query(
    "model__dim_orders",
    section="model W2 F7 (ref dim_orders.sql:7-74)",
    oracle=f"""
WITH src AS (
  SELECT order_id, customer_id, created_at_local, created_at_utc
  FROM ({_SQL_STG_ORDERS})
)
SELECT {_SK.format("order_id")} AS order_sk,
  order_id, customer_id, created_at_local, created_at_utc,
  CAST(created_at_local AS DATE) AS order_date_local,
  (row_number() OVER (PARTITION BY customer_id ORDER BY created_at_utc ASC NULLS FIRST, order_id ASC NULLS FIRST) = 1) AS is_first_order,
  CAST(row_number() OVER (PARTITION BY customer_id ORDER BY created_at_utc ASC NULLS FIRST, order_id ASC NULLS FIRST) AS BIGINT) AS order_rank_for_customer
FROM src
""",
)
def model_dim_orders(spark, sf_dir):
    df = _runner(spark).ref("dim_orders")
    return df.select(
        "order_sk", "order_id", "customer_id", "created_at_local",
        "created_at_utc", "order_date_local", "is_first_order",
        F.col("order_rank_for_customer").cast("long").alias("order_rank_for_customer"),
    )


@query(
    "model__fct_orders_revenue",
    section="model A3 J4 (ref fct_orders_revenue.sql:1-23)",
    oracle=f"""
SELECT customer_id, order_id, order_date, channel,
  CAST(order_revenue_ex_vat AS DOUBLE) AS order_revenue_ex_vat
FROM ({_SQL_FCT_ORDERS_REVENUE})
""",
)
def model_fct_orders_revenue(spark, sf_dir):
    df = _runner(spark).ref("fct_orders_revenue")
    return df.select(
        "customer_id", "order_id", "order_date", "channel",
        *_dbl("order_revenue_ex_vat"),
    )


@query(
    "model__fct_customer_monthly_revenue",
    section="model A4 F6 (ref fct_customer_monthly_revenue.sql:1-32)",
    oracle=f"""
SELECT customer_id, first_order_date, month_start,
  CAST(months_since_acq AS BIGINT) AS months_since_acq,
  CAST(month_revenue AS DOUBLE) AS month_revenue
FROM ({_SQL_MONTHLY})
""",
)
def model_fct_customer_monthly_revenue(spark, sf_dir):
    df = _runner(spark).ref("fct_customer_monthly_revenue")
    return df.select(
        "customer_id", "first_order_date", "month_start",
        F.col("months_since_acq").cast("long").alias("months_since_acq"),
        *_dbl("month_revenue"),
    )


@query(
    "model__customer_revenue_ltv",
    section="model A5 (ref customer_revenue_ltv.sql:1-36)",
    oracle=f"""
SELECT customer_id, first_order_date,
  CAST(orders_count AS BIGINT) AS orders_count,
  CAST(revenue_to_date AS DOUBLE) AS revenue_to_date,
  CAST(ltv_revenue_6m AS DOUBLE) AS ltv_revenue_6m,
  CAST(ltv_revenue_12m AS DOUBLE) AS ltv_revenue_12m,
  CAST(ltv_revenue_24m AS DOUBLE) AS ltv_revenue_24m
FROM ({_SQL_LTV})
""",
)
def model_customer_revenue_ltv(spark, sf_dir):
    df = _runner(spark).ref("customer_revenue_ltv")
    return df.select(
        "customer_id", "first_order_date",
        F.col("orders_count").cast("long").alias("orders_count"),
        *_dbl("revenue_to_date", "ltv_revenue_6m", "ltv_revenue_12m", "ltv_revenue_24m"),
    )


@query(
    "model__cohort_revenue_ltv",
    section="model A6 (ref cohort_revenue_ltv.sql:1-19, exact percentiles)",
    oracle=f"""
WITH c AS (
  SELECT customer_id,
    CAST(date_trunc('month', first_order_date) AS DATE) AS cohort_month,
    CAST(ltv_revenue_6m AS DOUBLE) AS l6,
    CAST(ltv_revenue_12m AS DOUBLE) AS l12,
    CAST(ltv_revenue_24m AS DOUBLE) AS l24
  FROM ({_SQL_LTV})
)
SELECT cohort_month,
  CAST(COUNT(DISTINCT customer_id) AS BIGINT) AS customers,
  round(SUM(l6) / COUNT(*), 6) AS avg_ltv_6m,
  round(SUM(l12) / COUNT(*), 6) AS avg_ltv_12m,
  round(SUM(l24) / COUNT(*), 6) AS avg_ltv_24m,
  round(CAST(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l12) AS DOUBLE), 6) AS p50_ltv_12m,
  round(CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY l12) AS DOUBLE), 6) AS p75_ltv_12m
FROM c GROUP BY cohort_month
""",
)
def model_cohort_revenue_ltv(spark, sf_dir):
    # avg of exact-decimal sums re-expressed as sum/count in BOTH engines
    # (Spark's decimal avg and DuckDB's double avg round differently);
    # round(…,6) absorbs double-division representation noise
    c = _runner(spark).ref("customer_revenue_ltv").select(
        "customer_id",
        F.trunc("first_order_date", "month").alias("cohort_month"),
        F.col("ltv_revenue_6m").cast("double").alias("l6"),
        F.col("ltv_revenue_12m").cast("double").alias("l12"),
        F.col("ltv_revenue_24m").cast("double").alias("l24"),
    )
    return c.groupBy("cohort_month").agg(
        F.countDistinct("customer_id").alias("customers"),
        F.round(F.sum("l6") / F.count(F.lit(1)), 6).alias("avg_ltv_6m"),
        F.round(F.sum("l12") / F.count(F.lit(1)), 6).alias("avg_ltv_12m"),
        F.round(F.sum("l24") / F.count(F.lit(1)), 6).alias("avg_ltv_24m"),
        F.round(F.percentile("l12", F.lit(0.5)), 6).alias("p50_ltv_12m"),
        F.round(F.percentile("l12", F.lit(0.75)), 6).alias("p75_ltv_12m"),
    )


@query(
    "model__first_channel_ltv",
    section="model A7 W3 O1 (ref first_channel_ltv.sql:1-26)",
    oracle=f"""
WITH fo AS (
  SELECT customer_id, order_id,
    CAST(created_at_local AS DATE) AS order_dt,
    coalesce(device_type, 'unknown') AS channel_dim
  FROM ({_SQL_STG_ORDERS})
  WHERE customer_id IS NOT NULL
  QUALIFY row_number() OVER (
    PARTITION BY customer_id
    ORDER BY CAST(created_at_local AS DATE) ASC NULLS FIRST, order_id ASC NULLS FIRST
  ) = 1
)
SELECT fo.channel_dim AS channel,
  CAST(COUNT(DISTINCT c.customer_id) AS BIGINT) AS customers,
  round(SUM(CAST(c.ltv_revenue_12m AS DOUBLE)) / COUNT(*), 0) AS ltv12_avg,
  round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY CAST(c.ltv_revenue_12m AS DOUBLE)) AS DOUBLE), 0) AS ltv12_p50,
  round(SUM(CAST(c.ltv_revenue_24m AS DOUBLE)) / COUNT(*), 0) AS ltv24_avg
FROM fo JOIN ({_SQL_LTV}) c USING (customer_id)
GROUP BY fo.channel_dim
""",
)
def model_first_channel_ltv(spark, sf_dir):
    r = _runner(spark)
    from pyspark.sql import Window

    o = r.ref("stg_orders").filter(F.col("customer_id").isNotNull())
    w = Window.partitionBy("customer_id").orderBy(F.asc("order_dt"), F.asc("order_id"))
    fo = (
        o.select(
            "customer_id", "order_id",
            F.to_date("created_at_local").alias("order_dt"),
            F.coalesce("device_type", F.lit("unknown")).alias("channel_dim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    c = r.ref("customer_revenue_ltv")
    return (
        fo.join(c, on="customer_id")
        .groupBy(F.col("channel_dim").alias("channel"))
        .agg(
            F.countDistinct("customer_id").alias("customers"),
            F.round(
                F.sum(F.col("ltv_revenue_12m").cast("double")) / F.count(F.lit(1)), 0
            ).alias("ltv12_avg"),
            F.round(F.percentile(F.col("ltv_revenue_12m").cast("double"), F.lit(0.5)), 0)
            .alias("ltv12_p50"),
            F.round(
                F.sum(F.col("ltv_revenue_24m").cast("double")) / F.count(F.lit(1)), 0
            ).alias("ltv24_avg"),
        )
    )


# ---------------------------------------------------------------------------
# part 2: customers / addresses / JSON models / packages / product tables
# ---------------------------------------------------------------------------

_SQL_STG_CUSTOMERS = f"""
WITH src AS (
  SELECT _AIRBYTE_EXTRACTED_AT AS _ingested_at,
    CAST(ID AS VARCHAR) AS customer_id,
    CAST(ACCOUNT_NAME AS VARCHAR) AS customer_name,
    CAST(ACCOUNT_EMAIL_ADDRESS AS VARCHAR) AS email_primary,
    CAST(OTHER_EMAIL_ADDRESSES AS VARCHAR) AS email_other,
    CAST(T_PHONE_NUMBER AS VARCHAR) AS phone_primary,
    CAST(T_SECONDARY_PHONE_NUMBER AS VARCHAR) AS phone_secondary,
    CAST(FORMATTED_PHONES AS VARCHAR) AS phone_formatted,
    CAST(AREA AS VARCHAR) AS area,
    TRY_CAST(LATITUDE AS DOUBLE) AS lat_raw,
    TRY_CAST(LONGITUDE AS DOUBLE) AS lon_raw,
    TRY_CAST(CAST(HAS_STAR AS VARCHAR) AS BOOLEAN) AS has_star,
    DATE_CREATED AS created_at,
    DATE_UPDATED AS updated_at,
    CAST(LAST_DELIVERY_DATE AS DATE) AS last_delivery_date
  FROM {_b("customer_accounts")}
), dedup AS (
  SELECT * FROM src
  QUALIFY row_number() OVER (
    PARTITION BY customer_id
    ORDER BY coalesce(updated_at, created_at) DESC NULLS FIRST,
             _ingested_at DESC NULLS FIRST
  ) = 1
)
SELECT customer_id, customer_name, email_primary, email_other,
  phone_primary, phone_secondary, phone_formatted, area,
  CASE WHEN lat_raw BETWEEN -90 AND 90
       THEN CAST(CAST(round(lat_raw, 6) AS DECIMAL(18,6)) AS DOUBLE) END AS latitude,
  CASE WHEN lon_raw BETWEEN -180 AND 180
       THEN CAST(CAST(round(lon_raw, 6) AS DECIMAL(18,6)) AS DOUBLE) END AS longitude,
  has_star, created_at, updated_at, last_delivery_date
FROM dedup WHERE customer_id IS NOT NULL
"""


@query(
    "model__stg_customers",
    section="model P1 P3 W1 F4 (ref stg_customers.sql:1-150)",
    oracle=_SQL_STG_CUSTOMERS,
)
def model_stg_customers(spark, sf_dir):
    df = _runner(spark).ref("stg_customers")
    return df.select(
        "customer_id", "customer_name", "email_primary", "email_other",
        "phone_primary", "phone_secondary", "phone_formatted", "area",
        *_dbl("latitude", "longitude"),
        "has_star", "created_at", "updated_at", "last_delivery_date",
    )


_SQL_STG_ADDRESSES = f"""
WITH src AS (
  SELECT
    CAST(ID AS VARCHAR) AS raw_id,
    CAST(USER_ADDRESS_ID AS VARCHAR) AS user_address_id,
    CAST(TRANSACTION_ID AS VARCHAR) AS transaction_id,
    CAST(USER_ID AS VARCHAR) AS user_id,
    nullif(trim(FIRST_NAME), '') AS first_name,
    nullif(trim(LAST_NAME), '') AS last_name,
    lower(nullif(trim(EMAIL), '')) AS email,
    nullif(trim(PHONE), '') AS phone,
    nullif(trim(BUILDING), '') AS building,
    nullif(trim(APARTMENT_NUMBER), '') AS apartment_number,
    nullif(trim(STREET_NAME), '') AS street_name,
    nullif(trim(LAND_MARK), '') AS landmark,
    nullif(trim(AREA), '') AS area,
    nullif(trim(TOWN), '') AS town,
    nullif(trim(POST_CODE), '') AS post_code,
    nullif(trim(REGION_ID), '') AS region_id,
    upper(nullif(trim(COUNTRY_CODE), '')) AS country_code,
    lower(nullif(trim(TYPE), '')) AS address_type,
    (CASE WHEN upper(nullif(trim(IS_NEW_ADDRESS), '')) IN ('1','TRUE','Y')
          THEN true ELSE false END) AS is_new_address,
    TRY_CAST(nullif(trim(CAST(LATITUDE AS VARCHAR)), '') AS DECIMAL(9,6)) AS latitude,
    TRY_CAST(nullif(trim(CAST(LONGITUDE AS VARCHAR)), '') AS DECIMAL(9,6)) AS longitude,
    TRY_CAST(nullif(trim(CAST(DATE_UPDATED AS VARCHAR)), '') AS TIMESTAMP) AS updated_at,
    _AIRBYTE_EXTRACTED_AT AS _src_extracted_at
  FROM {_b("transaction_addresses")}
), shaped AS (
  SELECT coalesce(user_address_id, raw_id) AS address_id, s.*,
    concat_ws(' ', first_name, last_name) AS full_name,
    concat_ws(', ',
      nullif(concat_ws(' ', building, apartment_number, street_name), ''),
      nullif(concat_ws(' ', area, town), ''),
      nullif(concat_ws(' ', post_code, country_code), '')
    ) AS address_display
  FROM src s
), dedup AS (
  SELECT * FROM shaped
  QUALIFY row_number() OVER (
    PARTITION BY address_id
    ORDER BY coalesce(updated_at, _src_extracted_at) DESC NULLS FIRST,
             raw_id DESC NULLS FIRST
  ) = 1
)
SELECT {_SK.format("address_id")} AS address_sk,
  address_id, user_address_id, raw_id, transaction_id, user_id,
  first_name, last_name, full_name, email, phone, building,
  apartment_number, street_name, landmark, area, town, post_code,
  region_id, country_code, address_type,
  CASE WHEN latitude BETWEEN -90 AND 90 THEN latitude END AS latitude,
  CASE WHEN longitude BETWEEN -180 AND 180 THEN longitude END AS longitude,
  is_new_address, updated_at, _src_extracted_at, address_display
FROM dedup
"""


@query(
    "model__stg_addresses",
    section="model F1 F4 W1 F7 (ref stg_addresses.sql:1-150)",
    oracle=f"""
SELECT address_sk, address_id, user_address_id, raw_id, transaction_id,
  user_id, first_name, last_name, full_name, email, phone, address_type,
  country_code,
  CAST(latitude AS DOUBLE) AS latitude,
  CAST(longitude AS DOUBLE) AS longitude,
  is_new_address, updated_at, address_display
FROM ({_SQL_STG_ADDRESSES})
""",
)
def model_stg_addresses(spark, sf_dir):
    df = _runner(spark).ref("stg_addresses")
    return df.select(
        "address_sk", "address_id", "user_address_id", "raw_id",
        "transaction_id", "user_id", "first_name", "last_name", "full_name",
        "email", "phone", "address_type", "country_code",
        *_dbl("latitude", "longitude"),
        "is_new_address", "updated_at", "address_display",
    )


# JSON envelope → TRY_CAST(… AS JSON) mirrors try_parse_json/from_json
# (NULL on malformed); scalars via json_extract_string
_J = "json_extract_string(j, '$.{}')"

_SQL_INVOICE_BASE = f"""
SELECT TRY_CAST(JSON_DATA AS JSON) AS j, _AIRBYTE_EXTRACTED_AT AS extracted_at
FROM {_b("zbooks_invoices")}
"""

_SQL_INVOICE_FIELDS = f"""
SELECT extracted_at,
  {_J.format("invoice_id")} AS invoice_id,
  {_J.format("invoice_number")} AS invoice_number,
  {_J.format("customer_id")} AS customer_id,
  {_J.format("customer_name")} AS customer_name,
  TRY_CAST({_J.format("date")} AS DATE) AS invoice_date,
  TRY_CAST(nullif({_J.format("due_date")}, '') AS DATE) AS due_date,
  TRY_CAST(nullif({_J.format("last_payment_date")}, '') AS DATE) AS last_payment_date,
  upper({_J.format("currency_code")}) AS currency_code,
  TRY_CAST({_J.format("total")} AS DECIMAL(18,2)) AS total_amount,
  coalesce(TRY_CAST({_J.format("balance")} AS DECIMAL(18,2)), 0) AS balance,
  nullif({_J.format("reference_number")}, '') AS reference_number,
  lower({_J.format("status")}) AS src_status
FROM ({_SQL_INVOICE_BASE})
"""


@query(
    "model__stg_invoice_payments",
    section="model F5 F7 P4 (ref stg_invoice_payments.sql:1-83)",
    oracle=f"""
WITH base AS ({_SQL_INVOICE_FIELDS}),
norm AS (
  SELECT *,
    CASE WHEN src_status = 'paid' AND balance = 0 THEN 'paid'
         WHEN src_status IN ('paid', 'partially_paid') AND balance > 0 THEN 'partially_paid'
         WHEN src_status = 'draft' THEN 'draft'
         WHEN src_status = 'void' THEN 'void'
         WHEN src_status IN ('unpaid', 'overdue') THEN 'unpaid'
         ELSE coalesce(src_status, 'unknown') END AS status_canonical,
    greatest(coalesce(total_amount, 0) - coalesce(balance, 0), 0) AS amount_paid,
    coalesce(last_payment_date,
      CASE WHEN (coalesce(total_amount, 0) - coalesce(balance, 0)) > 0
           THEN invoice_date END) AS payment_date
  FROM base
)
SELECT
  md5(concat_ws('-', 'zoho_invoice',
    coalesce(CAST(invoice_id AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
    coalesce(coalesce(CAST(payment_date AS VARCHAR), CAST(invoice_date AS VARCHAR)),
             '_dbt_utils_surrogate_key_null_')
  )) AS payment_id,
  invoice_id, invoice_number, customer_id, customer_name, invoice_date,
  due_date, payment_date, status_canonical,
  CAST(total_amount AS DOUBLE) AS total_amount,
  CAST(amount_paid AS DOUBLE) AS amount_paid,
  CAST(balance AS DOUBLE) AS balance,
  currency_code, reference_number
FROM norm WHERE status_canonical IN ('paid', 'partially_paid')
""",
)
def model_stg_invoice_payments(spark, sf_dir):
    df = _runner(spark).ref("stg_invoice_payments")
    return df.select(
        "payment_id", "invoice_id", "invoice_number", "customer_id",
        "customer_name", "invoice_date", "due_date", "payment_date",
        "status_canonical",
        *_dbl("total_amount", "amount_paid", "balance"),
        "currency_code", "reference_number",
    )


@query(
    "model__stg_invoices_ar",
    section="model F5 P4 (ref stg_invoices_ar.sql:1-26)",
    oracle=f"""
WITH base AS ({_SQL_INVOICE_FIELDS})
SELECT invoice_id, invoice_number, customer_id, customer_name,
  invoice_date, due_date, src_status,
  CASE WHEN src_status = 'paid' AND balance = 0 THEN 'paid'
       WHEN balance > 0 THEN 'partially_paid'
       ELSE 'unpaid' END AS status_canonical,
  CAST(total_amount AS DOUBLE) AS total_amount,
  CAST(balance AS DOUBLE) AS balance,
  CAST(greatest(coalesce(total_amount, 0) - coalesce(balance, 0), 0) AS DOUBLE) AS amount_paid,
  currency_code
FROM base WHERE coalesce(balance, 0) > 0
""",
)
def model_stg_invoices_ar(spark, sf_dir):
    df = _runner(spark).ref("stg_invoices_ar")
    return df.select(
        "invoice_id", "invoice_number", "customer_id", "customer_name",
        "invoice_date", "due_date", "src_status", "status_canonical",
        *_dbl("total_amount", "balance", "amount_paid"),
        "currency_code",
    )


@query(
    "model__stg_shipments",
    section="model F5 W1 F3 (ref stg_shipments.sql:1-70)",
    oracle=f"""
WITH j AS (
  SELECT TRY_CAST(JSON_DATA AS JSON) AS j FROM {_b("zbooks_shipments")}
), base AS (
  SELECT
    {_J.format("shipment_id")} AS shipment_id,
    {_J.format("package_id")} AS package_id,
    {_J.format("package_number")} AS package_number,
    {_J.format("status")} AS src_status,
    {_J.format("tracking_number")} AS tracking_number,
    TRY_CAST(nullif({_J.format("shipping_date")}, '') AS DATE) AS shipped_at,
    TRY_CAST(nullif({_J.format("delivery_date")}, '') AS DATE) AS delivered_at,
    {_J.format("delivery_method")} AS delivery_method,
    TRY_CAST({_J.format("date")} AS DATE) AS shipment_created_date,
    {_J.format("customer_id")} AS customer_id,
    {_J.format("customer_name")} AS customer_name,
    {_J.format("salesorder_id")} AS salesorder_id,
    {_J.format("salesorder_number")} AS salesorder_number
  FROM j
), norm AS (
  SELECT *,
    CASE lower(coalesce(src_status, ''))
      WHEN 'shipped' THEN 'shipped'
      WHEN 'in_transit' THEN 'in_transit'
      WHEN 'delivered' THEN 'delivered'
      WHEN 'failed' THEN 'failed'
      WHEN 'returned' THEN 'returned'
      ELSE 'shipped' END AS status_canonical
  FROM base
)
SELECT shipment_id, package_id, package_number, status_canonical,
  tracking_number, shipped_at, delivered_at, delivery_method,
  shipment_created_date, customer_id, customer_name, salesorder_id,
  salesorder_number
FROM norm
QUALIFY row_number() OVER (
  PARTITION BY shipment_id
  ORDER BY shipment_created_date DESC NULLS FIRST,
           shipped_at DESC NULLS FIRST,
           delivered_at DESC NULLS FIRST
) = 1
""",
)
def model_stg_shipments(spark, sf_dir):
    return _runner(spark).ref("stg_shipments")


@query(
    "model__stg_packages",
    section="model P1 W1 F4 (ref stg_packages.sql:1-55)",
    oracle=f"""
WITH src AS (
  SELECT
    CAST(PACKAGE_ID AS VARCHAR) AS package_id,
    CAST(SHIPMENT_ID AS VARCHAR) AS shipment_id,
    CAST(CUSTOMER_ID AS VARCHAR) AS customer_id,
    CAST(PACKAGE_NUMBER AS VARCHAR) AS package_number,
    CAST(DATE_CREATED AS TIMESTAMP) AS created_at,
    TRY_CAST(DELIVERY_DATE AS DATE) AS delivered_at,
    CAST(DELIVERY_TIME AS VARCHAR) AS delivery_time,
    CAST(ADMIN_ID AS VARCHAR) AS admin_id,
    CAST(ORGANIZATION AS VARCHAR) AS organization,
    CAST(BB_COUNT AS BIGINT) AS bb_count,
    CAST(CB_COUNT AS BIGINT) AS cb_count,
    CAST(BATCH_TIME AS TIMESTAMP) AS batch_time,
    TRY_CAST(CAST(IS_BB_VERIFIED AS VARCHAR) AS BOOLEAN) AS is_bb_verified
  FROM {_b("packages_printed")}
)
SELECT * FROM src
QUALIFY row_number() OVER (
  PARTITION BY package_id
  ORDER BY coalesce(created_at, batch_time) DESC NULLS FIRST,
           package_number DESC NULLS FIRST
) = 1
""",
)
def model_stg_packages(spark, sf_dir):
    return _runner(spark).ref("stg_packages")


_SQL_STG_PRODUCT_DETAILS = f"""
WITH src AS (
  SELECT
    trim(CAST(PRODUCT_ID AS VARCHAR)) AS product_id,
    nullif(trim(CAST(DETAIL_NAME AS VARCHAR)), '') AS detail_name,
    nullif(trim(CAST(DETAIL_TYPE AS VARCHAR)), '') AS detail_type,
    nullif(trim(CAST(DETAIL_CONTENT AS VARCHAR)), '') AS detail_content,
    nullif(trim(CAST(SORT_ORDER AS VARCHAR)), '') AS sort_order,
    lower(nullif(trim(CAST(STATUS AS VARCHAR)), '')) AS src_status,
    nullif(trim(CAST(DATE_CREATED AS VARCHAR)), '') AS created_at,
    nullif(trim(CAST(LOCATION_INSERT AS VARCHAR)), '') AS location_insert
  FROM {_b("product_details")}
), keyed AS (
  SELECT *,
    md5(concat_ws('-',
      coalesce(product_id, '_dbt_utils_surrogate_key_null_'),
      coalesce(coalesce(detail_name, ''), '_dbt_utils_surrogate_key_null_'),
      coalesce(coalesce(detail_type, ''), '_dbt_utils_surrogate_key_null_'),
      coalesce(coalesce(sort_order, ''), '_dbt_utils_surrogate_key_null_')
    )) AS product_detail_sk
  FROM src
)
SELECT product_detail_sk, product_id, detail_name, detail_type,
  detail_content, sort_order, src_status, created_at, location_insert
FROM keyed
QUALIFY row_number() OVER (
  PARTITION BY product_detail_sk ORDER BY created_at DESC NULLS LAST
) = 1
"""


@query(
    "model__stg_product_details",
    section="model F7 W1 (ref stg_product_details.sql:1-50)",
    oracle=_SQL_STG_PRODUCT_DETAILS,
)
def model_stg_product_details(spark, sf_dir):
    return _runner(spark).ref("stg_product_details")


_SQL_SLUG = """
WITH src AS (
  SELECT CAST(ID AS VARCHAR) AS {id_col},
    nullif(NAME, '') AS {name_col},
    nullif(SLUG, '') AS {slug_col},
    TRY_CAST(CAST(DATE_CREATED AS VARCHAR) AS TIMESTAMP) AS created_at
  FROM {src}
)
SELECT * FROM src
QUALIFY row_number() OVER (PARTITION BY {id_col} ORDER BY created_at DESC NULLS LAST) = 1
"""


@query(
    "model__stg_product_brands",
    section="model W1 nulls-last (ref stg_product_brands.sql:1-20)",
    oracle=_SQL_SLUG.format(
        id_col="brand_id", name_col="brand_name", slug_col="brand_slug",
        src=_b("product_brands"),
    ),
)
def model_stg_product_brands(spark, sf_dir):
    return _runner(spark).ref("stg_product_brands")


@query(
    "model__stg_product_categories",
    section="model W1 (ref stg_product_categories.sql:1-20)",
    oracle=_SQL_SLUG.format(
        id_col="category_id", name_col="category_name", slug_col="category_slug",
        src=_b("product_categories"),
    ),
)
def model_stg_product_categories(spark, sf_dir):
    return _runner(spark).ref("stg_product_categories")


@query(
    "model__dim_customer",
    section="model W1 F2 F7 (ref dim_customer.sql:1-85, 6-arg (?i) regexp_replace)",
    oracle=f"""
WITH src AS (
  SELECT customer_id,
    trim(customer_name) AS customer_name_raw,
    lower(trim(email_primary)) AS email_primary,
    lower(trim(email_other)) AS email_other,
    trim(phone_primary) AS phone_primary,
    trim(phone_secondary) AS phone_secondary,
    trim(phone_formatted) AS phone_formatted,
    created_at, updated_at
  FROM ({_SQL_STG_CUSTOMERS})
  WHERE customer_id IS NOT NULL
), ranked AS (
  SELECT * FROM src
  QUALIFY row_number() OVER (
    PARTITION BY customer_id
    ORDER BY updated_at DESC NULLS LAST, created_at DESC NULLS LAST
  ) = 1
)
SELECT {_SK.format("customer_id")} AS customer_key,
  customer_id,
  coalesce(email_primary, email_other) AS email,
  CASE WHEN coalesce(phone_primary, phone_secondary, phone_formatted) IS NULL THEN NULL
       ELSE regexp_replace(coalesce(phone_primary, phone_secondary, phone_formatted), '\\+', '', 'g')
  END AS phone,
  trim(
    regexp_replace(
      regexp_replace(customer_name_raw, '(?i)Furchild:.*$', ''),
      '\\s*[-–:]+\\s*$', '')
  ) AS full_name,
  created_at, updated_at
FROM ranked
""",
)
def model_dim_customer(spark, sf_dir):
    return _runner(spark).ref("dim_customer")


# ---------------------------------------------------------------------------
# part 3: the incremental facts (ref fct_order_items.sql / fct_orders.sql)
# ---------------------------------------------------------------------------

# stg_order_items with decimal columns retained (feeds the fact chain)
_SQL_OI_STG = f"""
SELECT * FROM (
  SELECT _AIRBYTE_EXTRACTED_AT AS _ingested_at,
    CAST(ID AS VARCHAR) AS order_item_id,
    CAST(TRANSACTION_ID AS VARCHAR) AS order_id,
    CAST(PRODUCT_ID AS VARCHAR) AS product_id,
    CAST(PRODUCT_NAME AS VARCHAR) AS product_name,
    CAST(STOCK_ID AS VARCHAR) AS stock_id,
    CAST(STOCK_NAME AS VARCHAR) AS stock_name,
    CAST(UNIT AS VARCHAR) AS unit,
    CAST(PRICE AS DECIMAL(18,2)) AS price,
    CAST(QUANTITY AS DECIMAL(18,2)) AS quantity,
    TRY_CAST(CAST(HAS_VAT AS VARCHAR) AS BOOLEAN) AS has_vat,
    CAST(DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS discount_percentage,
    CAST(BULK_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS bulk_discount_percentage,
    TRY_CAST(DISCOUNT_APPLICATION_TYPE AS INT) AS discount_application_type,
    CAST(FRIENDBUY_DISCOUNT_PERCENTAGE AS DECIMAL(10,2)) AS friendbuy_discount_percentage,
    TRY_CAST(FRIENDBUY_DISCOUNT_APPLICATION_TYPE AS INT) AS friendbuy_discount_application_type,
    CAST(MEAL_PLAN_REQUEST_ID AS VARCHAR) AS meal_plan_request_id
  FROM {_b("transaction_items")}
  QUALIFY row_number() OVER (PARTITION BY CAST(ID AS VARCHAR) ORDER BY _AIRBYTE_EXTRACTED_AT DESC NULLS FIRST) = 1
) WHERE order_id IS NOT NULL
"""

# fct_order_items with DECIMAL outputs (the model's rounded (38,6) values);
# every Spark (38,6) product/division is reproduced as an (18,6)-multiplied
# exact product (or a *0.01 scale shift) rounded half-up to scale 6.
_SQL_FCT_ORDER_ITEMS = f"""
WITH items AS (
  SELECT i.*,
    upper(coalesce(CAST(discount_application_type AS VARCHAR), 'PERCENTAGE')) AS datype,
    upper(coalesce(CAST(friendbuy_discount_application_type AS VARCHAR), 'PERCENTAGE')) AS fb_datype
  FROM ({_SQL_OI_STG}) i
), orders AS (
  SELECT order_id, created_at_local, created_at_utc,
    CAST(vat_percentage AS DECIMAL(38,6)) AS vat_pct_raw
  FROM ({_SQL_STG_ORDERS})
), typed AS (
  SELECT i.order_item_id, i.order_id, i.product_id, i.product_name,
    i.stock_id, i.stock_name, i.unit, i.meal_plan_request_id, i._ingested_at,
    (CASE WHEN i.has_vat = true THEN true ELSE false END) AS has_vat,
    coalesce(CAST(i.quantity AS DECIMAL(18,6)), 0) AS qty,
    coalesce(CAST(i.price AS DECIMAL(18,6)), 0) AS price,
    coalesce(CAST(i.quantity * i.price AS DECIMAL(18,6)), 0) AS line_amount_src,
    coalesce(CASE WHEN i.datype = 'PERCENTAGE' THEN CAST(i.discount_percentage AS DECIMAL(18,6)) END, 0) AS disc_pct,
    coalesce(CASE WHEN i.fb_datype = 'PERCENTAGE' THEN CAST(i.friendbuy_discount_percentage AS DECIMAL(18,6)) END, 0) AS fb_pct,
    coalesce(CAST(i.bulk_discount_percentage AS DECIMAL(18,6)), 0) AS bulk_pct,
    coalesce(o.vat_pct_raw, 0) AS vat_pct,
    o.created_at_local, o.created_at_utc
  FROM items i LEFT JOIN orders o USING (order_id)
), amt AS (
  SELECT t.*,
    round(t.qty * t.price, 6) AS line_gross,
    (CASE WHEN t.disc_pct + t.fb_pct + t.bulk_pct < 0 THEN 0
          WHEN t.disc_pct + t.fb_pct + t.bulk_pct > 100 THEN 100
          ELSE round(t.disc_pct + t.fb_pct + t.bulk_pct, 2) END) AS disc_pct_eff,
    round(CAST(t.vat_pct AS DECIMAL(18,6)) * CAST(0.01 AS DECIMAL(3,2)), 6) AS vat_frac
  FROM typed t
), math AS (
  SELECT a.*,
    round(CAST(a.line_gross AS DECIMAL(18,6))
          * CAST(round(CAST(a.disc_pct_eff AS DECIMAL(18,6)) * CAST(0.01 AS DECIMAL(3,2)), 6) AS DECIMAL(18,6)), 6)
      AS line_discount
  FROM amt a
), math2 AS (
  SELECT m.*,
    m.line_gross - m.line_discount AS line_net_bt,
    (CASE WHEN m.has_vat
          THEN round(CAST(m.line_gross - m.line_discount AS DECIMAL(18,6))
                     * CAST(m.vat_frac AS DECIMAL(18,6)), 6)
          ELSE 0 END) AS line_tax
  FROM math m
)
SELECT
  md5(concat_ws('-',
    coalesce(order_id, '_dbt_utils_surrogate_key_null_'),
    coalesce(product_id, '_dbt_utils_surrogate_key_null_'),
    coalesce(order_item_id, '_dbt_utils_surrogate_key_null_'))) AS order_item_sk,
  {_SK.format("order_id")} AS order_sk,
  order_item_id, order_id, product_id, product_name, stock_id, stock_name,
  created_at_local, created_at_utc,
  CAST(created_at_local AS DATE) AS order_date_local,
  unit,
  round(qty, 2) AS quantity,
  round(price, 2) AS unit_price,
  round(line_amount_src, 2) AS line_amount_raw,
  round(line_gross, 2) AS line_gross,
  round(disc_pct_eff, 2) AS discount_pct_effective,
  round(line_discount, 2) AS line_discount_amt,
  round(vat_pct, 2) AS vat_pct,
  round(line_tax, 2) AS line_tax_amt,
  round(line_net_bt + line_tax, 2) AS line_net_amt,
  meal_plan_request_id,
  _ingested_at AS _last_ingested_at
FROM math2
"""

_FCT_OI_COLS = [
    "order_item_sk", "order_sk", "order_item_id", "order_id", "product_id",
    "product_name", "stock_id", "stock_name", "created_at_local",
    "created_at_utc", "order_date_local", "unit",
]
_FCT_OI_MONEY = [
    "quantity", "unit_price", "line_amount_raw", "line_gross",
    "discount_pct_effective", "line_discount_amt", "vat_pct",
    "line_tax_amt", "line_net_amt",
]


@query(
    "model__fct_order_items",
    section="model A1 J5 F7 S6 (ref fct_order_items.sql:1-168, decimal domain)",
    oracle=f"""
SELECT {", ".join(_FCT_OI_COLS)},
  {", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in _FCT_OI_MONEY)},
  meal_plan_request_id, _last_ingested_at
FROM ({_SQL_FCT_ORDER_ITEMS})
""",
)
def model_fct_order_items(spark, sf_dir):
    df = _runner(spark).ref("fct_order_items")
    return df.select(
        *_FCT_OI_COLS, *_dbl(*_FCT_OI_MONEY), "meal_plan_request_id",
        "_last_ingested_at",
    )


_SQL_FCT_ORDERS = f"""
WITH oi AS (
  SELECT order_id, created_at_local, created_at_utc, product_id,
    CAST(line_gross AS DECIMAL(18,6)) AS line_gross,
    CAST(line_discount_amt AS DECIMAL(18,6)) AS line_discount,
    CAST(line_tax_amt AS DECIMAL(18,6)) AS line_tax,
    CAST(line_net_amt AS DECIMAL(18,6)) AS line_net
  FROM ({_SQL_FCT_ORDER_ITEMS})
), agg AS (
  SELECT order_id,
    MIN(created_at_local) AS created_at_local,
    MIN(created_at_utc) AS created_at_utc,
    COUNT(*) AS item_count,
    COUNT(DISTINCT product_id) AS distinct_products,
    SUM(coalesce(line_gross, 0)) AS order_gross,
    SUM(coalesce(line_discount, 0)) AS order_discount,
    SUM(coalesce(line_tax, 0)) AS order_tax,
    SUM(coalesce(line_net, 0)) AS order_net,
    SUM(coalesce(line_net, 0)) - SUM(coalesce(line_tax, 0)) AS order_net_bt
  FROM oi GROUP BY 1
), orders AS (
  SELECT order_id, CAST(vat_percentage AS DECIMAL(38,6)) AS vat_pct_src
  FROM ({_SQL_STG_ORDERS})
), tx AS (
  SELECT order_id, customer_id FROM ({_SQL_STG_TRANSACTIONS})
), joined AS (
  SELECT a.*, o.vat_pct_src, t.customer_id
  FROM agg a LEFT JOIN orders o USING (order_id) LEFT JOIN tx t USING (order_id)
), users AS (
  SELECT CAST(ID AS VARCHAR) AS user_id, CAST(CUSTOMER_ACCOUNT_ID AS VARCHAR) AS customer_id
  FROM {_b("users")}
), addr_user AS (
  SELECT sa.address_id, u.customer_id,
    lower(coalesce(sa.address_type, 'shipping')) AS address_type,
    sa.area, sa.town, sa.region_id, sa.country_code, sa.address_display,
    sa.building, sa.apartment_number, sa.street_name, sa.landmark,
    sa.email, sa.phone,
    CAST(sa.latitude AS DECIMAL(38,6)) AS latitude,
    CAST(sa.longitude AS DECIMAL(38,6)) AS longitude,
    coalesce(sa.updated_at, sa._src_extracted_at) AS address_ts
  FROM ({_SQL_STG_ADDRESSES}) sa
  JOIN users u ON CAST(sa.user_id AS VARCHAR) = CAST(u.user_id AS VARCHAR)
), addr_at_order AS (
  SELECT * FROM (
    SELECT j.order_id, au.area, au.town, au.region_id, au.country_code,
      au.address_display, au.building, au.apartment_number, au.street_name,
      au.landmark, au.email, au.phone, au.latitude, au.longitude,
      row_number() OVER (
        PARTITION BY j.order_id
        ORDER BY (CASE WHEN au.address_ts IS NOT NULL AND au.address_ts <= j.created_at_utc
                       THEN 0 ELSE 1 END) ASC,
                 abs(epoch(j.created_at_utc) - epoch(coalesce(au.address_ts, j.created_at_utc))) ASC,
                 au.address_id ASC NULLS LAST
      ) AS rn
    FROM joined j
    LEFT JOIN addr_user au
      ON au.customer_id = j.customer_id AND au.address_type = 'shipping'
  ) WHERE rn = 1
)
SELECT {_SK.format("f.order_id")} AS order_sk,
  f.order_id, f.customer_id, f.created_at_local, f.created_at_utc,
  CAST(f.created_at_utc AS DATE) AS order_date,
  CAST(f.created_at_local AS DATE) AS order_date_local,
  f.item_count, CAST(f.distinct_products AS BIGINT) AS distinct_products,
  round(f.order_gross, 2) AS order_gross,
  round(f.order_discount, 2) AS order_discount_amt,
  round(f.order_net_bt, 2) AS order_net_before_tax,
  round(f.order_tax, 2) AS order_tax_amt,
  round(f.order_net, 2) AS order_net_amt,
  round(CASE WHEN f.order_gross IS NULL OR f.order_gross = 0 THEN 0
        ELSE round(CAST(round(CAST(f.order_discount AS DOUBLE) / CAST(f.order_gross AS DOUBLE), 6) AS DECIMAL(18,6)) * 100, 2) END, 2) AS order_discount_pct_effective,
  round(CASE WHEN f.order_net_bt IS NULL OR f.order_net_bt = 0 THEN 0
        ELSE round(CAST(round(CAST(f.order_tax AS DOUBLE) / CAST(f.order_net_bt AS DOUBLE), 6) AS DECIMAL(18,6)) * 100, 2) END, 2) AS order_vat_pct_effective,
  round(f.vat_pct_src, 2) AS vat_pct_src,
  ao.area AS ship_area, ao.town AS ship_town, ao.region_id AS ship_region_id,
  ao.country_code AS ship_country_code, ao.address_display AS ship_address_display,
  ao.building AS ship_building, ao.apartment_number AS ship_apartment_number,
  ao.street_name AS ship_street_name, ao.landmark AS ship_landmark,
  ao.email AS ship_email, ao.phone AS ship_phone,
  CAST(ao.latitude AS DOUBLE) AS ship_latitude,
  CAST(ao.longitude AS DOUBLE) AS ship_longitude,
  TIMESTAMP '2024-06-02 00:00:00' AS _calculated_at
FROM joined f
LEFT JOIN addr_at_order ao ON ao.order_id = f.order_id
"""


_FCT_O_STR = [
    "order_sk", "order_id", "customer_id", "created_at_local",
    "created_at_utc", "order_date", "order_date_local",
]
_FCT_O_MONEY = [
    "order_gross", "order_discount_amt", "order_net_before_tax",
    "order_tax_amt", "order_net_amt", "order_discount_pct_effective",
    "order_vat_pct_effective", "vat_pct_src",
]
_FCT_O_SHIP = [
    "ship_area", "ship_town", "ship_region_id", "ship_country_code",
    "ship_address_display", "ship_building", "ship_apartment_number",
    "ship_street_name", "ship_landmark", "ship_email", "ship_phone",
]


@query(
    "model__fct_orders",
    section="model A1 J2 J3 J6 W4 F7 S6 (ref fct_orders.sql:1-215, as-of address join)",
    oracle=f"""
SELECT {", ".join(_FCT_O_STR)},
  CAST(item_count AS BIGINT) AS item_count,
  CAST(distinct_products AS BIGINT) AS distinct_products,
  {", ".join(f"CAST({c} AS DOUBLE) AS {c}" for c in _FCT_O_MONEY)},
  {", ".join(_FCT_O_SHIP)},
  CAST(ship_latitude AS DOUBLE) AS ship_latitude,
  CAST(ship_longitude AS DOUBLE) AS ship_longitude,
  _calculated_at
FROM ({_SQL_FCT_ORDERS})
""",
)
def model_fct_orders(spark, sf_dir):
    df = _runner(spark).ref("fct_orders")
    return df.select(
        *_FCT_O_STR,
        F.col("item_count").cast("long").alias("item_count"),
        F.col("distinct_products").cast("long").alias("distinct_products"),
        *_dbl(*_FCT_O_MONEY),
        *_FCT_O_SHIP,
        *_dbl("ship_latitude", "ship_longitude"),
        "_calculated_at",
    )


@query(
    "model__fct_customers",
    section="model A2 J4 F7 (ref fct_customers.sql:1-47, SK-join parity check)",
    oracle=f"""
WITH o AS (
  SELECT order_sk, order_id, order_date_local,
    CAST(order_net_amt AS DECIMAL(18,6)) AS order_net_amt
  FROM ({_SQL_FCT_ORDERS})
), d AS (
  SELECT {_SK.format("order_id")} AS order_sk, customer_id
  FROM ({_SQL_STG_ORDERS})
), base AS (
  SELECT d.customer_id, o.order_id, o.order_date_local, o.order_net_amt
  FROM o JOIN d USING (order_sk)
  WHERE d.customer_id IS NOT NULL
)
SELECT customer_id,
  CAST(COUNT(DISTINCT order_id) AS BIGINT) AS frequency,
  CAST(SUM(coalesce(order_net_amt, 0)) AS DOUBLE) AS ltv,
  round(CAST(SUM(coalesce(order_net_amt, 0)) AS DOUBLE) / COUNT(*), 6) AS avg_order_value,
  MIN(order_date_local) AS first_order_date,
  MAX(order_date_local) AS last_order_date,
  CAST(date_diff('day', MAX(order_date_local), DATE '2024-06-02') AS BIGINT) AS days_since_last_order
FROM base GROUP BY customer_id
""",
)
def model_fct_customers(spark, sf_dir):
    # avg re-expressed as exact-sum/count (see cohort entry note); the
    # model's F.avg over decimal is validated structurally in pytest
    r = _runner(spark)
    o = r.ref("fct_orders").select(
        "order_sk", "order_id", "order_date_local",
        F.col("order_net_amt").cast("decimal(18,6)").alias("order_net_amt"),
    )
    d = r.ref("dim_orders").select("order_sk", "customer_id")
    base = o.join(d, on="order_sk").filter(F.col("customer_id").isNotNull())
    return base.groupBy("customer_id").agg(
        F.countDistinct("order_id").alias("frequency"),
        F.sum(F.coalesce("order_net_amt", F.lit(0))).cast("double").alias("ltv"),
        F.round(
            F.sum(F.coalesce("order_net_amt", F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_order_value"),
        F.min("order_date_local").alias("first_order_date"),
        F.max("order_date_local").alias("last_order_date"),
        F.datediff(F.lit("2024-06-02").cast("date"), F.max("order_date_local"))
        .cast("long")
        .alias("days_since_last_order"),
    )


# ---------------------------------------------------------------------------
# part 4: §2.10 stub-completion dims/aggregates (reference declares these as
# 0-byte model files; completions are natural derivations from staging, so
# the oracles below define-and-check our own semantics rather than port
# reference SQL — see marts.py §2.10 docstrings)
# ---------------------------------------------------------------------------


@query(
    "model__dim_date",
    section="model §2.10 dim_date (ref dims/dim_date.sql: empty stub)",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(CAST(created_at_local AS DATE)) AS lo,
         MAX(CAST(created_at_local AS DATE)) AS hi
  FROM ({_SQL_STG_ORDERS})
), days AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date_day
  FROM bounds
)
SELECT date_day,
  CAST(year(date_day) AS BIGINT) AS year,
  CAST(quarter(date_day) AS BIGINT) AS quarter,
  CAST(month(date_day) AS BIGINT) AS month,
  CAST(dayofmonth(date_day) AS BIGINT) AS day_of_month,
  CAST(dayofweek(date_day) + 1 AS BIGINT) AS day_of_week,
  dayname(date_day) AS day_name,
  CAST(date_trunc('month', date_day) AS DATE) AS month_start,
  dayofweek(date_day) IN (0, 6) AS is_weekend
FROM days
""",
)
def model_dim_date(spark, sf_dir):
    df = _runner(spark).ref("dim_date")
    ints = ["year", "quarter", "month", "day_of_month", "day_of_week"]
    return df.select(
        "date_day",
        *[F.col(c).cast("long").alias(c) for c in ints],
        "day_name", "month_start", "is_weekend",
    )


@query(
    "model__dim_product",
    section="model §2.10 dim_product (ref dims/dim_product.sql: empty stub)",
    oracle=f"""
WITH details AS ({_SQL_STG_PRODUCT_DETAILS}),
names AS (
  SELECT product_id, detail_content AS product_name FROM details
  WHERE lower(detail_type) = 'name'
  QUALIFY row_number() OVER (
    PARTITION BY product_id
    ORDER BY created_at DESC NULLS LAST, detail_content DESC NULLS LAST
  ) = 1
), base AS (SELECT DISTINCT product_id FROM details)
SELECT {_SK.format("product_id")} AS product_key, product_id, product_name
FROM base LEFT JOIN names USING (product_id)
""",
)
def model_dim_product(spark, sf_dir):
    return _runner(spark).ref("dim_product")


# Full DuckDB port of the free-text HH:MM slot miner (staging.py
# stg_delivery_slots; ref models/staging/stg_delivery_slots.sql).
# Occurrence-indexed regexp_substr becomes regexp_extract_all(...)[n]
# (1-indexed, NULL past the end — same as Spark's no-match null).
_SQL_STG_DELIVERY_SLOTS = f"""
WITH raw AS (
  SELECT DISTINCT lower(trim(regexp_replace(
      replace(replace(CAST(DELIVERY_TIME AS VARCHAR), '–', '-'), '—', '-'),
      '\\s+', ' ', 'g'))) AS slot_txt
  FROM {_b("transactions")}
  WHERE DELIVERY_TIME IS NOT NULL
    AND trim(CAST(DELIVERY_TIME AS VARCHAR)) <> ''
), parsed AS (
  SELECT slot_txt,
    slot_txt LIKE '%am%' AS has_am,
    slot_txt LIKE '%pm%' AS has_pm,
    slot_txt LIKE '%morning%' AS has_morning,
    slot_txt LIKE '%afternoon%' AS has_afternoon,
    slot_txt LIKE '%evening%' AS has_evening,
    TRY_CAST(regexp_extract_all(slot_txt, '[0-9]{{1,2}}')[1] AS INT) AS t1_hh_raw,
    TRY_CAST(regexp_extract_all(slot_txt, '[0-9]{{1,2}}')[2] AS INT) AS t2_hh_raw,
    regexp_extract_all(slot_txt, ':([0-9]{{2}})', 1)[1] AS t1_mm_raw,
    regexp_extract_all(slot_txt, ':([0-9]{{2}})', 1)[2] AS t2_mm_raw
  FROM raw
), calc AS (
  SELECT slot_txt, has_am, has_pm,
    coalesce(t1_hh_raw, 0) AS t1_hh_raw,
    coalesce(t2_hh_raw, 0) AS t2_hh_raw,
    coalesce(t1_mm_raw, '00') AS t1_mm_raw,
    coalesce(t2_mm_raw, '00') AS t2_mm_raw,
    CASE WHEN has_am AND NOT has_pm THEN 'am'
         WHEN has_pm AND NOT has_am THEN 'pm'
         WHEN has_morning THEN 'am'
         WHEN has_evening OR has_afternoon THEN 'pm' END AS hint
  FROM parsed
), to24 AS (
  SELECT slot_txt, t1_mm_raw, t2_mm_raw,
    lpad(CAST(CASE WHEN hint = 'am' THEN (CASE WHEN t1_hh_raw = 12 THEN 0 ELSE t1_hh_raw END)
              WHEN hint = 'pm' THEN (CASE WHEN t1_hh_raw < 12 THEN t1_hh_raw + 12 ELSE t1_hh_raw END)
              ELSE least(greatest(t1_hh_raw, 0), 23) END AS VARCHAR), 2, '0') AS t1_hh24,
    lpad(CAST(CASE WHEN hint = 'am' THEN (CASE WHEN t2_hh_raw = 12 THEN 0 ELSE t2_hh_raw END)
              WHEN hint = 'pm' THEN (CASE WHEN t2_hh_raw < 12 THEN t2_hh_raw + 12 ELSE t2_hh_raw END)
              ELSE least(greatest(t2_hh_raw, 0), 23) END AS VARCHAR), 2, '0') AS t2_hh24,
    (has_am OR has_pm) AS has_ampm,
    slot_txt LIKE '%min%' AS has_minutes_word
  FROM calc
), canon AS (
  SELECT slot_txt,
    CASE WHEN len(regexp_extract_all(slot_txt, '[0-9]')) >= 2
              AND (has_ampm OR slot_txt LIKE '%:%')
         THEN t1_hh24 || ':' || lpad(t1_mm_raw, 2, '0') || '-'
              || t2_hh24 || ':' || lpad(t2_mm_raw, 2, '0') END AS delivery_slot,
    CASE WHEN regexp_full_match(t1_hh24, '(0[0-9]|1[0-9]|2[0-3]|[0-9])')
         THEN t1_hh24 || ':' || lpad(t1_mm_raw, 2, '0') || ':00' END AS start_time,
    CASE WHEN regexp_full_match(t2_hh24, '(0[0-9]|1[0-9]|2[0-3]|[0-9])')
         THEN t2_hh24 || ':' || lpad(t2_mm_raw, 2, '0') || ':00' END AS end_time
  FROM to24
  WHERE NOT (has_minutes_word AND NOT has_ampm AND strpos(slot_txt, ':') = 0)
)
SELECT {_SK.format("delivery_slot")} AS delivery_slot_id,
  slot_txt, delivery_slot, start_time, end_time,
  CASE WHEN TRY_CAST(substring(start_time, 1, 2) AS INT) BETWEEN 5 AND 11 THEN 'morning'
       WHEN TRY_CAST(substring(start_time, 1, 2) AS INT) BETWEEN 12 AND 16 THEN 'afternoon'
       WHEN TRY_CAST(substring(start_time, 1, 2) AS INT) BETWEEN 17 AND 21 THEN 'evening'
       ELSE 'other' END AS slot_period
FROM canon
"""


@query(
    "model__stg_delivery_slots",
    section="model F1 F2 A8 (ref stg_delivery_slots.sql:1-60, free-text "
    "HH:MM window miner, parse-distinct-then-join-back)",
    oracle=_SQL_STG_DELIVERY_SLOTS,
)
def model_stg_delivery_slots(spark, sf_dir):
    return _runner(spark).ref("stg_delivery_slots")


@query(
    "model__dim_delivery_slot",
    section="model §2.10 dim_delivery_slot (distinct slot dimension over the "
    "mined windows)",
    oracle=f"""
SELECT DISTINCT delivery_slot_id, delivery_slot, start_time, end_time, slot_period
FROM ({_SQL_STG_DELIVERY_SLOTS})
""",
)
def model_dim_delivery_slot(spark, sf_dir):
    return _runner(spark).ref("dim_delivery_slot")


@query(
    "model__dim_device",
    section="model §2.10 dim_device (ref dims/dim_device.sql: empty stub)",
    oracle=f"""
WITH base AS (
  SELECT DISTINCT coalesce(lower(device_type), 'unknown') AS device_type
  FROM ({_SQL_STG_ORDERS})
)
SELECT {_SK.format("device_type")} AS device_key, device_type FROM base
""",
)
def model_dim_device(spark, sf_dir):
    return _runner(spark).ref("dim_device")


@query(
    "model__dim_payment_method",
    section="model §2.10 dim_payment_method (ref dims/dim_payment_method.sql: empty stub)",
    oracle=f"""
WITH base AS (
  SELECT DISTINCT coalesce(lower(CAST(payment_method_raw AS VARCHAR)), 'unknown')
    AS payment_method
  FROM ({_SQL_STG_ORDERS})
)
SELECT {_SK.format("payment_method")} AS payment_method_key, payment_method
FROM base
""",
)
def model_dim_payment_method(spark, sf_dir):
    return _runner(spark).ref("dim_payment_method")


# dim_promo needs the promo-code columns, which the shared stg_orders
# fragment prunes away — replicate just the dedup-then-project core here.
_SQL_PROMO_CODES = f"""
WITH src AS (
  SELECT {_norm_id("CAST(t.ID AS VARCHAR)")} AS order_id,
    CAST(t.COUPON_CODE AS VARCHAR) AS coupon_code,
    CAST(t.FRIENDBUY_CODE AS VARCHAR) AS friendbuy_code,
    CAST(t.GIFT_CARD_CODE AS VARCHAR) AS gift_card_code,
    coalesce(t.DATE_UPDATED - INTERVAL 4 HOUR,
             coalesce(t.TRANSACTION_DATE - INTERVAL 4 HOUR, t._AIRBYTE_EXTRACTED_AT))
      AS _order_rank_ts,
    t._AIRBYTE_EXTRACTED_AT AS _ingested_at
  FROM {_b("transactions")} t
), dedup AS (
  SELECT * FROM src
  QUALIFY row_number() OVER (
    PARTITION BY order_id
    ORDER BY _order_rank_ts DESC NULLS FIRST, _ingested_at DESC NULLS FIRST
  ) = 1
)
SELECT * FROM dedup WHERE order_id IS NOT NULL
"""


@query(
    "model__dim_promo",
    section="model §2.10 dim_promo (ref dims/dim_promo.sql: empty stub)",
    oracle=f"""
WITH o AS ({_SQL_PROMO_CODES}),
codes AS (
  SELECT DISTINCT promo_type, promo_code FROM (
    SELECT 'coupon' AS promo_type, coupon_code AS promo_code FROM o
    UNION ALL SELECT 'friendbuy', friendbuy_code FROM o
    UNION ALL SELECT 'gift_card', gift_card_code FROM o
  ) WHERE promo_code IS NOT NULL
)
SELECT md5(concat_ws('-',
    coalesce(promo_type, '_dbt_utils_surrogate_key_null_'),
    coalesce(promo_code, '_dbt_utils_surrogate_key_null_'))) AS promo_key,
  promo_type, promo_code
FROM codes
""",
)
def model_dim_promo(spark, sf_dir):
    return _runner(spark).ref("dim_promo")


@query(
    "model__dim_address",
    section="model §2.10 dim_address (ref dims/dim_address.sql: empty stub)",
    oracle=f"""
SELECT address_sk, address_id, address_type, full_name, email, phone,
  building, apartment_number, street_name, landmark, area, town, post_code,
  region_id, country_code,
  CAST(latitude AS DOUBLE) AS latitude,
  CAST(longitude AS DOUBLE) AS longitude,
  address_display
FROM ({_SQL_STG_ADDRESSES})
""",
)
def model_dim_address(spark, sf_dir):
    df = _runner(spark).ref("dim_address")
    return df.select(
        "address_sk", "address_id", "address_type", "full_name", "email",
        "phone", "building", "apartment_number", "street_name", "landmark",
        "area", "town", "post_code", "region_id", "country_code",
        *_dbl("latitude", "longitude"),
        "address_display",
    )


@query(
    "model__agg_orders_daily",
    section="model §2.10 agg_orders_daily (ref aggregates/agg_orders_daily.sql: empty stub)",
    oracle=f"""
SELECT order_date_local,
  COUNT(*) AS orders,
  CAST(COUNT(DISTINCT customer_id) AS BIGINT) AS customers,
  CAST(SUM(coalesce(CAST(order_gross AS DECIMAL(18,6)), 0)) AS DOUBLE) AS gross_amount,
  CAST(SUM(coalesce(CAST(order_discount_amt AS DECIMAL(18,6)), 0)) AS DOUBLE) AS discount_amount,
  CAST(SUM(coalesce(CAST(order_tax_amt AS DECIMAL(18,6)), 0)) AS DOUBLE) AS tax_amount,
  CAST(SUM(coalesce(CAST(order_net_amt AS DECIMAL(18,6)), 0)) AS DOUBLE) AS net_amount
FROM ({_SQL_FCT_ORDERS})
GROUP BY order_date_local
""",
)
def model_agg_orders_daily(spark, sf_dir):
    df = _runner(spark).ref("agg_orders_daily")
    return df.select(
        "order_date_local", "orders", "customers",
        *_dbl("gross_amount", "discount_amount", "tax_amount", "net_amount"),
    )


@query(
    "model__agg_items_daily",
    section="model §2.10 agg_items_daily (ref aggregates/agg_items_daily.sql: empty stub)",
    oracle=f"""
SELECT order_date_local, product_id,
  COUNT(*) AS lines,
  CAST(SUM(coalesce(CAST(quantity AS DECIMAL(18,6)), 0)) AS DOUBLE) AS units,
  CAST(SUM(coalesce(CAST(line_gross AS DECIMAL(18,6)), 0)) AS DOUBLE) AS gross_amount,
  CAST(SUM(coalesce(CAST(line_net_amt AS DECIMAL(18,6)), 0)) AS DOUBLE) AS net_amount
FROM ({_SQL_FCT_ORDER_ITEMS})
GROUP BY order_date_local, product_id
""",
)
def model_agg_items_daily(spark, sf_dir):
    df = _runner(spark).ref("agg_items_daily")
    return df.select(
        "order_date_local", "product_id", "lines",
        *_dbl("units", "gross_amount", "net_amount"),
    )
