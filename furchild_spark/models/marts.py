"""GOLD mart models (reference ``models/marts/commerce/**``).

Facts, dims, and the LTV chain re-expressed as DataFrame functions. Every
model cites the reference SQL it reproduces; the decimal(38,6) numeric
domain with re-cast-after-every-step mirrors the reference's overflow/
precision discipline (fct_order_items.sql:7-11,95-126 — SURVEY §7.4 item 1).

Scale notes:
- fact math is all map-side expressions over one scan; the only shuffles
  are the order-level rollup (keyed on order_id) and the as-of address
  window (keyed on order_id) — both AQE-skew-handled.
- incremental facts carry the reference's 7-day lookback predicates with
  the input/output asymmetry preserved (SURVEY §3.2): fct_order_items
  filters input AND output on ingest time; fct_orders filters input on
  item ingest time but output on created_at_utc.
- ``ctx.now()`` is the frozen-clock hook — lookbacks and audit columns are
  deterministic under test (SURVEY §7.4 item 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from furchild_spark.functions import shims as S
from furchild_spark.functions.shims import c100_386, d386, z386
from . import registry

model = registry.model


def _now(ctx):
    ts = ctx.now()
    return F.lit(ts).cast("timestamp") if ts is not None else F.current_timestamp()


def _lookback(ctx, days: int = 7):
    """``dateadd(day, -7, current_timestamp())`` (ref fct_orders.sql:24)."""
    return _now(ctx) - F.expr(f"INTERVAL {days} DAYS")


# ---------------------------------------------------------------------------
# fct_order_items (ref models/marts/commerce/facts/fct_order_items.sql)
# ---------------------------------------------------------------------------

@model(
    materialized="incremental",
    unique_key="order_item_sk",
    partition_by=("order_date_local",),
)
def fct_order_items(ctx) -> DataFrame:
    """Line-level fact in the decimal(38,6) domain
    (ref fct_order_items.sql:1-168).

    The reference's 1-row ``const`` cross join (z386/c100_386,
    :7-11,76) becomes plain literals — Spark folds constants, no join
    needed (SURVEY §2.3 J5).
    """
    items = ctx.ref("stg_order_items")
    if ctx.is_incremental():
        # input-side lookback (ref :40-42)
        items = items.filter(F.col("_ingested_at") >= _lookback(ctx))

    # ---- items: IDs as VARCHAR, numerics to (38,6) (ref :14-43) ----
    items = items.select(
        F.col("order_item_id").cast("string").alias("order_item_id"),
        F.col("order_id").cast("string").alias("order_id"),
        F.col("product_id").cast("string").alias("product_id"),
        "product_name",
        F.col("stock_id").cast("string").alias("stock_id"),
        "stock_name",
        "unit",
        d386("quantity").alias("quantity_raw"),
        d386("price").alias("unit_price_raw"),
        d386("line_amount").alias("line_amount_raw"),
        F.col("has_vat").alias("has_vat_raw"),
        d386("discount_percentage").alias("discount_pct_in_raw"),
        d386("bulk_discount_percentage").alias("bulk_discount_pct_in_raw"),
        # ref :32 upper(coalesce(DISCOUNT_APPLICATION_TYPE,'PERCENTAGE'));
        # staging typed it int (ref stg_order_items.sql:32), so non-null
        # values can never equal 'PERCENTAGE' — faithful quirk: discounts
        # only apply when the application type is NULL.
        F.upper(
            F.coalesce(F.col("discount_application_type").cast("string"), F.lit("PERCENTAGE"))
        ).alias("discount_application_type"),
        d386("friendbuy_discount_percentage").alias("friendbuy_discount_pct_in_raw"),
        F.upper(
            F.coalesce(
                F.col("friendbuy_discount_application_type").cast("string"),
                F.lit("PERCENTAGE"),
            )
        ).alias("friendbuy_discount_application_type"),
        "meal_plan_request_id",
        "_ingested_at",
    )

    # ---- orders: join key VARCHAR, VAT numeric (ref :46-53) ----
    orders = ctx.ref("stg_orders").select(
        F.col("order_id").cast("string").alias("order_id"),
        "created_at_local",
        "created_at_utc",
        d386("vat_percentage").alias("vat_pct_raw"),
    )

    # ---- typed: one numeric domain (ref :56-78) ----
    typed = items.join(orders, on="order_id", how="left").select(
        items["*"],
        # ref :61 — has_vat_raw in (1,'1','true','TRUE'); staging already
        # yields boolean, so truthy == TRUE
        F.when(F.col("has_vat_raw") == True, F.lit(True))  # noqa: E712
        .otherwise(F.lit(False))
        .alias("has_vat"),
        F.coalesce(d386("quantity_raw"), z386()).alias("qty_386"),
        F.coalesce(d386("unit_price_raw"), z386()).alias("price_386"),
        F.coalesce(d386("line_amount_raw"), z386()).alias("line_amount_src_386"),
        F.coalesce(d386("discount_pct_in_raw"), z386()).alias("disc_in_386"),
        F.coalesce(d386("friendbuy_discount_pct_in_raw"), z386()).alias("friendbuy_in_386"),
        F.coalesce(d386("bulk_discount_pct_in_raw"), z386()).alias("bulk_in_386"),
        F.coalesce(d386("vat_pct_raw"), z386()).alias("vat_pct_386"),
        "created_at_local",
        "created_at_utc",
    )

    # ---- pct: accept % inputs only when type is PERCENTAGE (ref :81-88) ----
    pct = typed.select(
        "*",
        F.when(F.col("discount_application_type") == "PERCENTAGE", F.col("disc_in_386"))
        .otherwise(z386())
        .alias("disc_pct_386"),
        F.when(
            F.col("friendbuy_discount_application_type") == "PERCENTAGE",
            F.col("friendbuy_in_386"),
        )
        .otherwise(z386())
        .alias("friendbuy_pct_386"),
        F.col("bulk_in_386").alias("bulk_pct_386"),
    )

    # ---- amt: effective discount pct clamped to [0,100] (ref :91-109) ----
    pct_sum = (
        F.coalesce("disc_pct_386", z386())
        + F.coalesce("friendbuy_pct_386", z386())
        + F.coalesce("bulk_pct_386", z386())
    )
    amt = pct.select(
        "*",
        d386(F.col("qty_386") * F.col("price_386")).alias("line_gross_386"),
        d386(
            F.when(pct_sum < z386(), z386())
            .when(pct_sum > c100_386(), c100_386())
            .otherwise(F.round(pct_sum, 2))
        ).alias("disc_pct_eff_386"),
        d386(
            F.when(F.col("vat_pct_386").isNull(), z386()).otherwise(
                F.col("vat_pct_386") / c100_386()
            )
        ).alias("vat_frac_386"),
    )

    # ---- math1/math: per-step re-cast to (38,6) (ref :112-127) ----
    math1 = amt.select(
        "*",
        d386(F.col("disc_pct_eff_386") / c100_386()).alias("disc_frac_386"),
        d386(
            F.col("line_gross_386")
            - (F.col("line_gross_386") * (F.col("disc_pct_eff_386") / c100_386()))
        ).alias("line_net_bt_386"),
        d386(
            F.col("line_gross_386") * (F.col("disc_pct_eff_386") / c100_386())
        ).alias("line_discount_386"),
    )
    math = math1.select(
        "*",
        d386(
            F.when(F.col("has_vat"), F.col("line_net_bt_386") * F.col("vat_frac_386"))
            .otherwise(z386())
        ).alias("line_tax_386"),
    )

    def r2(c):
        return d386(F.round(F.col(c), 2))

    out = math.select(
        # SKs (ref :131-134) — macro-parity md5 form, shared with fct_orders
        S.surrogate_key("order_id", "product_id", "order_item_id").alias("order_item_sk"),
        S.surrogate_key("order_id").alias("order_sk"),
        "order_item_id", "order_id", "product_id", "product_name",
        "stock_id", "stock_name",
        "created_at_local", "created_at_utc",
        F.to_date("created_at_local").alias("order_date_local"),
        "unit",
        r2("qty_386").alias("quantity"),
        r2("price_386").alias("unit_price"),
        r2("line_amount_src_386").alias("line_amount_raw"),
        r2("line_gross_386").alias("line_gross"),
        r2("disc_pct_eff_386").alias("discount_pct_effective"),
        r2("line_discount_386").alias("line_discount_amt"),
        r2("vat_pct_386").alias("vat_pct"),
        r2("line_tax_386").alias("line_tax_amt"),
        d386(F.round(F.col("line_net_bt_386") + F.col("line_tax_386"), 2)).alias("line_net_amt"),
        "meal_plan_request_id",
        # pin to TIMESTAMP (LTZ): sources may deliver NTZ or LTZ ingest
        # stamps; an incremental table must keep ONE type across runs or
        # parquet schema merge fails
        F.col("_ingested_at").cast("timestamp").alias("_last_ingested_at"),
    )
    if ctx.is_incremental():
        # output-side lookback (ref :166-168)
        out = out.filter(F.col("_last_ingested_at") >= _lookback(ctx))
    return out


# ---------------------------------------------------------------------------
# fct_orders (ref models/marts/commerce/facts/fct_orders.sql)
# ---------------------------------------------------------------------------

@model(
    materialized="incremental", unique_key="order_sk",
    partition_by=("order_date",),
    # dbt model contract (contract: enforced) on the flagship
    # incremental fact — the reference declares its interface at
    # models/marts/commerce/facts/fct_orders.yml:4-16; here the full
    # column set is pinned so BOTH the from-scratch and the incremental
    # branch abort on drift before the merge touches the table
    contract={
        "columns": {
            "order_sk": "string",
            "order_id": "string",
            "customer_id": "string",
            "created_at_local": "timestamp_ntz",
            "created_at_utc": "timestamp",
            "order_date": "date",
            "order_date_local": "date",
            "item_count": "bigint",
            "distinct_products": "bigint",
            "order_gross": "decimal(38,6)",
            "order_discount_amt": "decimal(38,6)",
            "order_net_before_tax": "decimal(38,6)",
            "order_tax_amt": "decimal(38,6)",
            "order_net_amt": "decimal(38,6)",
            "order_discount_pct_effective": "decimal(38,6)",
            "order_vat_pct_effective": "decimal(38,6)",
            "vat_pct_src": "decimal(38,6)",
            "ship_area": "string",
            "ship_town": "string",
            "ship_region_id": "string",
            "ship_country_code": "string",
            "ship_address_display": "string",
            "ship_building": "string",
            "ship_apartment_number": "string",
            "ship_street_name": "string",
            "ship_landmark": "string",
            "ship_email": "string",
            "ship_phone": "string",
            "ship_latitude": "decimal(38,6)",
            "ship_longitude": "decimal(38,6)",
            "_calculated_at": "timestamp",
        },
        "not_null": ["order_sk", "order_id"],
    },
)
def fct_orders(ctx) -> DataFrame:
    """Order-level fact: line rollup + canonical customer + as-of shipping
    address (ref fct_orders.sql:1-215; the as-of join is SURVEY §2.3 J6)."""
    oi = ctx.ref("fct_order_items")
    if ctx.is_incremental():
        # input filtered by ITEM ingest time (ref :23-25) — asymmetric with
        # the output-side created_at_utc filter below (SURVEY §3.2)
        oi = oi.filter(F.col("_last_ingested_at") >= _lookback(ctx))
    oi = oi.select(
        F.col("order_id").cast("string").alias("order_id"),
        "created_at_local", "created_at_utc", "product_id",
        d386("quantity").alias("quantity_386"),
        d386("unit_price").alias("unit_price_386"),
        d386("line_gross").alias("line_gross_386"),
        d386("line_discount_amt").alias("line_discount_386"),
        d386("line_tax_amt").alias("line_tax_386"),
        d386("line_net_amt").alias("line_net_386"),
    )

    # ---- order-level rollup (ref :29-43) ----
    agg = oi.groupBy("order_id").agg(
        F.min("created_at_local").alias("created_at_local"),
        F.min("created_at_utc").alias("created_at_utc"),
        F.count(F.lit(1)).alias("item_count"),
        F.countDistinct("product_id").alias("distinct_products"),
        F.sum(F.coalesce("line_gross_386", z386())).alias("order_gross_386"),
        F.sum(F.coalesce("line_discount_386", z386())).alias("order_discount_386"),
        F.sum(F.coalesce("line_tax_386", z386())).alias("order_tax_386"),
        F.sum(F.coalesce("line_net_386", z386())).alias("order_net_386"),
        (
            F.sum(F.coalesce("line_net_386", z386()))
            - F.sum(F.coalesce("line_tax_386", z386()))
        ).alias("order_net_bt_386"),
    )

    orders = ctx.ref("stg_orders").select(
        F.col("order_id").cast("string").alias("order_id"),
        d386("vat_percentage").alias("vat_pct_src_386"),
    )
    tx = ctx.ref("stg_transactions").select(
        F.col("order_id").cast("string").alias("order_id"),
        F.col("customer_id").cast("string").alias("customer_id"),
    )
    joined = agg.join(orders, on="order_id", how="left").join(
        tx, on="order_id", how="left"
    )

    # ---- address book: USER_ID → CUSTOMER_ID via stg_users (ref :82-111) ----
    sa = ctx.ref("stg_addresses")
    users = ctx.ref("stg_users")
    addr_user = sa.join(
        F.broadcast(users),
        sa["user_id"].cast("string") == users["user_id"].cast("string"),
    ).select(
        # deterministic tiebreak for the as-of window below; the reference
        # window (fct_orders.sql:131-136) orders only by preference+distance,
        # leaving ties unspecified — pinning address_id makes any run (and
        # the oracle) pick the same row without changing specified semantics
        sa["address_id"],
        users["customer_id"],
        F.lower(F.coalesce(sa["address_type"], F.lit("shipping"))).alias("address_type"),
        sa["area"], sa["town"], sa["region_id"], sa["country_code"],
        sa["address_display"], sa["building"], sa["apartment_number"],
        sa["street_name"], sa["landmark"], sa["email"], sa["phone"],
        d386(sa["latitude"]).alias("latitude"),
        d386(sa["longitude"]).alias("longitude"),
        F.coalesce(sa["updated_at"], sa["_src_extracted_at"]).alias("address_ts"),
    )

    # ---- best shipping address at order time (ref :115-141, J6/W4) ----
    ob = joined.select("order_id", "customer_id", "created_at_utc")
    au = addr_user.filter(F.col("address_type") == "shipping")
    cand = ob.join(au, on="customer_id", how="left")
    pref = F.when(
        F.col("address_ts").isNotNull()
        & (F.col("address_ts") <= F.col("created_at_utc")),
        F.lit(0),
    ).otherwise(F.lit(1))
    prox = F.abs(
        S.sf_datediff_second(
            F.coalesce("address_ts", "created_at_utc"), F.col("created_at_utc")
        )
    )
    w = Window.partitionBy("order_id").orderBy(
        pref.asc(), prox.asc(), F.asc_nulls_last("address_id")
    )
    addr_at_order = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "order_id", "area", "town", "region_id", "country_code",
            "address_display", "building", "apartment_number", "street_name",
            "landmark", "email", "phone", "latitude", "longitude",
        )
    )

    # ---- derived percentages with div-by-zero guards (ref :144-160) ----
    finalized = joined.select(
        "*",
        d386(
            F.when(
                F.col("order_gross_386").isNull() | (F.col("order_gross_386") == z386()),
                z386(),
            ).otherwise(
                F.round((F.col("order_discount_386") / F.col("order_gross_386")) * c100_386(), 2)
            )
        ).alias("order_discount_pct_386"),
        d386(
            F.when(
                F.col("order_net_bt_386").isNull() | (F.col("order_net_bt_386") == z386()),
                z386(),
            ).otherwise(
                F.round((F.col("order_tax_386") / F.col("order_net_bt_386")) * c100_386(), 2)
            )
        ).alias("order_vat_pct_eff_386"),
    )

    def r2(c):
        return d386(F.round(F.col(c), 2))

    out = finalized.join(addr_at_order, on="order_id", how="left").select(
        S.surrogate_key(finalized["order_id"]).alias("order_sk"),
        finalized["order_id"], "customer_id",
        "created_at_local", "created_at_utc",
        F.to_date("created_at_utc").alias("order_date"),
        F.to_date("created_at_local").alias("order_date_local"),
        "item_count", "distinct_products",
        r2("order_gross_386").alias("order_gross"),
        r2("order_discount_386").alias("order_discount_amt"),
        r2("order_net_bt_386").alias("order_net_before_tax"),
        r2("order_tax_386").alias("order_tax_amt"),
        r2("order_net_386").alias("order_net_amt"),
        r2("order_discount_pct_386").alias("order_discount_pct_effective"),
        r2("order_vat_pct_eff_386").alias("order_vat_pct_effective"),
        r2("vat_pct_src_386").alias("vat_pct_src"),
        F.col("area").alias("ship_area"),
        F.col("town").alias("ship_town"),
        F.col("region_id").alias("ship_region_id"),
        F.col("country_code").alias("ship_country_code"),
        F.col("address_display").alias("ship_address_display"),
        F.col("building").alias("ship_building"),
        F.col("apartment_number").alias("ship_apartment_number"),
        F.col("street_name").alias("ship_street_name"),
        F.col("landmark").alias("ship_landmark"),
        F.col("email").alias("ship_email"),
        F.col("phone").alias("ship_phone"),
        F.col("latitude").alias("ship_latitude"),
        F.col("longitude").alias("ship_longitude"),
        _now(ctx).alias("_calculated_at"),
    )
    if ctx.is_incremental():
        # output filtered by ORDER time, not ingest time (ref :213-215)
        out = out.filter(F.col("created_at_utc") >= _lookback(ctx))
    return out


# ---------------------------------------------------------------------------
# dim_orders (ref models/marts/commerce/dims/dim_orders.sql)
# ---------------------------------------------------------------------------

@model(
    materialized="table",
    unique_key="order_sk",
    # dbt model contract (contract: enforced): the reference declares
    # every column of this dim (models/marts/commerce/dims/
    # dim_orders.yml:8-43) — the dim is a stable consumer interface, so
    # additive/typed drift must abort the build, not surprise a report
    contract={
        "columns": {
            "order_sk": "string",
            "order_id": "string",
            "customer_id": "string",
            "created_at_local": "timestamp_ntz",
            "created_at_utc": "timestamp",
            "order_date_local": "date",
            "is_first_order": "boolean",
            "order_rank_for_customer": "int",
        },
        "not_null": ["order_sk", "order_id"],
    },
)
def dim_orders(ctx) -> DataFrame:
    """Order dim with customer-lifecycle rank (ref dim_orders.sql:7-74)."""
    src = ctx.ref("stg_orders").select(
        F.col("order_id").cast("string").alias("order_id"),
        F.col("customer_id").cast("string").alias("customer_id"),
        "created_at_local", "created_at_utc",
    )
    w = Window.partitionBy("customer_id").orderBy(
        F.asc("created_at_utc"), F.asc("order_id")
    )
    ranked = src.withColumn("order_rank_for_customer", F.row_number().over(w))
    return ranked.select(
        S.surrogate_key("order_id").alias("order_sk"),
        "order_id", "customer_id", "created_at_local", "created_at_utc",
        F.to_date("created_at_local").alias("order_date_local"),
        (F.col("order_rank_for_customer") == 1).alias("is_first_order"),
        "order_rank_for_customer",
    )


# ---------------------------------------------------------------------------
# dim_customer (ref models/marts/commerce/dims/dim_customer.sql)
# ---------------------------------------------------------------------------

@model(materialized="table", unique_key="customer_key")
def dim_customer(ctx) -> DataFrame:
    """Cleaned customer dim (ref dim_customer.sql:12-85): keep-latest per
    id, email/phone preference chains, and the case-insensitive
    'Furchild:' name strip — Snowflake's 6-arg regexp_replace with the 'i'
    parameter becomes an inline (?i) flag (SURVEY §2.7 regex table)."""
    src = ctx.ref("stg_customers").filter(F.col("customer_id").isNotNull()).select(
        F.col("customer_id").cast("string").alias("customer_id"),
        F.trim("customer_name").alias("customer_name_raw"),
        F.lower(F.trim("email_primary")).alias("email_primary"),
        F.lower(F.trim("email_other")).alias("email_other"),
        F.trim("phone_primary").alias("phone_primary"),
        F.trim("phone_secondary").alias("phone_secondary"),
        F.trim("phone_formatted").alias("phone_formatted"),
        "created_at", "updated_at",
    )
    ranked = S.dedup_keep_latest(
        src,
        "customer_id",
        [F.desc_nulls_last("updated_at"), F.desc_nulls_last("created_at")],
    )
    phone_pref = F.coalesce("phone_primary", "phone_secondary", "phone_formatted")
    cleaned = ranked.select(
        "customer_id",
        F.coalesce("email_primary", "email_other").alias("email"),
        F.when(phone_pref.isNull(), F.lit(None).cast("string"))
        .otherwise(F.regexp_replace(phone_pref, r"\+", ""))
        .alias("phone"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("customer_name_raw"), "(?i)Furchild:.*$", ""),
                r"\s*[-–:]+\s*$",
                "",
            )
        ).alias("full_name"),
        "created_at", "updated_at",
    )
    return cleaned.select(
        S.surrogate_key("customer_id").alias("customer_key"),
        "customer_id", "email", "phone", "full_name", "created_at", "updated_at",
    )


# ---------------------------------------------------------------------------
# fct_customers (ref models/marts/commerce/facts/fct_customers.sql)
# ---------------------------------------------------------------------------

@model(materialized="table", unique_key="customer_id")
def fct_customers(ctx) -> DataFrame:
    """Customer KPI fact via the order_sk join — the cross-model SK-parity
    check (ref fct_customers.sql:6-47; SURVEY §7.4 item 6)."""
    o = ctx.ref("fct_orders").select("order_sk", "order_id", "order_date_local", "order_net_amt")
    d = ctx.ref("dim_orders").select("order_sk", "customer_id", "is_first_order")
    base = (
        o.join(d, on="order_sk")
        .filter(F.col("customer_id").isNotNull())
    )
    agg = base.groupBy("customer_id").agg(
        F.countDistinct("order_id").alias("order_count"),
        F.sum(F.coalesce("order_net_amt", z386())).alias("ltv"),
        F.avg(F.coalesce("order_net_amt", z386())).alias("avg_order_value"),
        F.max("order_date_local").alias("last_order_date"),
        F.min("order_date_local").alias("first_order_date"),
    )
    return agg.select(
        "customer_id",
        F.col("order_count").alias("frequency"),
        "ltv", "avg_order_value", "first_order_date", "last_order_date",
        S.sf_datediff_day(F.col("last_order_date"), _now(ctx).cast("date"))
        .alias("days_since_last_order"),
    )


# ---------------------------------------------------------------------------
# revenue / LTV chain (ref fct_orders_revenue.sql → cohort_revenue_ltv.sql)
# ---------------------------------------------------------------------------

@model(materialized="table")
def fct_orders_revenue(ctx) -> DataFrame:
    """Ex-VAT revenue per order (ref fct_orders_revenue.sql:1-23)."""
    items = (
        ctx.ref("stg_items")
        .groupBy("transaction_id")
        .agg(
            F.sum(
                F.col("realized_unit_price_ex_vat") * F.col("quantity")
            ).alias("order_revenue_ex_vat")
        )
    )
    o = ctx.ref("stg_orders")
    return (
        o.join(items, o["order_id"] == items["transaction_id"])
        .filter(F.col("customer_id").isNotNull() & F.col("created_at_local").isNotNull())
        .select(
            "customer_id",
            "order_id",
            F.to_date("created_at_local").alias("order_date"),
            F.lit("unknown").alias("channel"),
            "order_revenue_ex_vat",
        )
    )


@model(materialized="table")
def fct_customer_monthly_revenue(ctx) -> DataFrame:
    """Monthly revenue + months-since-acquisition
    (ref fct_customer_monthly_revenue.sql:1-32)."""
    o = ctx.ref("fct_orders_revenue").select(
        "customer_id", "order_date", "order_revenue_ex_vat"
    )
    firsts = o.groupBy("customer_id").agg(F.min("order_date").alias("first_order_date"))
    by_month = o.groupBy(
        "customer_id",
        F.trunc("order_date", "month").alias("month_start"),
    ).agg(F.sum("order_revenue_ex_vat").alias("month_revenue"))
    joined = by_month.join(firsts, on="customer_id").select(
        "customer_id",
        "first_order_date",
        "month_start",
        S.sf_datediff_month(
            F.trunc("first_order_date", "month"), F.col("month_start")
        ).alias("months_since_acq"),
        "month_revenue",
    )
    return joined.filter(F.col("months_since_acq") >= 0)


@model(materialized="table")
def customer_revenue_ltv(ctx) -> DataFrame:
    """6/12/24-month conditional LTV windows (ref customer_revenue_ltv.sql:1-36)."""
    m = ctx.ref("fct_customer_monthly_revenue")
    roll = m.groupBy("customer_id", "first_order_date").agg(
        F.sum(
            F.when(F.col("months_since_acq").between(0, 5), F.col("month_revenue"))
        ).alias("ltv_revenue_6m"),
        F.sum(
            F.when(F.col("months_since_acq").between(0, 11), F.col("month_revenue"))
        ).alias("ltv_revenue_12m"),
        F.sum(
            F.when(F.col("months_since_acq").between(0, 23), F.col("month_revenue"))
        ).alias("ltv_revenue_24m"),
    )
    fr = ctx.ref("fct_orders_revenue")
    orders_cnt = fr.groupBy("customer_id").agg(F.count(F.lit(1)).alias("orders_count"))
    rev_to_date = fr.groupBy("customer_id").agg(
        F.sum("order_revenue_ex_vat").alias("revenue_to_date")
    )
    return (
        roll.join(orders_cnt, on="customer_id", how="left")
        .join(rev_to_date, on="customer_id", how="left")
        .select(
            "customer_id",
            "first_order_date",
            F.coalesce("orders_count", F.lit(0)).alias("orders_count"),
            # int-0 literals: coalesce(decimal, double-0.0) would silently
            # promote the whole column to double and break exact-sum parity
            F.coalesce("revenue_to_date", F.lit(0)).alias("revenue_to_date"),
            F.coalesce("ltv_revenue_6m", F.lit(0)).alias("ltv_revenue_6m"),
            F.coalesce("ltv_revenue_12m", F.lit(0)).alias("ltv_revenue_12m"),
            F.coalesce("ltv_revenue_24m", F.lit(0)).alias("ltv_revenue_24m"),
        )
    )


@model(materialized="table")
def cohort_revenue_ltv(ctx) -> DataFrame:
    """Cohort stats with EXACT percentiles (ref cohort_revenue_ltv.sql:1-19;
    F.percentile, never percentile_approx — SURVEY §2.4 A6)."""
    c = ctx.ref("customer_revenue_ltv").select(
        "customer_id",
        F.trunc("first_order_date", "month").alias("cohort_month"),
        "ltv_revenue_6m", "ltv_revenue_12m", "ltv_revenue_24m",
    )
    return c.groupBy("cohort_month").agg(
        F.countDistinct("customer_id").alias("customers"),
        F.avg("ltv_revenue_6m").alias("avg_ltv_6m"),
        F.avg("ltv_revenue_12m").alias("avg_ltv_12m"),
        F.avg("ltv_revenue_24m").alias("avg_ltv_24m"),
        F.percentile("ltv_revenue_12m", F.lit(0.5)).alias("p50_ltv_12m"),
        F.percentile("ltv_revenue_12m", F.lit(0.75)).alias("p75_ltv_12m"),
    )


@model(materialized="table")
def first_channel_ltv(ctx) -> DataFrame:
    """First-touch channel attribution LTV (ref first_channel_ltv.sql:1-26)."""
    o = ctx.ref("stg_orders").filter(F.col("customer_id").isNotNull())
    w = Window.partitionBy("customer_id").orderBy(F.asc("order_dt"), F.asc("order_id"))
    first_order = (
        o.select(
            "customer_id",
            "order_id",
            F.to_date("created_at_local").alias("order_dt"),
            F.coalesce("device_type", F.lit("unknown")).alias("channel_dim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    c = ctx.ref("customer_revenue_ltv")
    return (
        first_order.join(c, on="customer_id")
        .groupBy(F.col("channel_dim").alias("channel"))
        .agg(
            F.countDistinct("customer_id").alias("customers"),
            F.round(F.avg("ltv_revenue_12m"), 0).alias("ltv12_avg"),
            F.round(F.percentile("ltv_revenue_12m", F.lit(0.5)), 0).alias("ltv12_p50"),
            F.round(F.avg("ltv_revenue_24m"), 0).alias("ltv24_avg"),
        )
        .orderBy(F.desc("ltv12_avg"))
    )


# ---------------------------------------------------------------------------
# §2.10 stub-completion models — the reference declares these as 0-byte
# files (dims/aggregates); built as natural completions from staging, NOT
# oracle-checked against reference SQL (none exists).
# ---------------------------------------------------------------------------

@model(materialized="table", unique_key="date_day")
def dim_date(ctx) -> DataFrame:
    """Calendar dim spanning observed order dates (ref dims/dim_date.sql:
    declared empty — natural completion)."""
    o = ctx.ref("stg_orders")
    bounds = o.agg(
        F.min(F.to_date("created_at_local")).alias("lo"),
        F.max(F.to_date("created_at_local")).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("date_day")
    )
    return days.select(
        "date_day",
        F.year("date_day").alias("year"),
        F.quarter("date_day").alias("quarter"),
        F.month("date_day").alias("month"),
        F.dayofmonth("date_day").alias("day_of_month"),
        F.dayofweek("date_day").alias("day_of_week"),
        F.date_format("date_day", "EEEE").alias("day_name"),
        F.trunc("date_day", "month").alias("month_start"),
        (F.dayofweek("date_day").isin(1, 7)).alias("is_weekend"),
    )


@model(materialized="table", unique_key="product_id")
def dim_product(ctx) -> DataFrame:
    """Product dim from stg_product_* (ref dims/dim_product.sql: empty)."""
    details = ctx.ref("stg_product_details")
    # detail_content tiebreak: created_at alone can tie (it's a per-batch
    # string timestamp) and the stub has no reference ordering to match —
    # a total order keeps the surviving name engine-independent
    names = S.dedup_keep_latest(
        details.filter(F.lower("detail_type") == "name"),
        "product_id",
        [F.desc_nulls_last("created_at"), F.desc_nulls_last("detail_content")],
    ).select("product_id", F.col("detail_content").alias("product_name"))
    base = details.select("product_id").distinct()
    return base.join(names, on="product_id", how="left").select(
        S.surrogate_key("product_id").alias("product_key"),
        "product_id",
        "product_name",
    )


@model(materialized="table", unique_key="delivery_slot_id")
def dim_delivery_slot(ctx) -> DataFrame:
    """(ref dims/dim_delivery_slot.sql: empty) ← stg_delivery_slots."""
    return ctx.ref("stg_delivery_slots").select(
        "delivery_slot_id", "delivery_slot", "start_time", "end_time", "slot_period"
    ).distinct()


@model(materialized="table", unique_key="device_type")
def dim_device(ctx) -> DataFrame:
    """(ref dims/dim_device.sql: empty) ← stg_orders.device_type."""
    return (
        ctx.ref("stg_orders")
        .select(F.coalesce(F.lower("device_type"), F.lit("unknown")).alias("device_type"))
        .distinct()
        .select(S.surrogate_key("device_type").alias("device_key"), "device_type")
    )


@model(materialized="table", unique_key="payment_method")
def dim_payment_method(ctx) -> DataFrame:
    """(ref dims/dim_payment_method.sql: empty) ← stg_orders.payment_method_raw."""
    return (
        ctx.ref("stg_orders")
        .select(
            F.coalesce(F.lower(F.col("payment_method_raw").cast("string")), F.lit("unknown"))
            .alias("payment_method")
        )
        .distinct()
        .select(S.surrogate_key("payment_method").alias("payment_method_key"), "payment_method")
    )


@model(materialized="table", unique_key="promo_key")
def dim_promo(ctx) -> DataFrame:
    """(ref dims/dim_promo.sql: empty) ← coupon/friendbuy/gift-card codes."""
    o = ctx.ref("stg_orders")
    codes = (
        o.select(F.lit("coupon").alias("promo_type"), F.col("coupon_code").alias("promo_code"))
        .unionByName(o.select(F.lit("friendbuy").alias("promo_type"), F.col("friendbuy_code").alias("promo_code")))
        .unionByName(o.select(F.lit("gift_card").alias("promo_type"), F.col("gift_card_code").alias("promo_code")))
        .filter(F.col("promo_code").isNotNull())
        .distinct()
    )
    return codes.select(
        S.surrogate_key("promo_type", "promo_code").alias("promo_key"),
        "promo_type", "promo_code",
    )


@model(materialized="table", unique_key="address_sk")
def dim_address(ctx) -> DataFrame:
    """(ref dims/dim_address.sql: empty) ← stg_addresses."""
    return ctx.ref("stg_addresses").select(
        "address_sk", "address_id", "address_type", "full_name", "email",
        "phone", "building", "apartment_number", "street_name", "landmark",
        "area", "town", "post_code", "region_id", "country_code",
        "latitude", "longitude", "address_display",
    )


@model(materialized="table", unique_key="order_date_local",
       tags=("nightly", "aggregate"), group="reporting")
def agg_orders_daily(ctx) -> DataFrame:
    """(ref aggregates/agg_orders_daily.sql: empty) daily order rollup."""
    o = ctx.ref("fct_orders")
    return o.groupBy("order_date_local").agg(
        F.count(F.lit(1)).alias("orders"),
        F.countDistinct("customer_id").alias("customers"),
        F.sum(F.coalesce("order_gross", z386())).alias("gross_amount"),
        F.sum(F.coalesce("order_discount_amt", z386())).alias("discount_amount"),
        F.sum(F.coalesce("order_tax_amt", z386())).alias("tax_amount"),
        F.sum(F.coalesce("order_net_amt", z386())).alias("net_amount"),
    )


@model(materialized="table", tags=("nightly", "aggregate"),
       group="reporting")
def agg_items_daily(ctx) -> DataFrame:
    """(ref aggregates/agg_items_daily.sql: empty) daily line rollup."""
    oi = ctx.ref("fct_order_items")
    return oi.groupBy("order_date_local", "product_id").agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum(F.coalesce("quantity", z386())).alias("units"),
        F.sum(F.coalesce("line_gross", z386())).alias("gross_amount"),
        F.sum(F.coalesce("line_net_amt", z386())).alias("net_amount"),
    )


# ---------------------------------------------------------------------------
# exposures (dbt exposures: declared downstream consumers in the DAG)
# ---------------------------------------------------------------------------
# The reference project ships no exposures: declarations, but these are the
# consumers its marts exist for — a revenue dashboard over the fact/dim
# layer and the LTV model training job. They never build; they give
# lineage a "who breaks downstream" answer, appear in ls/dag/docs, and
# make `--models exposure:NAME` / `+exposure:NAME` selections work.

registry.exposure(
    "orders_dashboard", "dashboard",
    depends_on=("fct_orders", "dim_orders", "fct_customers"),
    owner="analytics",
    description="Revenue and fulfillment dashboard over the core marts.",
)
registry.exposure(
    "ltv_model", "ml",
    depends_on=("cohort_revenue_ltv", "first_channel_ltv"),
    owner="data-science",
    description="Customer-LTV training job consuming the LTV chain.",
)
