"""SILVER staging models (reference ``models/staging/*.sql``).

Each function reproduces one reference model's semantics with DataFrame
ops — cast/rename projections, empty→NULL hygiene, dedup-keep-latest
windows, JSON parsing, and the delivery-slot text parser. Docstrings cite
the reference file the behavior comes from.

Ordering parity note (applies to every dedup window): Snowflake treats
NULL as the *highest* value, so a plain ``DESC`` sorts NULLs first; Spark's
``desc`` is nulls-last. Where the reference writes plain ``desc`` we use
``desc_nulls_first``; where it writes ``desc nulls last`` we use
``desc_nulls_last``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from furchild_spark.functions import shims as S
from . import registry

model = registry.model


# ---------------------------------------------------------------------------
# users / transactions
# ---------------------------------------------------------------------------

@model(materialized="table")
def stg_users(ctx) -> DataFrame:
    """users bridge: app user id → canonical customer id
    (reference models/staging/stg_users.sql:1-4; no config() header, so
    it inherits ``staging: +materialized: table`` from
    dbt_project.yml:18-20 — the YAML agreement test pins this)."""
    return ctx.source("users").select(
        F.col("ID").cast("string").alias("user_id"),
        F.col("CUSTOMER_ACCOUNT_ID").cast("string").alias("customer_id"),
    )


@model(materialized="view")
def stg_transactions(ctx) -> DataFrame:
    """Order headers + canonical customer id + normalized order_id
    (reference models/staging/stg_transactions.sql)."""
    tx = ctx.source("transactions").select(
        F.col("ID").cast("string").alias("raw_order_id"),
        F.to_date("TRANSACTION_DATE").alias("order_date"),
        F.col("USER_ID").cast("string").alias("user_id_raw"),
        F.lower(F.coalesce(F.col("DEVICE_TYPE").cast("string"), F.lit("unknown"))).alias("channel"),
        F.trim(F.upper(F.coalesce(F.col("PAYMENT_STATUS").cast("string"), F.lit("")))).alias("payment_status"),
        F.trim(F.upper(F.coalesce(F.col("DELIVERY_STATUS").cast("string"), F.lit("")))).alias("delivery_status"),
    )
    users = ctx.source("users").select(
        F.col("ID").cast("string").alias("user_id"),
        F.col("CUSTOMER_ACCOUNT_ID").cast("string").alias("customer_id"),
    )
    # users is a small dim at any scale → broadcast (SURVEY §4 small-dim row)
    joined = tx.join(F.broadcast(users), tx.user_id_raw == users.user_id, "left")
    return joined.select(
        S.normalize_order_id("raw_order_id").alias("order_id"),
        "order_date",
        "customer_id",
        "channel",
        "payment_status",
        "delivery_status",
    )


# ---------------------------------------------------------------------------
# delivery slots (the text-parsing machine)
# ---------------------------------------------------------------------------

@model(materialized="table")
def stg_delivery_slots(ctx) -> DataFrame:
    """Mine canonical HH:MM-HH:MM windows out of free-text DELIVERY_TIME
    (reference models/staging/stg_delivery_slots.sql).

    Shape preserved deliberately: parse once over ``distinct`` slot texts,
    then stg_orders joins back — dedup-before-expensive-work (SURVEY §4).
    TIME type: Spark has none; start/end are "HH:mm:ss" strings (SURVEY
    §7.4 item 3) — downstream only ever extracts the hour.
    """
    src = ctx.source("transactions")
    raw = (
        src.filter(
            F.col("DELIVERY_TIME").isNotNull()
            & (F.trim(F.col("DELIVERY_TIME").cast("string")) != "")
        )
        .select(S.normalize_slot_text("DELIVERY_TIME").alias("slot_txt"))
        .distinct()
    )

    parsed = raw.select(
        "slot_txt",
        F.col("slot_txt").like("%am%").alias("has_am"),
        F.col("slot_txt").like("%pm%").alias("has_pm"),
        F.col("slot_txt").like("%morning%").alias("has_morning"),
        F.col("slot_txt").like("%afternoon%").alias("has_afternoon"),
        F.col("slot_txt").like("%evening%").alias("has_evening"),
        S.regexp_substr_occ("slot_txt", r"\d{1,2}", 1).cast("int").alias("t1_hh_raw"),
        S.regexp_substr_occ("slot_txt", r"\d{1,2}", 2).cast("int").alias("t2_hh_raw"),
        S.regexp_substr_occ("slot_txt", r":(\d{2})", 1, group=1).alias("t1_mm_raw"),
        S.regexp_substr_occ("slot_txt", r":(\d{2})", 2, group=1).alias("t2_mm_raw"),
    )

    calc = parsed.select(
        "slot_txt", "has_am", "has_pm", "has_morning", "has_afternoon", "has_evening",
        F.coalesce("t1_hh_raw", F.lit(0)).alias("t1_hh_raw"),
        F.coalesce("t2_hh_raw", F.lit(0)).alias("t2_hh_raw"),
        F.coalesce("t1_mm_raw", F.lit("00")).alias("t1_mm_raw"),
        F.coalesce("t2_mm_raw", F.lit("00")).alias("t2_mm_raw"),
        S.iff(
            F.col("has_am") & ~F.col("has_pm"), F.lit("am"),
            S.iff(
                F.col("has_pm") & ~F.col("has_am"), F.lit("pm"),
                S.iff(
                    F.col("has_morning"), F.lit("am"),
                    S.iff(F.col("has_evening") | F.col("has_afternoon"), F.lit("pm"), F.lit(None)),
                ),
            ),
        ).alias("hint"),
    )

    def to24(hh):
        return F.lpad(
            S.iff(
                F.col("hint") == "am", S.iff(hh == 12, F.lit(0), hh),
                S.iff(
                    F.col("hint") == "pm", S.iff(hh < 12, hh + 12, hh),
                    F.least(F.greatest(hh, F.lit(0)), F.lit(23)),
                ),
            ).cast("string"),
            2, "0",
        )

    to24_df = calc.select(
        "slot_txt", "t1_mm_raw", "t2_mm_raw", "hint",
        to24(F.col("t1_hh_raw")).alias("t1_hh24"),
        to24(F.col("t2_hh_raw")).alias("t2_hh24"),
        (F.col("slot_txt").ilike("%am%") | F.col("slot_txt").ilike("%pm%")).alias("has_ampm"),
        F.col("slot_txt").ilike("%min%").alias("has_minutes_word"),
    )

    hh_ok = r"(0\d|1\d|2[0-3]|\d)"  # full-match via sf_regexp_like

    def time_str(hh, mm):
        return S.iff(
            S.sf_regexp_like(hh, hh_ok),
            F.concat(hh, F.lit(":"), F.lpad(mm, 2, "0"), F.lit(":00")),
            F.lit(None).cast("string"),
        )

    canon = (
        to24_df.filter(
            ~(
                F.col("has_minutes_word")
                & ~F.col("has_ampm")
                & (F.instr("slot_txt", ":") == 0)
            )
        ).select(
            "slot_txt",
            F.when(
                (F.regexp_count("slot_txt", F.lit(r"\d")) >= 2)
                & (F.col("has_ampm") | F.col("slot_txt").like("%:%")),
                F.concat(
                    F.col("t1_hh24"), F.lit(":"), F.lpad("t1_mm_raw", 2, "0"),
                    F.lit("-"),
                    F.col("t2_hh24"), F.lit(":"), F.lpad("t2_mm_raw", 2, "0"),
                ),
            ).alias("delivery_slot"),
            time_str(F.col("t1_hh24"), F.col("t1_mm_raw")).alias("start_time"),
            time_str(F.col("t2_hh24"), F.col("t2_mm_raw")).alias("end_time"),
        )
    )

    start_hour = F.substring("start_time", 1, 2).cast("int")
    final = canon.select(
        "slot_txt", "delivery_slot", "start_time", "end_time",
        F.when(start_hour.between(5, 11), "morning")
        .when(start_hour.between(12, 16), "afternoon")
        .when(start_hour.between(17, 21), "evening")
        .otherwise("other")
        .alias("slot_period"),
    )

    return final.select(
        S.surrogate_key("delivery_slot").alias("delivery_slot_id"),
        "slot_txt", "delivery_slot", "start_time", "end_time", "slot_period",
    )


# ---------------------------------------------------------------------------
# orders
# ---------------------------------------------------------------------------

@model(materialized="table")
def stg_orders(ctx) -> DataFrame:
    """Dedup'd, normalized order headers joined to slots + canonical
    customer (reference models/staging/stg_orders.sql)."""
    d182 = "decimal(18,2)"
    src = ctx.source("transactions").select(
        F.col("_AIRBYTE_EXTRACTED_AT").alias("_ingested_at"),
        F.col("ID").cast("string").alias("order_id_raw"),
        F.col("USER_ID").cast("string").alias("user_id_raw"),
        F.col("TRANSACTION_DATE").alias("created_at_local"),
        F.coalesce(
            S.to_utc_from("TRANSACTION_DATE"), F.col("_AIRBYTE_EXTRACTED_AT")
        ).alias("created_at_utc"),
        S.to_utc_from("DATE_UPDATED").alias("updated_at_utc"),
        S.try_to_date("DELIVERY_DATE").alias("expected_delivery_date"),
        S.normalize_slot_text("DELIVERY_TIME").alias("delivery_time_slot_norm"),
        *[
            F.col(c).cast(d182).alias(a)
            for c, a in [
                ("GROSS_AMOUNT", "gross_amount"),
                ("TOTAL_AMOUNT", "total_amount"),
                ("DISCOUNT_AMOUNT", "discount_amount"),
                ("BW_DISCOUNT_AMOUNT", "bw_discount_amount"),
                ("NDC_DISCOUNT_AMOUNT", "ndc_discount_amount"),
                ("BULK_DISCOUNT_AMOUNT", "bulk_discount_amount"),
                ("POINTS_DISCOUNT_AMOUNT", "points_discount_amount"),
                ("SPECIAL_DISCOUNT_AMOUNT", "special_discount_amount"),
                ("GIFT_CARD_AMOUNT_DISCOUNT", "giftcard_discount_amount"),
            ]
        ],
        F.col("VAT_PERCENTAGE").cast("decimal(5,2)").alias("vat_percentage"),
        F.col("PAYMENT_METHOD").alias("payment_method_raw"),
        F.col("PAYMENT_STATUS").alias("payment_status_raw"),
        F.col("DELIVERY_STATUS").alias("delivery_status_raw"),
        *[
            F.col(c).cast("string").alias(a)
            for c, a in [
                ("COUPON_CODE", "coupon_code"),
                ("DEVICE_TYPE", "device_type"),
                ("DELIVERY_OPTION", "delivery_option"),
                ("FRIENDBUY_CODE", "friendbuy_code"),
                ("GIFT_CARD_CODE", "gift_card_code"),
                ("ADDITIONAL_NOTE", "additional_note"),
                ("ZOHO_SO_ID", "zoho_so_id"),
                ("FULL_NAME", "customer_name"),
            ]
        ],
    )

    norm = src.withColumn("order_id", S.normalize_order_id("order_id_raw"))

    slots = ctx.ref("stg_delivery_slots").select(
        "slot_txt", "delivery_slot_id", F.col("delivery_slot").alias("delivery_time_slot")
    )
    # slot dim is tiny (distinct slot texts) → broadcast
    join_slot = norm.join(
        F.broadcast(slots), norm.delivery_time_slot_norm == slots.slot_txt, "left"
    ).drop("slot_txt")

    dedup = S.dedup_keep_latest(
        join_slot,
        "order_id",
        [
            F.coalesce("updated_at_utc", "created_at_utc").desc_nulls_first(),
            F.col("_ingested_at").desc_nulls_first(),
        ],
    )

    tx = ctx.ref("stg_transactions").select("order_id", "customer_id")

    # Parity note — deliberate strict→lenient divergence: the reference's
    # bare `payment_status = 1` (stg_orders.sql:133-140) ERRORS in Snowflake
    # on a non-numeric status string; try_cast maps such rows to 'unknown'
    # instead. Identical results on numeric data (fixture-checked); chosen
    # so one malformed row can't fail a 100 TB batch. Same policy at the
    # HAS_VAT/boolean try_casts in stg_items/stg_customers.
    ps = F.col("payment_status_raw").cast("string").try_cast("decimal(38,6)")
    ds = F.col("delivery_status_raw").cast("string").try_cast("decimal(38,6)")

    clean = (
        dedup.join(tx, "order_id", "left")
        .filter(F.col("order_id").isNotNull())
        .select(
            "order_id",
            "customer_id",
            "created_at_local",
            "created_at_utc",
            "updated_at_utc",
            F.to_date("created_at_local").alias("order_date_local"),
            F.to_date("created_at_utc").alias("order_date_utc"),
            "expected_delivery_date",
            "delivery_slot_id",
            "delivery_time_slot",
            "gross_amount",
            "total_amount",
            "vat_percentage",
            (
                F.coalesce("discount_amount", F.lit(0))
                + F.coalesce("bw_discount_amount", F.lit(0))
                + F.coalesce("ndc_discount_amount", F.lit(0))
                + F.coalesce("bulk_discount_amount", F.lit(0))
                + F.coalesce("points_discount_amount", F.lit(0))
                + F.coalesce("special_discount_amount", F.lit(0))
                + F.coalesce("giftcard_discount_amount", F.lit(0))
            ).alias("discount_total"),
            F.when(ps == 1, "paid").when(ps == 0, "unpaid").otherwise("unknown").alias("payment_status"),
            F.when(ds == 1, "delivered").when(ds == 0, "pending").otherwise("unknown").alias("delivery_status"),
            "payment_method_raw",
            "coupon_code",
            "device_type",
            "delivery_option",
            "friendbuy_code",
            "gift_card_code",
            "additional_note",
            "zoho_so_id",
            "customer_name",
            "_ingested_at",
        )
    )
    return clean


# ---------------------------------------------------------------------------
# order items / items
# ---------------------------------------------------------------------------

@model(materialized="table")
def stg_order_items(ctx) -> DataFrame:
    """Dedup'd order lines (reference models/staging/stg_order_items.sql)."""
    src = ctx.source("transaction_items").select(
        F.col("_AIRBYTE_EXTRACTED_AT").alias("_ingested_at"),
        F.col("ID").cast("string").alias("order_item_id"),
        F.col("TRANSACTION_ID").cast("string").alias("order_id"),
        F.col("PRODUCT_ID").cast("string").alias("product_id"),
        F.col("STOCK_ID").cast("string").alias("stock_id"),
        F.col("PRODUCT_NAME").cast("string").alias("product_name"),
        F.col("UNIT").cast("string").alias("unit"),
        F.col("STOCK_NAME").cast("string").alias("stock_name"),
        F.col("PRICE").cast("decimal(18,2)").alias("price"),
        F.col("QUANTITY").cast("decimal(18,2)").alias("quantity"),
        F.col("HAS_VAT").cast("string").try_cast("boolean").alias("has_vat"),
        F.col("DISCOUNT_PERCENTAGE").cast("decimal(10,2)").alias("discount_percentage"),
        F.col("BULK_DISCOUNT_PERCENTAGE").cast("decimal(10,2)").alias("bulk_discount_percentage"),
        F.col("DISCOUNT_APPLICATION_TYPE").try_cast("int").alias("discount_application_type"),
        F.col("FRIENDBUY_DISCOUNT_PERCENTAGE").cast("decimal(10,2)").alias("friendbuy_discount_percentage"),
        F.col("FRIENDBUY_DISCOUNT_APPLICATION_TYPE").try_cast("int").alias("friendbuy_discount_application_type"),
        F.col("MEAL_PLAN_REQUEST_ID").cast("string").alias("meal_plan_request_id"),
    )
    dedup = S.dedup_keep_latest(
        src, "order_item_id", [F.col("_ingested_at").desc_nulls_first()]
    )
    return dedup.filter(F.col("order_id").isNotNull()).select(
        "order_item_id", "order_id", "product_id", "product_name", "stock_id",
        "stock_name", "unit", "quantity", "price",
        (F.col("quantity") * F.col("price")).alias("line_amount"),
        "has_vat", "discount_percentage", "bulk_discount_percentage",
        "discount_application_type", "friendbuy_discount_percentage",
        "friendbuy_discount_application_type", "meal_plan_request_id",
        "_ingested_at",
    )


@model(
    materialized="table",  # reference: transient table (stg_items.sql:1)
    # dbt model contract (contract: enforced): the reference declares
    # every shipped column for this model (models/staging/schema.yml:
    # 103-137) — name/type drift aborts BEFORE materialization, and the
    # schema.yml not_null tests on the key/quantity/realized-price
    # columns become pre-write constraints
    contract={
        "columns": {
            "transaction_item_id": "string",
            "transaction_id": "string",
            "product_id": "string",
            "product_name": "string",
            "stock_id": "string",
            "stock_name": "string",
            "unit": "string",
            "quantity": "decimal(38,6)",
            "unit_price_ex_vat": "decimal(38,6)",
            "total_discount_pct": "decimal(38,6)",
            "realized_unit_price_ex_vat": "decimal(38,6)",
        },
        "not_null": ["transaction_item_id", "transaction_id"],
    },
)
def stg_items(ctx) -> DataFrame:
    """Realized ex-VAT unit prices (reference models/staging/stg_items.sql).

    ``vat_rate`` comes from vars (reference dbt_project.yml:13, consumed at
    stg_items.sql:30)."""
    vat_rate = ctx.var("vat_rate", 0.05)
    src = ctx.source("transaction_items")
    # Decimal discipline (SURVEY §7.4 item 1, reference stg_items.sql:30-42):
    # Snowflake computes this chain in NUMBER, not double — price, discount
    # fractions, and the realized price stay decimal(38,6) so every
    # downstream revenue sum is EXACT (order-independent), which is what
    # makes the LTV chain reproducible against a SQL oracle at all.
    d386 = "decimal(38,6)"
    one = F.lit(1).cast(d386)
    pct_sum = (
        F.coalesce(F.col("DISCOUNT_PERCENTAGE").cast(d386), F.lit(0).cast(d386))
        + F.coalesce(F.col("BULK_DISCOUNT_PERCENTAGE").cast(d386), F.lit(0).cast(d386))
        + F.coalesce(F.col("FRIENDBUY_DISCOUNT_PERCENTAGE").cast(d386), F.lit(0).cast(d386))
    )
    inner = src.select(
        F.col("ID").cast("string").alias("transaction_item_id"),
        F.trim(F.col("TRANSACTION_ID").cast("string")).alias("transaction_id"),
        F.col("PRODUCT_ID").cast("string").alias("product_id"),
        F.col("PRODUCT_NAME").alias("product_name"),
        F.col("STOCK_ID").cast("string").alias("stock_id"),
        F.col("STOCK_NAME").alias("stock_name"),
        F.col("UNIT").alias("unit"),
        F.col("QUANTITY").cast(d386).alias("quantity"),
        F.when(
            F.col("HAS_VAT").cast("string").try_cast("decimal(38,6)") == 1,
            F.col("PRICE").cast(d386) / F.lit(1 + vat_rate).cast(d386),
        )
        .otherwise(F.col("PRICE").cast(d386))
        .cast(d386)
        .alias("unit_price_ex_vat"),
        # pct/100 as *0.01: an exact decimal scale-shift (no division)
        F.least(
            one,
            F.greatest(
                F.lit(0).cast(d386),
                (pct_sum * F.lit(0.01).cast("decimal(3,2)")).cast(d386),
            ),
        )
        .cast(d386)
        .alias("total_discount_pct"),
    )
    return inner.withColumn(
        "realized_unit_price_ex_vat",
        (F.col("unit_price_ex_vat") * (one - F.col("total_discount_pct"))).cast(d386),
    )


# ---------------------------------------------------------------------------
# customers / addresses
# ---------------------------------------------------------------------------

@model(materialized="table")
def stg_customers(ctx) -> DataFrame:
    """Customer accounts, keep-latest per id, validated geo
    (reference models/staging/stg_customers.sql)."""
    c = ctx.source("customer_accounts")
    src = c.select(
        F.col("_AIRBYTE_EXTRACTED_AT").alias("_ingested_at"),
        F.col("ID").cast("string").alias("customer_id"),
        F.col("ACCOUNT_NAME").cast("string").alias("customer_name"),
        F.col("ACCOUNT_EMAIL_ADDRESS").cast("string").alias("email_primary"),
        F.col("OTHER_EMAIL_ADDRESSES").cast("string").alias("email_other"),
        F.col("T_PHONE_NUMBER").cast("string").alias("phone_primary"),
        F.col("T_SECONDARY_PHONE_NUMBER").cast("string").alias("phone_secondary"),
        F.col("FORMATTED_PHONES").cast("string").alias("phone_formatted"),
        F.col("AREA").cast("string").alias("area"),
        F.col("BUILDING").cast("string").alias("building"),
        F.col("APARTMENT_NUMBER").cast("string").alias("apartment_number"),
        F.col("T_ADDRESS").cast("string").alias("address_text"),
        F.col("ADDRESS_NAME").cast("string").alias("address_name"),
        F.col("LAND_MARK").cast("string").alias("landmark"),
        F.col("T_CITY_ID").cast("string").alias("city_id"),
        F.col("T_COUNTRY").cast("string").alias("country_id"),
        S.try_cast_float("LATITUDE").alias("lat_raw"),
        S.try_cast_float("LONGITUDE").alias("lon_raw"),
        F.col("HAS_STAR").cast("string").try_cast("boolean").alias("has_star"),
        F.col("IS_FRAGILE").cast("string").try_cast("boolean").alias("is_fragile"),
        F.col("IS_INVALID").cast("string").try_cast("boolean").alias("is_invalid"),
        F.col("IS_ONLINE_ONLY").cast("string").try_cast("boolean").alias("is_online_only"),
        F.col("S_PET_NAMES").cast("string").alias("pet_names"),
        F.col("S_PET_OWNER_NAMES").cast("string").alias("pet_owner_names"),
        F.col("S_CONTACT_NAMES").cast("string").alias("contact_names"),
        F.col("ZCRM_ACCOUNT_ID").cast("string").alias("crm_account_id"),
        F.col("ZBOOKS_ACCOUNT_ID").cast("string").alias("books_account_id"),
        F.col("ADMIN_ACCOUNT_ID").cast("string").alias("admin_account_id"),
        F.col("PREV_ADMIN_ACCOUNT_ID").cast("string").alias("prev_admin_account_id"),
        F.col("ACCOUNT_REFERENCE").cast("string").alias("account_reference"),
        F.col("DEFAULT_USER_ID").cast("string").alias("default_user_id"),
        F.col("DEFAULT_USER_ADDRESS_ID").cast("string").alias("default_user_address_id"),
        F.col("DATE_CREATED").alias("created_at"),
        F.col("DATE_UPDATED").alias("updated_at"),
        F.to_date("LAST_DELIVERY_DATE").alias("last_delivery_date"),
        F.col("RELOCATED_COUNTRY_ID").cast("string").alias("relocated_country_id"),
        F.col("DEFAULT_COMMENT").cast("string").alias("default_comment"),
        F.col("T_ADDITIONAL_NOTE").cast("string").alias("additional_note"),
        F.col("INVALID_COMMENTS").cast("string").alias("invalid_comments"),
        F.col("MARI_COMMENT").cast("string").alias("mari_comment"),
        F.col("UNPAID_SO_SMS").cast("string").try_cast("boolean").alias("unpaid_so_sms"),
        F.col("DELIVERY_SMS").cast("string").try_cast("boolean").alias("delivery_sms"),
    )
    dedup = S.dedup_keep_latest(
        src,
        "customer_id",
        [
            F.coalesce("updated_at", "created_at").desc_nulls_first(),
            F.col("_ingested_at").desc_nulls_first(),
        ],
    )
    lat = F.when(F.col("lat_raw").between(-90, 90), F.round("lat_raw", 6)).cast("decimal(18,6)")
    lon = F.when(F.col("lon_raw").between(-180, 180), F.round("lon_raw", 6)).cast("decimal(18,6)")
    keep = [
        "customer_id", "customer_name", "email_primary", "email_other",
        "phone_primary", "phone_secondary", "phone_formatted", "area",
        "building", "apartment_number", "address_text", "address_name",
        "landmark", "city_id", "country_id",
    ]
    tail = [
        "has_star", "is_fragile", "is_invalid", "is_online_only", "pet_names",
        "pet_owner_names", "contact_names", "crm_account_id", "books_account_id",
        "admin_account_id", "prev_admin_account_id", "account_reference",
        "default_user_id", "default_user_address_id", "created_at", "updated_at",
        "last_delivery_date", "relocated_country_id", "default_comment",
        "additional_note", "invalid_comments", "mari_comment", "unpaid_so_sms",
        "delivery_sms", "_ingested_at",
    ]
    return dedup.filter(F.col("customer_id").isNotNull()).select(
        *keep, lat.alias("latitude"), lon.alias("longitude"), *tail
    )


@model(materialized="table", unique_key="address_sk")
def stg_addresses(ctx) -> DataFrame:
    """Transaction addresses, keep-latest per stable address id
    (reference models/staging/stg_addresses.sql)."""
    a = ctx.source("transaction_addresses")
    src = a.select(
        F.col("ID").cast("string").alias("raw_id"),
        F.col("USER_ADDRESS_ID").cast("string").alias("user_address_id"),
        F.col("TRANSACTION_ID").cast("string").alias("transaction_id"),
        F.col("USER_ID").cast("string").alias("user_id"),
        S.empty_to_null("FIRST_NAME").alias("first_name"),
        S.empty_to_null("LAST_NAME").alias("last_name"),
        F.lower(S.empty_to_null("EMAIL")).alias("email"),
        S.empty_to_null("PHONE").alias("phone"),
        S.empty_to_null("BUILDING").alias("building"),
        S.empty_to_null("APARTMENT_NUMBER").alias("apartment_number"),
        S.empty_to_null("STREET_NAME").alias("street_name"),
        S.empty_to_null("LAND_MARK").alias("landmark"),
        S.empty_to_null("AREA").alias("area"),
        S.empty_to_null("TOWN").alias("town"),
        S.empty_to_null("POST_CODE").alias("post_code"),
        S.empty_to_null("REGION_ID").alias("region_id"),
        F.upper(S.empty_to_null("COUNTRY_CODE")).alias("country_code"),
        S.empty_to_null("COMPANY_NAME").alias("company_name"),
        F.lower(S.empty_to_null("TYPE")).alias("address_type"),
        S.str_to_bool("IS_NEW_ADDRESS").alias("is_new_address"),
        S.str_to_bool("IS_NEW_ADDRESS_TAG").alias("is_new_address_tag"),
        S.try_to_decimal(S.empty_to_null(F.col("LATITUDE").cast("string")), 9, 6).alias("latitude"),
        S.try_to_decimal(S.empty_to_null(F.col("LONGITUDE").cast("string")), 9, 6).alias("longitude"),
        S.try_to_timestamp_ntz(S.empty_to_null(F.col("DATE_UPDATED").cast("string"))).alias("updated_at"),
        F.col("_AIRBYTE_EXTRACTED_AT").alias("_src_extracted_at"),
    )

    shaped = src.select(
        F.coalesce("user_address_id", "raw_id").alias("address_id"),
        "user_address_id", "raw_id", "transaction_id", "user_id",
        "first_name", "last_name",
        F.concat_ws(" ", "first_name", "last_name").alias("full_name"),
        "company_name", "address_type", "email", "phone",
        "building", "apartment_number", "street_name", "landmark",
        "area", "town", "post_code", "region_id", "country_code",
        "latitude", "longitude", "is_new_address", "is_new_address_tag",
        "updated_at", "_src_extracted_at",
        F.concat_ws(
            ", ",
            F.nullif(F.concat_ws(" ", "building", "apartment_number", "street_name"), F.lit("")),
            F.nullif(F.concat_ws(" ", "area", "town"), F.lit("")),
            F.nullif(F.concat_ws(" ", "post_code", "country_code"), F.lit("")),
        ).alias("address_display"),
    )

    dedup = S.dedup_keep_latest(
        shaped,
        "address_id",
        [
            F.coalesce("updated_at", "_src_extracted_at").desc_nulls_first(),
            F.col("raw_id").desc_nulls_first(),
        ],
    )

    return dedup.select(
        S.surrogate_key("address_id").alias("address_sk"),
        "address_id", "user_address_id", "raw_id", "transaction_id", "user_id",
        "first_name", "last_name", "full_name", "company_name", "address_type",
        "email", "phone", "building", "apartment_number", "street_name",
        "landmark", "area", "town", "post_code", "region_id", "country_code",
        S.iff(F.col("latitude").between(-90, 90), F.col("latitude"), F.lit(None)).alias("latitude"),
        S.iff(F.col("longitude").between(-180, 180), F.col("longitude"), F.lit(None)).alias("longitude"),
        "is_new_address", "is_new_address_tag", "updated_at",
        "_src_extracted_at", "address_display",
    )


# ---------------------------------------------------------------------------
# Zoho Books JSON models
# ---------------------------------------------------------------------------

INVOICE_JSON_SCHEMA = T.StructType([
    T.StructField("invoice_id", T.StringType()),
    T.StructField("invoice_number", T.StringType()),
    T.StructField("customer_id", T.StringType()),
    T.StructField("customer_name", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("due_date", T.StringType()),
    T.StructField("last_payment_date", T.StringType()),
    T.StructField("currency_code", T.StringType()),
    T.StructField("total", T.StringType()),
    T.StructField("balance", T.StringType()),
    T.StructField("reference_number", T.StringType()),
    T.StructField("status", T.StringType()),
])


def _invoice_base(src: DataFrame) -> DataFrame:
    """Shared VARIANT-path extraction for the two invoice models
    (reference stg_invoice_payments.sql:7-35 / stg_invoices_ar.sql:3-25).

    ``try_parse_json`` → ``from_json`` (NULL on malformed = same); all JSON
    scalars land as strings, then the ``j:x::type`` path casts are
    ``try_cast`` (Snowflake ``::`` on VARIANT is lenient for ''→NULL via the
    reference's explicit nullif)."""
    j = src.select(
        F.col("_AIRBYTE_RAW_ID").alias("raw_id"),
        F.col("_AIRBYTE_EXTRACTED_AT").alias("extracted_at"),
        F.from_json(F.col("JSON_DATA").cast("string"), INVOICE_JSON_SCHEMA).alias("j"),
    )
    d182 = "decimal(18,2)"
    return j.select(
        "raw_id", "extracted_at",
        F.col("j.invoice_id").alias("invoice_id"),
        F.col("j.invoice_number").alias("invoice_number"),
        F.col("j.customer_id").alias("customer_id"),
        F.col("j.customer_name").alias("customer_name"),
        F.col("j.date").try_cast("date").alias("invoice_date"),
        F.nullif(F.col("j.due_date"), F.lit("")).try_cast("date").alias("due_date"),
        F.nullif(F.col("j.last_payment_date"), F.lit("")).try_cast("date").alias("last_payment_date"),
        F.upper("j.currency_code").alias("currency_code"),
        F.col("j.total").try_cast(d182).alias("total_amount"),
        F.coalesce(F.col("j.balance").try_cast(d182), F.lit(0).cast(d182)).alias("balance"),
        F.nullif(F.col("j.reference_number"), F.lit("")).alias("reference_number"),
        F.lower("j.status").alias("src_status"),
    )


@model(materialized="incremental", unique_key="payment_id")
def stg_invoice_payments(ctx) -> DataFrame:
    """Paid/partially-paid invoice payments with synthesized payment_id
    (reference models/staging/stg_invoice_payments.sql)."""
    base = _invoice_base(ctx.source("zbooks_invoices")).withColumnRenamed(
        "extracted_at", "_src_extracted_at"
    )
    amount_paid = F.greatest(
        F.coalesce("total_amount", F.lit(0)) - F.coalesce("balance", F.lit(0)), F.lit(0)
    )
    norm = base.select(
        "*",
        F.when((F.col("src_status") == "paid") & (F.col("balance") == 0), "paid")
        .when(F.col("src_status").isin("paid", "partially_paid") & (F.col("balance") > 0), "partially_paid")
        .when(F.col("src_status") == "draft", "draft")
        .when(F.col("src_status") == "void", "void")
        .when(F.col("src_status").isin("unpaid", "overdue"), "unpaid")
        .otherwise(F.coalesce("src_status", F.lit("unknown")))
        .alias("status_canonical"),
        amount_paid.alias("amount_paid"),
        F.coalesce(
            "last_payment_date",
            F.when(
                (F.coalesce("total_amount", F.lit(0)) - F.coalesce("balance", F.lit(0))) > 0,
                F.col("invoice_date"),
            ),
        ).alias("payment_date"),
    )
    return norm.filter(F.col("status_canonical").isin("paid", "partially_paid")).select(
        S.surrogate_key(
            F.lit("zoho_invoice"),
            "invoice_id",
            F.coalesce(F.col("payment_date").cast("string"), F.col("invoice_date").cast("string")),
        ).alias("payment_id"),
        "invoice_id", "invoice_number", "customer_id", "customer_name",
        "invoice_date", "due_date", "payment_date", "status_canonical",
        "total_amount", "amount_paid", "balance", "currency_code",
        "reference_number", "_src_extracted_at",
    )


@model(materialized="table")
def stg_invoices_ar(ctx) -> DataFrame:
    """Open accounts-receivable invoices (balance > 0)
    (reference models/staging/stg_invoices_ar.sql)."""
    base = _invoice_base(ctx.source("zbooks_invoices"))
    return base.filter(F.coalesce("balance", F.lit(0)) > 0).select(
        "invoice_id", "invoice_number", "customer_id", "customer_name",
        "invoice_date", "due_date", "src_status",
        F.when((F.col("src_status") == "paid") & (F.col("balance") == 0), "paid")
        .when(F.col("balance") > 0, "partially_paid")
        .otherwise("unpaid")
        .alias("status_canonical"),
        "total_amount", "balance",
        F.greatest(
            F.coalesce("total_amount", F.lit(0)) - F.coalesce("balance", F.lit(0)),
            F.lit(0),
        ).alias("amount_paid"),
        "currency_code",
    )


SHIPMENT_JSON_SCHEMA = T.StructType([
    T.StructField("shipment_id", T.StringType()),
    T.StructField("package_id", T.StringType()),
    T.StructField("package_number", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("tracking_number", T.StringType()),
    T.StructField("shipping_date", T.StringType()),
    T.StructField("delivery_date", T.StringType()),
    T.StructField("delivery_method", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("customer_id", T.StringType()),
    T.StructField("customer_name", T.StringType()),
    T.StructField("salesorder_id", T.StringType()),
    T.StructField("salesorder_number", T.StringType()),
])


@model(materialized="table", unique_key="shipment_id")
def stg_shipments(ctx) -> DataFrame:
    """Zoho shipments from JSON, canonical status, keep-latest
    (reference models/staging/stg_shipments.sql)."""
    src = ctx.source("zbooks_shipments").select(
        F.from_json(F.col("JSON_DATA").cast("string"), SHIPMENT_JSON_SCHEMA).alias("j")
    )
    base = src.select(
        F.col("j.shipment_id").alias("shipment_id"),
        F.col("j.package_id").alias("package_id"),
        F.col("j.package_number").alias("package_number"),
        F.col("j.status").alias("src_status"),
        F.col("j.tracking_number").alias("tracking_number"),
        F.nullif(F.col("j.shipping_date"), F.lit("")).try_cast("date").alias("shipped_at"),
        F.nullif(F.col("j.delivery_date"), F.lit("")).try_cast("date").alias("delivered_at"),
        F.col("j.delivery_method").alias("delivery_method"),
        F.col("j.date").try_cast("date").alias("shipment_created_date"),
        F.col("j.customer_id").alias("customer_id"),
        F.col("j.customer_name").alias("customer_name"),
        F.col("j.salesorder_id").alias("salesorder_id"),
        F.col("j.salesorder_number").alias("salesorder_number"),
    )
    lowered = F.lower(F.coalesce("src_status", F.lit("")))
    norm = base.withColumn(
        "status_canonical",
        F.when(lowered == "shipped", "shipped")
        .when(lowered == "in_transit", "in_transit")
        .when(lowered == "delivered", "delivered")
        .when(lowered == "failed", "failed")
        .when(lowered == "returned", "returned")
        .otherwise("shipped"),
    )
    dedup = S.dedup_keep_latest(
        norm,
        "shipment_id",
        [
            F.col("shipment_created_date").desc_nulls_first(),
            F.col("shipped_at").desc_nulls_first(),
            F.col("delivered_at").desc_nulls_first(),
        ],
    )
    return dedup.select(
        "shipment_id", "package_id", "package_number", "status_canonical",
        "tracking_number", "shipped_at", "delivered_at", "delivery_method",
        "shipment_created_date", "customer_id", "customer_name",
        "salesorder_id", "salesorder_number",
    )


@model(materialized="table", unique_key="package_id")
def stg_packages(ctx) -> DataFrame:
    """Warehouse printed packages, keep-latest
    (reference models/staging/stg_packages.sql)."""
    src = ctx.source("packages_printed").select(
        F.col("PACKAGE_ID").cast("string").alias("package_id"),
        F.col("SHIPMENT_ID").cast("string").alias("shipment_id"),
        F.col("CUSTOMER_ID").cast("string").alias("customer_id"),
        F.col("PACKAGE_NUMBER").cast("string").alias("package_number"),
        F.col("DATE_CREATED").cast("timestamp").alias("created_at"),
        F.col("DELIVERY_DATE").try_cast("date").alias("delivered_at"),
        F.col("DELIVERY_TIME").cast("string").alias("delivery_time"),
        F.col("ADMIN_ID").cast("string").alias("admin_id"),
        F.col("ORGANIZATION").cast("string").alias("organization"),
        F.col("BB_COUNT").cast("long").alias("bb_count"),
        F.col("CB_COUNT").cast("long").alias("cb_count"),
        F.col("BATCH_TIME").cast("timestamp").alias("batch_time"),
        F.col("IS_BB_VERIFIED").cast("string").try_cast("boolean").alias("is_bb_verified"),
    )
    return S.dedup_keep_latest(
        src,
        "package_id",
        [
            F.coalesce("created_at", "batch_time").desc_nulls_first(),
            F.col("package_number").desc_nulls_first(),
        ],
    )


# ---------------------------------------------------------------------------
# product reference tables
# ---------------------------------------------------------------------------

@model(materialized="table", unique_key="product_detail_sk")
def stg_product_details(ctx) -> DataFrame:
    """Product detail attributes, all-text staging, keep-latest per SK
    (reference models/staging/stg_product_details.sql)."""
    src = ctx.source("product_details").select(
        F.trim(F.col("PRODUCT_ID").cast("string")).alias("product_id"),
        S.empty_to_null(F.col("DETAIL_NAME").cast("string")).alias("detail_name"),
        S.empty_to_null(F.col("DETAIL_TYPE").cast("string")).alias("detail_type"),
        S.empty_to_null(F.col("DETAIL_CONTENT").cast("string")).alias("detail_content"),
        S.empty_to_null(F.col("SORT_ORDER").cast("string")).alias("sort_order"),
        F.lower(S.empty_to_null(F.col("STATUS").cast("string"))).alias("src_status"),
        S.empty_to_null(F.col("DATE_CREATED").cast("string")).alias("created_at"),
        S.empty_to_null(F.col("LOCATION_INSERT").cast("string")).alias("location_insert"),
    )
    base = src.withColumn(
        "product_detail_sk",
        S.surrogate_key(
            "product_id",
            F.coalesce("detail_name", F.lit("")),
            F.coalesce("detail_type", F.lit("")),
            F.coalesce("sort_order", F.lit("")),
        ),
    )
    dedup = S.dedup_keep_latest(
        base, "product_detail_sk", [F.col("created_at").desc_nulls_last()]
    )
    return dedup.select(
        "product_detail_sk", "product_id", "detail_name", "detail_type",
        "detail_content", "sort_order", "src_status", "created_at",
        "location_insert",
    )


def _slug_table(ctx, source_name, id_col, name_alias, slug_alias):
    """Shared shape of stg_product_brands / stg_product_categories
    (reference stg_product_brands.sql / stg_product_categories.sql)."""
    src = ctx.source(source_name).select(
        F.col("ID").cast("string").alias(id_col),
        F.nullif(F.col("NAME"), F.lit("")).alias(name_alias),
        F.nullif(F.col("SLUG"), F.lit("")).alias(slug_alias),
        S.try_to_timestamp_ntz(F.col("DATE_CREATED").cast("string")).alias("created_at"),
    )
    return S.dedup_keep_latest(src, id_col, [F.col("created_at").desc_nulls_last()])


@model(materialized="table", unique_key="brand_id")
def stg_product_brands(ctx) -> DataFrame:
    return _slug_table(ctx, "product_brands", "brand_id", "brand_name", "brand_slug")


@model(materialized="table", unique_key="category_id")
def stg_product_categories(ctx) -> DataFrame:
    return _slug_table(ctx, "product_categories", "category_id", "category_name", "category_slug")
