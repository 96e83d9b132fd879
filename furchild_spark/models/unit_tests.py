"""Unit tests for the reference model DAG (dbt 1.8 ``unit_tests:`` —
logic tests over mocked inputs, run by ``test``/``build`` alongside the
data checks). The reference project predates dbt 1.8 and ships none;
these cover its two most defect-prone transforms:

- ``stg_transactions`` — the order-id normalization regex chain
  (reference stg_transactions.sql:51-61, the POSIX-vs-Java alternation
  trap documented in functions/shims.py) plus the users bridge join.
- ``stg_items`` — the decimal VAT/discount price chain (reference
  stg_items.sql:30-42): ex-VAT division, discount-sum clamping, and the
  var-driven ``vat_rate``.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from furchild_spark.engine.unit import UnitTest

_TXI_SCHEMA = (
    "ID int, TRANSACTION_ID string, PRODUCT_ID int, PRODUCT_NAME string, "
    "STOCK_ID int, STOCK_NAME string, UNIT string, QUANTITY int, "
    "PRICE double, HAS_VAT int, DISCOUNT_PERCENTAGE int, "
    "BULK_DISCOUNT_PERCENTAGE int, FRIENDBUY_DISCOUNT_PERCENTAGE int"
)

UNIT_TESTS: list[UnitTest] = [
    UnitTest(
        name="stg_transactions_normalizes_ids_and_bridges_users",
        model="stg_transactions",
        description="ORD-/SO-/# prefixes strip longest-first (the POSIX "
        "leftmost-longest parity case: ORDER-77 → 77, not ER-77), "
        "separators drop, device lowers to channel, statuses trim+upper "
        "with '' defaults, and the users bridge left-joins (no match → "
        "NULL customer_id).",
        given={
            "transactions": [
                {"ID": " ORDER-77 ", "TRANSACTION_DATE": "2024-03-01",
                 "USER_ID": 7, "DEVICE_TYPE": "iOS",
                 "PAYMENT_STATUS": " paid ", "DELIVERY_STATUS": None},
                {"ID": "SO-00_4 2a", "TRANSACTION_DATE": "2024-03-02",
                 "USER_ID": 9, "DEVICE_TYPE": None,
                 "PAYMENT_STATUS": None, "DELIVERY_STATUS": "shipped"},
            ],
            "users": [
                {"ID": 7, "CUSTOMER_ACCOUNT_ID": 1001},
            ],
        },
        expect=[
            {"order_id": "77", "order_date": dt.date(2024, 3, 1),
             "customer_id": "1001", "channel": "ios",
             "payment_status": "PAID", "delivery_status": ""},
            {"order_id": "0042a", "order_date": dt.date(2024, 3, 2),
             "customer_id": None, "channel": "unknown",
             "payment_status": "", "delivery_status": "SHIPPED"},
        ],
    ),
    UnitTest(
        name="stg_items_realized_price_vat_and_discount_clamp",
        model="stg_items",
        description="HAS_VAT=1 divides by (1+vat_rate) exactly in "
        "decimal(38,6); discount percentages sum, scale-shift by 0.01, "
        "and clamp to [0,1]; NULL discounts coalesce to 0.",
        given={
            # explicit DDL schema: FRIENDBUY_DISCOUNT_PERCENTAGE (and in
            # some rows BULK_) is NULL in every row, so inference would
            # raise CANNOT_DETERMINE_TYPE (engine/unit.py docstring trap)
            "transaction_items": ([
                # VAT + 10% discount: 10.5/1.05 = 10, realized 9
                {"ID": 1, "TRANSACTION_ID": " t1 ", "PRODUCT_ID": 5,
                 "PRODUCT_NAME": "kibble", "STOCK_ID": 2, "STOCK_NAME": "s",
                 "UNIT": "kg", "QUANTITY": 2, "PRICE": 10.5, "HAS_VAT": 1,
                 "DISCOUNT_PERCENTAGE": 10, "BULK_DISCOUNT_PERCENTAGE": None,
                 "FRIENDBUY_DISCOUNT_PERCENTAGE": None},
                # no VAT, no discounts: price passes through
                {"ID": 2, "TRANSACTION_ID": "t2", "PRODUCT_ID": 6,
                 "PRODUCT_NAME": "treat", "STOCK_ID": 3, "STOCK_NAME": "s",
                 "UNIT": "ea", "QUANTITY": 1, "PRICE": 8.0, "HAS_VAT": 0,
                 "DISCOUNT_PERCENTAGE": None, "BULK_DISCOUNT_PERCENTAGE": None,
                 "FRIENDBUY_DISCOUNT_PERCENTAGE": None},
                # stacked discounts 30+25 = 55%
                {"ID": 3, "TRANSACTION_ID": "t3", "PRODUCT_ID": 7,
                 "PRODUCT_NAME": "chew", "STOCK_ID": 4, "STOCK_NAME": "s",
                 "UNIT": "ea", "QUANTITY": 3, "PRICE": 4.0, "HAS_VAT": 0,
                 "DISCOUNT_PERCENTAGE": 30, "BULK_DISCOUNT_PERCENTAGE": 25,
                 "FRIENDBUY_DISCOUNT_PERCENTAGE": None},
            ], _TXI_SCHEMA),
        },
        expect=[
            {"transaction_item_id": "1", "transaction_id": "t1",
             "unit_price_ex_vat": Decimal("10"),
             "total_discount_pct": Decimal("0.1"),
             "realized_unit_price_ex_vat": Decimal("9")},
            {"transaction_item_id": "2", "transaction_id": "t2",
             "unit_price_ex_vat": Decimal("8"),
             "total_discount_pct": Decimal("0"),
             "realized_unit_price_ex_vat": Decimal("8")},
            {"transaction_item_id": "3", "transaction_id": "t3",
             "unit_price_ex_vat": Decimal("4"),
             "total_discount_pct": Decimal("0.55"),
             "realized_unit_price_ex_vat": Decimal("1.8")},
        ],
    ),
    UnitTest(
        name="stg_items_vat_rate_var_override",
        model="stg_items",
        description="vat_rate is a dbt var (dbt_project.yml:13): a 25% "
        "override changes the ex-VAT division accordingly.",
        vars={"vat_rate": 0.25},
        given={
            "transaction_items": ([
                {"ID": 1, "TRANSACTION_ID": "t1", "PRODUCT_ID": 5,
                 "PRODUCT_NAME": "kibble", "STOCK_ID": 2, "STOCK_NAME": "s",
                 "UNIT": "kg", "QUANTITY": 1, "PRICE": 10.0, "HAS_VAT": 1,
                 "DISCOUNT_PERCENTAGE": None, "BULK_DISCOUNT_PERCENTAGE": None,
                 "FRIENDBUY_DISCOUNT_PERCENTAGE": None},
            ], _TXI_SCHEMA),
        },
        expect=[
            {"transaction_item_id": "1",
             "unit_price_ex_vat": Decimal("8"),
             "realized_unit_price_ex_vat": Decimal("8")},
        ],
    ),
]

_ORDER_TS = dt.datetime(2024, 3, 10, 12, 0, 0)

_OI_SCHEMA = (
    # created_at_local is NTZ in the real fct_order_items output — the
    # fct_orders contract (enforced) rejects a plain-timestamp mock
    "order_id string, created_at_local timestamp_ntz, "
    "created_at_utc timestamp, "
    "product_id string, quantity double, unit_price double, "
    "line_gross double, line_discount_amt double, line_tax_amt double, "
    "line_net_amt double"
)

_ADDR_SCHEMA = (
    "address_id string, user_id string, address_type string, area string, "
    "town string, region_id string, country_code string, "
    "address_display string, building string, apartment_number string, "
    "street_name string, landmark string, email string, phone string, "
    "latitude double, longitude double, updated_at timestamp, "
    "_src_extracted_at timestamp"
)


def _addr(aid, atype, area, ts, user="U1"):
    return {
        "address_id": aid, "user_id": user, "address_type": atype,
        "area": area, "town": None, "region_id": None, "country_code": None,
        "address_display": None, "building": None, "apartment_number": None,
        "street_name": None, "landmark": None, "email": None, "phone": None,
        "latitude": None, "longitude": None,
        "updated_at": ts, "_src_extracted_at": ts,
    }


def _oi(order_id, product, gross, discount, tax, net, qty=1.0, unit=1.0):
    return {
        "order_id": order_id, "created_at_local": _ORDER_TS,
        "created_at_utc": _ORDER_TS, "product_id": product,
        "quantity": qty, "unit_price": unit, "line_gross": gross,
        "line_discount_amt": discount, "line_tax_amt": tax,
        "line_net_amt": net,
    }


UNIT_TESTS += [
    UnitTest(
        name="stg_delivery_slots_ampm_windows_canonicalize",
        model="stg_delivery_slots",
        description="The free-text slot miner (reference "
        "stg_delivery_slots.sql): en/em dashes normalize, am/pm hours "
        "shift to 24h (12pm stays 12, pm adds 12), the surrogate key is "
        "md5 of the canonical window, and start-hour buckets the period.",
        given={
            "transactions": ([
                {"DELIVERY_TIME": "9am - 12pm"},
                {"DELIVERY_TIME": "6-9pm"},
                {"DELIVERY_TIME": "8 AM — 11 AM"},   # em dash + upper
                {"DELIVERY_TIME": "9am - 12pm"},     # duplicate → distinct
            ], "DELIVERY_TIME string"),
        },
        expect=[
            {"slot_txt": "9am - 12pm", "delivery_slot": "09:00-12:00",
             "start_time": "09:00:00", "end_time": "12:00:00",
             "slot_period": "morning",
             "delivery_slot_id": "d58206def5c0d18fc6443fe0ea859603"},
            {"slot_txt": "6-9pm", "delivery_slot": "18:00-21:00",
             "start_time": "18:00:00", "end_time": "21:00:00",
             "slot_period": "evening",
             "delivery_slot_id": "5570b2a797c4b00a4f12edef41a4206c"},
            {"slot_txt": "8 am - 11 am", "delivery_slot": "08:00-11:00",
             "start_time": "08:00:00", "end_time": "11:00:00",
             "slot_period": "morning",
             "delivery_slot_id": "76e095713d3f89a40e659832baa135c4"},
        ],
    ),
    UnitTest(
        name="stg_delivery_slots_wordy_and_minute_texts",
        model="stg_delivery_slots",
        description="Reference-parity edge rows: word-only slots keep a "
        "NULL window (and collide on the dbt_utils NULL-sentinel md5 — "
        "faithful to generate_surrogate_key semantics); 'evening' hints "
        "pm so hour 0 becomes 12:00:00/afternoon while 'morning' stays "
        "00:00:00/other; duration texts like '30-60 min' are filtered "
        "out entirely.",
        given={
            "transactions": ([
                {"DELIVERY_TIME": "morning"},
                {"DELIVERY_TIME": "evening"},
                {"DELIVERY_TIME": "30-60 min"},
                {"DELIVERY_TIME": ""},          # blank → filtered
                {"DELIVERY_TIME": None},        # NULL → filtered
            ], "DELIVERY_TIME string"),
        },
        expect=[
            {"slot_txt": "morning", "delivery_slot": None,
             "start_time": "00:00:00", "end_time": "00:00:00",
             "slot_period": "other",
             "delivery_slot_id": "f14cc5cdce0420f4a5a6b6d9d7b85f39"},
            {"slot_txt": "evening", "delivery_slot": None,
             "start_time": "12:00:00", "end_time": "12:00:00",
             "slot_period": "afternoon",
             "delivery_slot_id": "f14cc5cdce0420f4a5a6b6d9d7b85f39"},
        ],
    ),
    UnitTest(
        name="fct_orders_asof_address_prefers_latest_before",
        model="fct_orders",
        description="The J6 as-of join (reference fct_orders.sql:115-141): "
        "among a customer's SHIPPING addresses, the one most recently "
        "updated at-or-before order time wins — beating an older "
        "before-order address, any after-order address, and a billing "
        "address that is closest in time but the wrong type.",
        given={
            "fct_order_items": ([
                _oi("O1", "P1", 20.0, 2.0, 1.0, 19.0, qty=2.0, unit=10.0),
                _oi("O1", "P2", 5.0, 0.0, 0.25, 5.25, unit=5.0),
            ], _OI_SCHEMA),
            "stg_orders": ([
                {"order_id": "O1", "vat_percentage": 5.0},
            ], "order_id string, vat_percentage double"),
            "stg_transactions": ([
                {"order_id": "O1", "customer_id": "C1"},
            ], "order_id string, customer_id string"),
            "stg_users": ([
                {"user_id": "U1", "customer_id": "C1"},
            ], "user_id string, customer_id string"),
            "stg_addresses": ([
                _addr("a1", "shipping", "LatestBefore",
                      dt.datetime(2024, 3, 9, 12, 0, 0)),
                _addr("a2", "shipping", "OldBefore",
                      dt.datetime(2024, 3, 1, 12, 0, 0)),
                _addr("a3", "shipping", "After",
                      dt.datetime(2024, 3, 11, 12, 0, 0)),
                _addr("a4", "billing", "ClosestWrongType",
                      dt.datetime(2024, 3, 10, 11, 59, 0)),
            ], _ADDR_SCHEMA),
        },
        expect=[
            {"order_id": "O1", "customer_id": "C1",
             "ship_area": "LatestBefore",
             "order_sk": "00594a175ce5a58f286d91ca0a6f15a2",
             "item_count": 2, "distinct_products": 2,
             "order_gross": Decimal("25"),
             "order_discount_amt": Decimal("2"),
             "order_net_before_tax": Decimal("23"),
             "order_tax_amt": Decimal("1.25"),
             "order_net_amt": Decimal("24.25"),
             # 2/25*100 and 1.25/23*100 rounded to 2
             "order_discount_pct_effective": Decimal("8"),
             "order_vat_pct_effective": Decimal("5.43"),
             "vat_pct_src": Decimal("5"),
             "order_date": dt.date(2024, 3, 10)},
        ],
    ),
    UnitTest(
        name="fct_orders_asof_fallback_and_zero_gross_guards",
        model="fct_orders",
        description="As-of fallback tier (reference fct_orders.sql "
        "preference window): with NO address at-or-before order time the "
        "nearest AFTER wins, exact-proximity ties break on the lowest "
        "address_id; a zero-gross order hits both div-by-zero guards "
        "(pcts 0, not NULL/error) and an order with no transaction match "
        "keeps NULL customer and address columns.",
        given={
            "fct_order_items": ([
                _oi("O3", "P1", 10.0, 0.0, 0.5, 10.5, unit=10.0),
                _oi("O2", "P1", 0.0, 0.0, 0.0, 0.0, unit=0.0),
            ], _OI_SCHEMA),
            "stg_orders": ([
                {"order_id": "O3", "vat_percentage": 5.0},
                {"order_id": "O2", "vat_percentage": None},
            ], "order_id string, vat_percentage double"),
            "stg_transactions": ([
                {"order_id": "O3", "customer_id": "C2"},
            ], "order_id string, customer_id string"),
            "stg_users": ([
                {"user_id": "U2", "customer_id": "C2"},
            ], "user_id string, customer_id string"),
            "stg_addresses": ([
                _addr("b1", "shipping", "NearestAfterTieLowId",
                      dt.datetime(2024, 3, 11, 12, 0, 0), user="U2"),
                _addr("b2", "shipping", "NearestAfterTieHighId",
                      dt.datetime(2024, 3, 11, 12, 0, 0), user="U2"),
                _addr("b9", "shipping", "FartherAfter",
                      dt.datetime(2024, 3, 12, 12, 0, 0), user="U2"),
            ], _ADDR_SCHEMA),
        },
        expect=[
            {"order_id": "O3", "customer_id": "C2",
             "ship_area": "NearestAfterTieLowId",
             "order_gross": Decimal("10"),
             "order_vat_pct_effective": Decimal("5"),
             "order_discount_pct_effective": Decimal("0")},
            {"order_id": "O2", "customer_id": None, "ship_area": None,
             "order_gross": Decimal("0"),
             "order_vat_pct_effective": Decimal("0"),
             "order_discount_pct_effective": Decimal("0")},
        ],
    ),
]


def _inv(raw_id, **j):
    """A zbooks_invoices bronze row whose JSON_DATA is built from kwargs
    (string-typed scalars, reference stg_invoice_payments.sql:7-35)."""
    import json as _json

    return {
        "_AIRBYTE_RAW_ID": raw_id,
        "_AIRBYTE_EXTRACTED_AT": dt.datetime(2024, 3, 1, 0, 0, 0),
        "JSON_DATA": _json.dumps(j),
    }


_ZB_SCHEMA = (
    "_AIRBYTE_RAW_ID string, _AIRBYTE_EXTRACTED_AT timestamp, "
    "JSON_DATA string"
)


UNIT_TESTS += [
    UnitTest(
        name="stg_invoice_payments_status_canon_keeps_only_payments",
        model="stg_invoice_payments",
        description="The VARIANT status-canonicalization chain (reference "
        "stg_invoice_payments.sql:38-52): paid+zero-balance stays paid, "
        "paid/partially_paid with balance>0 becomes partially_paid, and "
        "draft/void/unpaid/overdue/unknown/malformed-JSON rows are all "
        "filtered out — only payment rows survive.",
        given={
            "zbooks_invoices": ([
                _inv("r1", invoice_id="INV-1", date="2024-02-01",
                     total="100.00", balance="0", status="PAID",
                     last_payment_date="2024-02-20"),
                _inv("r2", invoice_id="INV-2", date="2024-02-11",
                     total="100.00", balance="40.00", status="paid"),
                _inv("r3", invoice_id="INV-D", date="2024-02-01",
                     total="10", balance="10", status="draft"),
                _inv("r4", invoice_id="INV-V", date="2024-02-01",
                     total="10", balance="10", status="void"),
                _inv("r5", invoice_id="INV-O", date="2024-02-01",
                     total="10", balance="10", status="overdue"),
                _inv("r6", invoice_id="INV-X", date="2024-02-01",
                     total="10", balance="10", status="something_else"),
                {"_AIRBYTE_RAW_ID": "r7",
                 "_AIRBYTE_EXTRACTED_AT": dt.datetime(2024, 3, 1),
                 "JSON_DATA": "{not json"},
            ], _ZB_SCHEMA),
        },
        expect=[
            {"invoice_id": "INV-1", "status_canonical": "paid"},
            {"invoice_id": "INV-2", "status_canonical": "partially_paid"},
        ],
    ),
    UnitTest(
        name="stg_invoice_payments_greatest_guard_and_date_fallback",
        model="stg_invoice_payments",
        description="The amount/date guard chain (reference "
        "stg_invoice_payments.sql:28-35): amount_paid = "
        "greatest(total-balance, 0) — an over-credited balance clamps to "
        "0, never negative; payment_date prefers last_payment_date, "
        "falls back to invoice_date only when something was actually "
        "paid, else NULL; and the synthesized payment_id md5 keys on "
        "whichever date survived (dbt_utils surrogate-key parity).",
        given={
            "zbooks_invoices": ([
                # explicit last_payment_date wins
                _inv("r1", invoice_id="INV-1", date="2024-02-01",
                     total="100.00", balance="0", status="paid",
                     last_payment_date="2024-02-20"),
                # '' last_payment_date + positive amount -> invoice_date
                _inv("r2", invoice_id="INV-2", date="2024-02-11",
                     total="100.00", balance="40.00",
                     status="partially_paid", last_payment_date=""),
                # balance > total: amount clamps to 0, no payment date,
                # the key falls through to invoice_date
                _inv("r3", invoice_id="INV-3", date="2024-02-12",
                     total="50.00", balance="80.00",
                     status="partially_paid", last_payment_date=""),
            ], _ZB_SCHEMA),
        },
        expect=[
            {"invoice_id": "INV-1", "amount_paid": Decimal("100"),
             "payment_date": dt.date(2024, 2, 20),
             "payment_id": "70c1844ef4a051ebb0c04d4dcb1e7646"},
            {"invoice_id": "INV-2", "amount_paid": Decimal("60"),
             "payment_date": dt.date(2024, 2, 11),
             "payment_id": "3af78b57972dcd14ef94c3d01695d1f9"},
            {"invoice_id": "INV-3", "amount_paid": Decimal("0"),
             "payment_date": None,
             "payment_id": "f28228779a0b6584e68f016299e3f084"},
        ],
    ),
]


_SOI_SCHEMA = (
    "order_item_id string, order_id string, product_id string, "
    "product_name string, stock_id string, stock_name string, "
    "unit string, quantity decimal(18,2), price decimal(18,2), "
    "line_amount decimal(37,4), has_vat boolean, "
    "discount_percentage decimal(10,2), "
    "bulk_discount_percentage decimal(10,2), "
    "discount_application_type int, "
    "friendbuy_discount_percentage decimal(10,2), "
    "friendbuy_discount_application_type int, "
    "meal_plan_request_id string, _ingested_at timestamp"
)


def _soi(iid, order, qty, price, has_vat=True, disc=None, disc_type=None,
         bulk=None, fb=None, fb_type=None):
    return {
        "order_item_id": iid, "order_id": order, "product_id": "P1",
        "product_name": "kibble", "stock_id": "S1", "stock_name": "s",
        "unit": "kg",
        "quantity": Decimal(qty) if qty is not None else None,
        "price": Decimal(price) if price is not None else None,
        "line_amount": None, "has_vat": has_vat,
        "discount_percentage": Decimal(disc) if disc is not None else None,
        "bulk_discount_percentage": Decimal(bulk) if bulk is not None else None,
        "discount_application_type": disc_type,
        "friendbuy_discount_percentage": Decimal(fb) if fb is not None else None,
        "friendbuy_discount_application_type": fb_type,
        "meal_plan_request_id": None, "_ingested_at": _ORDER_TS,
    }


UNIT_TESTS += [
    UnitTest(
        name="fct_order_items_decimal_chain_clamp_and_apptype_quirk",
        model="fct_order_items",
        description="The decimal(38,6) line-math chain (reference "
        "fct_order_items.sql:56-127): (a) NULL application type coalesces "
        "to PERCENTAGE so the discount applies; (b) a NON-NULL int type "
        "can never equal 'PERCENTAGE' (staging typed it int — faithful "
        "reference quirk) so the discount is ignored while bulk always "
        "applies; (c) the effective pct clamps at 100 (net-before-tax "
        "0, tax 0 even with VAT on); (d) a left-join miss on stg_orders "
        "zeroes the VAT fraction (div-by-zero/NULL guard) and NULL "
        "qty/price zero the gross.",
        given={
            "stg_order_items": ([
                # (a) 10% applies; VAT 5% on net-before-tax
                _soi("i1", "O1", "2", "10", has_vat=True, disc="10"),
                # (b) disc 50 ignored (type 1), fb 20 ignored (type 2),
                #     bulk 30 applies; no VAT
                _soi("i2", "O1", "1", "40", has_vat=False, disc="50",
                     disc_type=1, fb="20", fb_type=2, bulk="30"),
                # (c) 60+70 clamps to 100 -> everything discounts away
                _soi("i3", "O1", "2", "25", has_vat=True, disc="60",
                     bulk="70"),
                # (d) unknown order + NULL qty/price
                _soi("i4", "O2", None, None, has_vat=None),
            ], _SOI_SCHEMA),
            "stg_orders": ([
                {"order_id": "O1", "created_at_local": _ORDER_TS,
                 "created_at_utc": _ORDER_TS,
                 "vat_percentage": Decimal("5")},
            ], "order_id string, created_at_local timestamp, "
               "created_at_utc timestamp, vat_percentage decimal(10,2)"),
        },
        expect=[
            {"order_item_id": "i1", "line_gross": Decimal("20"),
             "discount_pct_effective": Decimal("10"),
             "line_discount_amt": Decimal("2"), "vat_pct": Decimal("5"),
             "line_tax_amt": Decimal("0.9"),
             "line_net_amt": Decimal("18.9")},
            {"order_item_id": "i2", "line_gross": Decimal("40"),
             "discount_pct_effective": Decimal("30"),
             "line_discount_amt": Decimal("12"), "vat_pct": Decimal("5"),
             "line_tax_amt": Decimal("0"),
             "line_net_amt": Decimal("28")},
            {"order_item_id": "i3", "line_gross": Decimal("50"),
             "discount_pct_effective": Decimal("100"),
             "line_discount_amt": Decimal("50"), "vat_pct": Decimal("5"),
             "line_tax_amt": Decimal("0"),
             "line_net_amt": Decimal("0")},
            {"order_item_id": "i4", "line_gross": Decimal("0"),
             "discount_pct_effective": Decimal("0"),
             "line_discount_amt": Decimal("0"), "vat_pct": Decimal("0"),
             "line_tax_amt": Decimal("0"),
             "line_net_amt": Decimal("0")},
        ],
    ),
]
