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
