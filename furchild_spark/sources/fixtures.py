"""Deterministic synthetic bronze tables per /root/repo/FIXTURES.md.

Seeded PRNG + handcrafted edge rows: duplicate PKs with differing update
timestamps (exercises every keep-latest dedup), prefixed order ids
(SO-/ORD-/ORDER-/#, exercises normalize_order_id), free-text delivery
slots incl. the excluded "30-60 min" duration form, malformed dates/
lat-lon for the try_* paths, 'Furchild:'-suffixed account names for the
dim_customer name strip, and JSON invoice/shipment envelopes incl. a
malformed row.

Pure pandas — usable by pytest (spark.createDataFrame) and by the oracle
path (written to parquet, read by DuckDB).
"""

from __future__ import annotations

import datetime as dt
import json
import random

import pandas as pd

SEED = 1337
N_CUSTOMERS = 40
N_USERS = 50
N_ORDERS = 220
MAX_ITEMS_PER_ORDER = 5

EPOCH = dt.datetime(2024, 3, 1, 8, 0, 0)
INGEST = dt.datetime(2024, 6, 1, 6, 0, 0)

SLOT_TEXTS = [
    "9am - 12pm", "2:30 PM – 5:00 PM", "morning", "6-9pm", "afternoon",
    "evening", "10:00 - 13:00", "8 AM — 11 AM", "30-60 min", "", None,
]
DEVICES = ["web", "ios", "android", "pos", None]
AREAS = ["Marina", "JLT", "Downtown", "Mirdif", "Springs"]


def _ts(rng, lo_days=0, hi_days=80):
    return EPOCH + dt.timedelta(
        days=rng.randint(lo_days, hi_days), minutes=rng.randint(0, 1380)
    )


def bronze_fixtures() -> dict[str, pd.DataFrame]:
    rng = random.Random(SEED)

    users = [
        {"ID": str(1000 + i), "CUSTOMER_ACCOUNT_ID": str(500 + i % N_CUSTOMERS)}
        for i in range(N_USERS)
    ]

    customers = []
    for i in range(N_CUSTOMERS):
        cid = str(500 + i)
        created = _ts(rng, 0, 10)
        name = f"Pet Parent {i}"
        if i % 5 == 0:
            name = f"Pet Parent {i} - Furchild: VIP note"
        base = {
            "_AIRBYTE_EXTRACTED_AT": INGEST,
            "ID": cid,
            "ACCOUNT_NAME": name,
            # never null: the reference declares error-severity not_null on
            # stg_customers.email_primary (schema.yml), so bronze fixtures
            # must honor the source contract (coalesce fallbacks are unit-
            # tested, not fixture-exercised)
            "ACCOUNT_EMAIL_ADDRESS": f"owner{i}@example.com",
            "OTHER_EMAIL_ADDRESSES": f"alt{i}@example.com" if i % 3 == 0 else None,
            "T_PHONE_NUMBER": f"+9715000{i:04d}" if i % 4 else None,
            "T_SECONDARY_PHONE_NUMBER": f"050{i:07d}" if i % 6 == 0 else None,
            "FORMATTED_PHONES": f"+971-50-{i:07d}",
            "AREA": rng.choice(AREAS),
            "BUILDING": f"Bldg {rng.randint(1, 99)}",
            "APARTMENT_NUMBER": str(rng.randint(1, 400)),
            "T_ADDRESS": f"{rng.randint(1,99)} Main St",
            "ADDRESS_NAME": "Home",
            "LAND_MARK": None,
            "T_CITY_ID": str(rng.randint(1, 5)),
            "T_COUNTRY": "AE",
            "LATITUDE": str(round(rng.uniform(24.8, 25.4), 6)) if i % 9 else "999",
            "LONGITUDE": str(round(rng.uniform(54.9, 55.6), 6)) if i % 9 else "abc",
            "HAS_STAR": rng.choice(["true", "false"]),
            "IS_FRAGILE": rng.choice(["true", "false"]),
            "IS_INVALID": "false",
            "IS_ONLINE_ONLY": rng.choice(["true", "false"]),
            "S_PET_NAMES": f"Rex{i}",
            "S_PET_OWNER_NAMES": f"Owner {i}",
            "S_CONTACT_NAMES": None,
            "ZCRM_ACCOUNT_ID": f"crm{i}",
            "ZBOOKS_ACCOUNT_ID": f"zb{i}",
            "ADMIN_ACCOUNT_ID": None,
            "PREV_ADMIN_ACCOUNT_ID": None,
            "ACCOUNT_REFERENCE": f"REF-{i:05d}",
            "DEFAULT_USER_ID": str(1000 + i),
            "DEFAULT_USER_ADDRESS_ID": None,
            "DATE_CREATED": created,
            "DATE_UPDATED": created + dt.timedelta(days=rng.randint(0, 30)),
            "LAST_DELIVERY_DATE": (created + dt.timedelta(days=40)).strftime("%Y-%m-%d"),
            "RELOCATED_COUNTRY_ID": None,
            "DEFAULT_COMMENT": None,
            "T_ADDITIONAL_NOTE": None,
            "INVALID_COMMENTS": None,
            "MARI_COMMENT": None,
            "UNPAID_SO_SMS": "false",
            "DELIVERY_SMS": "true",
        }
        customers.append(base)
        if i % 8 == 0:  # stale duplicate → dedup must drop it
            stale = dict(base)
            stale["DATE_UPDATED"] = created - dt.timedelta(days=1)
            stale["ACCOUNT_NAME"] = f"OLD {name}"
            stale["_AIRBYTE_EXTRACTED_AT"] = INGEST - dt.timedelta(days=2)
            customers.append(stale)

    prefixes = ["SO-", "ORD-", "ORDER-", "#", "SO", ""]
    transactions, items, addresses = [], [], []
    item_id = 1
    for i in range(N_ORDERS):
        okey = 7000 + i
        raw_id = f"{prefixes[i % 6]}{okey}"
        user = users[rng.randrange(N_USERS)]
        created = _ts(rng)
        updated = created + dt.timedelta(hours=rng.randint(1, 72))
        gross = 0.0
        n_items = rng.randint(1, MAX_ITEMS_PER_ORDER)
        for _ in range(n_items):
            price = round(rng.uniform(10, 400), 2)
            qty = rng.randint(1, 6)
            gross += price * qty
            has_vat = rng.choice([1, 1, 1, 0])
            items.append(
                {
                    "_AIRBYTE_EXTRACTED_AT": INGEST,
                    "ID": str(item_id),
                    "TRANSACTION_ID": raw_id,
                    "PRODUCT_ID": str(rng.randint(1, 60)),
                    "STOCK_ID": str(rng.randint(1, 200)),
                    "PRODUCT_NAME": f"Food {rng.randint(1, 60)}",
                    "UNIT": rng.choice(["kg", "pack", "box"]),
                    "STOCK_NAME": "main",
                    "PRICE": price,
                    "QUANTITY": float(qty),
                    "HAS_VAT": rng.choice([str(has_vat), "true" if has_vat else "false"]),
                    "DISCOUNT_PERCENTAGE": rng.choice([0.0, 0.0, 5.0, 10.0, 110.0]),
                    "BULK_DISCOUNT_PERCENTAGE": rng.choice([0.0, 0.0, 2.5]),
                    "DISCOUNT_APPLICATION_TYPE": rng.choice([None, None, 1, 2]),
                    "FRIENDBUY_DISCOUNT_PERCENTAGE": rng.choice([0.0, 0.0, 7.5]),
                    "FRIENDBUY_DISCOUNT_APPLICATION_TYPE": rng.choice([None, 1]),
                    "MEAL_PLAN_REQUEST_ID": None,
                }
            )
            # NOTE: no duplicate item IDs — the reference's error-severity
            # `unique` test on stg_items.transaction_item_id
            # (schema.yml:107-110) + dedup-free stg_items.sql imply the
            # bronze contract has unique line ids; stg_order_items' keep-
            # latest window is exercised by a dedicated unit test instead.
            item_id += 1
        tx = {
            "_AIRBYTE_EXTRACTED_AT": INGEST,
            "ID": raw_id,
            "USER_ID": user["ID"],
            "TRANSACTION_DATE": created,
            "DATE_UPDATED": updated if i % 5 else None,
            "DELIVERY_DATE": rng.choice(
                [created.strftime("%Y-%m-%d"), "not-a-date", None]
            ),
            "DELIVERY_TIME": rng.choice(SLOT_TEXTS),
            "GROSS_AMOUNT": round(gross, 2),
            "TOTAL_AMOUNT": round(gross * 1.05, 2),
            "DISCOUNT_AMOUNT": rng.choice([0.0, 10.0, None]),
            "BW_DISCOUNT_AMOUNT": None,
            "NDC_DISCOUNT_AMOUNT": None,
            "BULK_DISCOUNT_AMOUNT": rng.choice([0.0, None]),
            "POINTS_DISCOUNT_AMOUNT": None,
            "SPECIAL_DISCOUNT_AMOUNT": None,
            "GIFT_CARD_AMOUNT_DISCOUNT": None,
            "VAT_PERCENTAGE": 5.0,
            "PAYMENT_METHOD": rng.choice(["card", "cod", "apple_pay"]),
            "PAYMENT_STATUS": rng.choice([0, 1, 1, 2]),
            "DELIVERY_STATUS": rng.choice([0, 1, 1, 3]),
            "COUPON_CODE": rng.choice([None, None, "WELCOME10"]),
            "DEVICE_TYPE": rng.choice(DEVICES),
            "DELIVERY_OPTION": rng.choice(["standard", "express"]),
            "FRIENDBUY_CODE": rng.choice([None, None, None, "FB-REF"]),
            "GIFT_CARD_CODE": None,
            "ADDITIONAL_NOTE": None,
            "ZOHO_SO_ID": f"zso-{okey}",
            "FULL_NAME": f"Pet Parent {int(user['CUSTOMER_ACCOUNT_ID']) - 500}",
        }
        # NOTE: no duplicate headers — bronze transactions.ID carries a
        # `unique` source test (ref schema.yml:30-34), so the keep-latest
        # window in stg_orders is a contract-safety no-op on valid data;
        # its mechanics are exercised by transaction_items/customer dups
        # (whose bronze IDs are NOT contractually unique) and the catalog's
        # dedup_latest_event oracle query.
        transactions.append(tx)

        # one or two addresses per order's user
        for a in range(1 + (i % 2)):
            addresses.append(
                {
                    "ID": f"{9000 + i}-{a}",
                    "USER_ADDRESS_ID": f"ua-{user['ID']}-{a}" if a == 0 else None,
                    "TRANSACTION_ID": raw_id,
                    "USER_ID": user["ID"],
                    "FIRST_NAME": f"First{i}",
                    "LAST_NAME": f"Last{i}" if i % 3 else "",
                    "EMAIL": f"ship{i}@example.com" if i % 10 else "bad-email",
                    "PHONE": f"+9715{i:07d}",
                    "BUILDING": f"B{rng.randint(1, 50)}",
                    "APARTMENT_NUMBER": str(rng.randint(1, 200)),
                    "STREET_NAME": "Al Wasl Rd",
                    "LAND_MARK": "",
                    "AREA": rng.choice(AREAS),
                    "TOWN": "Dubai",
                    "POST_CODE": "00000",
                    "REGION_ID": str(rng.randint(1, 9)),
                    "COUNTRY_CODE": rng.choice(["AE", "ae", "ARE", "X"]),
                    "COMPANY_NAME": "",
                    "TYPE": rng.choice(["shipping", "shipping", "billing", None]),
                    "IS_NEW_ADDRESS": rng.choice(["1", "TRUE", "Y", "0", "false", ""]),
                    "IS_NEW_ADDRESS_TAG": rng.choice(["1", "0"]),
                    "LATITUDE": rng.choice(
                        [str(round(rng.uniform(24.8, 25.4), 6)), "91.5", "n/a"]
                    ),
                    "LONGITUDE": str(round(rng.uniform(54.9, 55.6), 6)),
                    "DATE_UPDATED": rng.choice(
                        [
                            (created - dt.timedelta(days=rng.randint(0, 20))).strftime(
                                "%Y-%m-%d %H:%M:%S"
                            ),
                            "garbage",
                            None,
                        ]
                    ),
                    "_AIRBYTE_EXTRACTED_AT": INGEST - dt.timedelta(days=rng.randint(0, 5)),
                }
            )

    invoices = []
    for i in range(60):
        total = round(rng.uniform(50, 900), 2)
        status = rng.choice(
            ["paid", "paid", "partially_paid", "unpaid", "overdue", "draft", "void"]
        )
        balance = 0 if status == "paid" else round(total * rng.uniform(0.1, 1.0), 2)
        payload = {
            "invoice_id": f"inv-{i}",
            "invoice_number": f"INV-{i:04d}",
            "customer_id": str(500 + i % N_CUSTOMERS),
            "customer_name": f"Pet Parent {i % N_CUSTOMERS}",
            "date": (EPOCH + dt.timedelta(days=i)).strftime("%Y-%m-%d"),
            "due_date": ""
            if i % 6 == 0
            else (EPOCH + dt.timedelta(days=i + 14)).strftime("%Y-%m-%d"),
            "last_payment_date": (EPOCH + dt.timedelta(days=i + 3)).strftime("%Y-%m-%d")
            if status in ("paid", "partially_paid") and i % 4
            else "",
            "currency_code": "aed",
            "total": total,
            "balance": balance,
            "reference_number": "" if i % 5 == 0 else f"ref-{i}",
            "status": status,
        }
        invoices.append(
            {
                "_AIRBYTE_RAW_ID": f"raw-inv-{i}",
                "_AIRBYTE_EXTRACTED_AT": INGEST,
                "JSON_DATA": json.dumps(payload) if i % 29 else "{not json",
            }
        )

    shipments = []
    for i in range(40):
        payload = {
            "shipment_id": f"shp-{i}",
            "package_id": f"pkg-{i}",
            "package_number": f"PKG-{i:04d}",
            "status": rng.choice(
                ["shipped", "in_transit", "delivered", "failed", "returned", "weird"]
            ),
            "tracking_number": f"TRK{i:06d}",
            "shipping_date": (EPOCH + dt.timedelta(days=i)).strftime("%Y-%m-%d"),
            "delivery_date": ""
            if i % 7 == 0
            else (EPOCH + dt.timedelta(days=i + 2)).strftime("%Y-%m-%d"),
            "delivery_method": rng.choice(["van", "bike"]),
            "date": (EPOCH + dt.timedelta(days=i)).strftime("%Y-%m-%d"),
            "customer_id": str(500 + i % N_CUSTOMERS),
            "customer_name": f"Pet Parent {i % N_CUSTOMERS}",
            "salesorder_id": f"zso-{7000 + i}",
            "salesorder_number": f"SO-{7000 + i}",
        }
        shipments.append(
            {
                "_AIRBYTE_RAW_ID": f"raw-shp-{i}",
                "_AIRBYTE_EXTRACTED_AT": INGEST,
                "JSON_DATA": json.dumps(payload),
            }
        )

    packages = []
    for i in range(45):
        created = EPOCH + dt.timedelta(days=i)
        packages.append(
            {
                "PACKAGE_ID": f"pkg-{i % 40}",  # a few dup ids → dedup
                "SHIPMENT_ID": f"shp-{i % 40}",
                "CUSTOMER_ID": str(500 + i % N_CUSTOMERS),
                "PACKAGE_NUMBER": f"PKG-{i:04d}",
                "DATE_CREATED": created,
                "DELIVERY_DATE": rng.choice(
                    [(created + dt.timedelta(days=2)).strftime("%Y-%m-%d"), "tbd", None]
                ),
                "DELIVERY_TIME": rng.choice(SLOT_TEXTS),
                "ADMIN_ID": str(rng.randint(1, 9)),
                "ORGANIZATION": "furchild",
                "BB_COUNT": rng.randint(0, 5),
                "CB_COUNT": rng.randint(0, 5),
                "BATCH_TIME": created + dt.timedelta(hours=1),
                "IS_BB_VERIFIED": rng.choice(["true", "false"]),
            }
        )

    product_details = []
    for p in range(1, 61):
        for dn, dtp, content in [
            (f"name-{p}", "name", f"Food {p}"),
            (f"brand-{p}", "brand", str(1 + p % 8)),
            (f"cat-{p}", "category", str(1 + p % 5)),
        ]:
            product_details.append(
                {
                    "PRODUCT_ID": str(p),
                    "DETAIL_NAME": dn,
                    "DETAIL_TYPE": dtp,
                    "DETAIL_CONTENT": content,
                    "SORT_ORDER": str(p % 3),
                    "STATUS": "Active",
                    "DATE_CREATED": (EPOCH + dt.timedelta(days=p % 9)).strftime(
                        "%Y-%m-%d %H:%M:%S"
                    ),
                    "LOCATION_INSERT": "import",
                }
            )

    brands = [
        {
            "ID": str(b),
            "NAME": f"Brand {b}" if b % 7 else "",
            "SLUG": f"brand-{b}",
            "DATE_CREATED": (EPOCH + dt.timedelta(days=b)).strftime("%Y-%m-%d %H:%M:%S"),
        }
        for b in range(1, 9)
    ]
    categories = [
        {
            "ID": str(c),
            "NAME": f"Category {c}",
            "SLUG": f"cat-{c}",
            "DATE_CREATED": (EPOCH + dt.timedelta(days=c)).strftime("%Y-%m-%d %H:%M:%S"),
        }
        for c in range(1, 6)
    ]

    return {
        "transactions": pd.DataFrame(transactions),
        "transaction_items": pd.DataFrame(items),
        "users": pd.DataFrame(users),
        "customer_accounts": pd.DataFrame(customers),
        "transaction_addresses": pd.DataFrame(addresses),
        "zbooks_invoices": pd.DataFrame(invoices),
        "zbooks_shipments": pd.DataFrame(shipments),
        "packages_printed": pd.DataFrame(packages),
        "product_details": pd.DataFrame(product_details),
        "product_brands": pd.DataFrame(brands),
        "product_categories": pd.DataFrame(categories),
    }


def write_fixture_parquet(out_dir: str) -> dict[str, str]:
    """Write each bronze fixture as one parquet file; returns name→path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, pdf in bronze_fixtures().items():
        path = os.path.join(out_dir, f"{name}.parquet")
        # microsecond timestamps: Spark's parquet reader rejects NANOS
        pdf.to_parquet(
            path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        paths[name] = path
    return paths
