"""Source-reader tests: schema-explicit CSV/JSONL ingest with corrupt-row
quarantine, composing with the Runner's sources hook."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from furchild_spark.sources import readers


def test_csv_reader_schema_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "csv_src")
    os.makedirs(p)
    with open(os.path.join(p, "b1.csv"), "w") as f:
        f.write("id,amount,when\n")
        f.write("1,10.5,2024-06-01T10:00:00\n")
        f.write("2,not_a_number,2024-06-01T11:00:00\n")  # malformed amount
        f.write("3,30.25,2024-06-01T12:00:00\n")
    df = readers.read_csv_source(
        spark, p, "id INT, amount DOUBLE, when TIMESTAMP"
    )
    clean, corrupt = readers.quarantine(df)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    assert corrupt.count() == 1
    assert "not_a_number" in corrupt.first()[readers.CORRUPT_COL]
    # declared types survive
    assert dict(clean.dtypes)["amount"] == "double"
    assert dict(clean.dtypes)["when"] == "timestamp"


def test_jsonl_reader_schema_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "json_src")
    os.makedirs(p)
    with open(os.path.join(p, "b1.jsonl"), "w") as f:
        f.write('{"id": 1, "name": "a"}\n')
        f.write('{"id": 2, "name": "b"\n')  # truncated json
        f.write('{"id": 3, "name": "c"}\n')
    df = readers.read_jsonl_source(spark, p, "id LONG, name STRING")
    clean, corrupt = readers.quarantine(df)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    assert corrupt.count() == 1


def test_csv_source_feeds_runner(spark, tmp_path):
    """A CSV landing dir plugs into the same Runner sources hook the
    parquet bronze uses — the reader layer is materialization-agnostic."""
    from furchild_spark.engine.registry import ModelRegistry, Runner

    p = str(tmp_path / "csv_src2")
    os.makedirs(p)
    with open(os.path.join(p, "users.csv"), "w") as f:
        f.write("ID,CUSTOMER_ACCOUNT_ID\n10,c1\n11,c2\n")

    reg = ModelRegistry()

    @reg.model(materialized="view")
    def v_users(ctx):
        return ctx.source("users").select(
            F.col("ID").cast("string").alias("user_id"),
            F.col("CUSTOMER_ACCOUNT_ID").alias("customer_id"),
        )

    r = Runner(
        spark,
        reg,
        sources=lambda n: readers.quarantine(
            readers.read_csv_source(spark, p, "ID INT, CUSTOMER_ACCOUNT_ID STRING")
        )[0],
    )
    got = {x["user_id"]: x["customer_id"] for x in r.ref("v_users").collect()}
    assert got == {"10": "c1", "11": "c2"}
