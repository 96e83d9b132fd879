"""Unit tests for the Snowflake-semantics shim layer (SURVEY §5 plan:
'unit tests for every shim in §2.7 ⚠ rows')."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from furchild_spark.functions import shims as S


def test_normalize_order_id(spark):
    rows = [
        ("SO-123-45", "12345"),
        ("SO123", "123"),
        ("ORD-00_9 9", "0099"),
        ("ORDER-77", "77"),
        ("#55", "55"),
        (" so-1 ", "so1"),  # prefix match is case-sensitive in the reference
        ("AB.C/9", "ABC9"),
        (None, None),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "raw string")
    got = [r[0] for r in df.select(S.normalize_order_id("raw")).collect()]
    assert got == [r[1] for r in rows]


def test_surrogate_key_matches_dbt_utils_expansion(spark):
    import hashlib

    df = spark.createDataFrame([Row(a="x", b=None), Row(a=None, b="7")])
    got = [r[0] for r in df.select(S.surrogate_key("a", "b")).collect()]
    exp = [
        hashlib.md5(b"x-_dbt_utils_surrogate_key_null_").hexdigest(),
        hashlib.md5(b"_dbt_utils_surrogate_key_null_-7").hexdigest(),
    ]
    assert got == exp


def test_dedup_keep_latest(spark):
    df = spark.createDataFrame(
        [
            ("k1", dt.datetime(2024, 1, 1), 1),
            ("k1", dt.datetime(2024, 2, 1), 2),
            ("k2", dt.datetime(2024, 1, 1), 3),
        ],
        "k string, ts timestamp, v int",
    )
    out = S.dedup_keep_latest(df, "k", [F.col("ts").desc()])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {"k1": 2, "k2": 3}


def test_try_casts(spark):
    df = spark.createDataFrame(
        [("2024-01-31", "1.2345678", "abc", "12.5")],
        "d string, dec string, bad string, f string",
    )
    row = df.select(
        S.try_to_date("d").alias("d"),
        S.try_to_decimal("dec", 9, 6).alias("dec"),
        S.try_to_date("bad").alias("bad_d"),
        S.try_to_decimal("bad", 9, 6).alias("bad_dec"),
        S.try_cast_float("f").alias("f"),
    ).first()
    assert row["d"] == dt.date(2024, 1, 31)
    assert float(row["dec"]) == 1.234568  # rounds to scale 6
    assert row["bad_d"] is None and row["bad_dec"] is None
    assert row["f"] == 12.5


def test_sf_datediff_month_counts_boundaries(spark):
    df = spark.createDataFrame(
        [
            (dt.date(2024, 1, 31), dt.date(2024, 2, 1), 1),
            (dt.date(2024, 1, 1), dt.date(2024, 12, 31), 11),
            (dt.date(2024, 3, 1), dt.date(2024, 2, 28), -1),
        ],
        "a date, b date, want int",
    )
    bad = df.filter(S.sf_datediff_month("a", "b") != F.col("want")).count()
    assert bad == 0


def test_sf_datediff_second(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0), dt.datetime(2024, 1, 1, 0, 1, 30))],
        "a timestamp, b timestamp",
    )
    assert df.select(S.sf_datediff_second("a", "b")).first()[0] == 90


def test_regexp_substr_occ(spark):
    df = spark.createDataFrame([("2:30 pm - 5:45 pm",)], "s string")
    row = df.select(
        S.regexp_substr_occ("s", r"\d{1,2}", 1).alias("h1"),
        S.regexp_substr_occ("s", r"\d{1,2}", 3).alias("h3"),
        S.regexp_substr_occ("s", r":(\d{2})", 1, group=1).alias("m1"),
        S.regexp_substr_occ("s", r":(\d{2})", 2, group=1).alias("m2"),
        S.regexp_substr_occ("s", r":(\d{2})", 3, group=1).alias("m3"),
    ).first()
    assert (row["h1"], row["h3"]) == ("2", "5")
    assert (row["m1"], row["m2"], row["m3"]) == ("30", "45", None)


def test_sf_regexp_like_is_full_match(spark):
    df = spark.createDataFrame([("12",), ("123",)], "s string")
    got = [r[0] for r in df.select(S.sf_regexp_like("s", r"\d{2}")).collect()]
    assert got == [True, False]


def test_str_to_bool(spark):
    df = spark.createDataFrame(
        [("1",), ("TRUE",), ("y",), ("0",), ("false",), ("",), (None,)], "s string"
    )
    got = [r[0] for r in df.select(S.str_to_bool("s")).collect()]
    assert got == [True, True, True, False, False, False, False]


def test_to_utc_from_dubai(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 6, 1, 12, 0, 0),)], "ts timestamp")
    assert df.select(S.to_utc_from("ts")).first()[0] == dt.datetime(2024, 6, 1, 8, 0, 0)


def test_empty_to_null_and_norm_ws(spark):
    df = spark.createDataFrame([("  a   b  ",), ("   ",)], "s string")
    got = df.select(
        S.empty_to_null("s").alias("n"), F.trim(S.norm_ws("s")).alias("w")
    ).collect()
    assert got[0]["w"] == "a b"
    assert got[1]["n"] is None
