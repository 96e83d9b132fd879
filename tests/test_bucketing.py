"""Bucketed-table co-location: the write-once-shuffle-never-again contract.

At 100 TB the orders⋈lineitem-scale joins are the dominant shuffle; bucketing
both sides on the join key at write time makes every downstream join and
key-aggregation exchange-free. These tests prove the property on the actual
physical plans, not by narration.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from furchild_spark.engine.materialize import write_bucketed

SF = "/root/testdata/sf0.001"


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", str(tmp_path / "l"), "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    to, tl = bucketed_tables
    # forbid broadcast so the plan must choose a (bucketed) sort-merge join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(to).join(spark.table(tl), on="o_orderkey")
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert _n_exchanges(p) == 0  # co-located: bucket layout IS the shuffle
        # and the result is the plain join's result
        plain = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                on="o_orderkey",
            )
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    _, tl = bucketed_tables
    agg = spark.table(tl).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    p = _plan(agg)
    assert _n_exchanges(p) == 0
