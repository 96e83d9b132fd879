"""CORRECTNESS entries for the SQL compiler: the reference's OWN model
SQL, compiled and executed (VERDICT r10 #2).

Each entry compiles a reference ``.sql`` file through
:mod:`furchild_spark.engine.sql_compiler` (minimal dbt-Jinja render +
Snowflake→Spark dialect rewrite), executes it via ``spark.sql`` with the
sources/refs substituted as DataFrames, and hash-checks the result
against the SAME DuckDB oracle the hand-ported Python twin
(``model__*``) is checked against — so the reference text, the Python
port, and the DuckDB port are proven three-way equivalent.

Registered only when the reference checkout is present (REFERENCE_DIR).
"""

from __future__ import annotations

import os

from furchild_spark.engine.dbt_yaml import reference_dir as _reference_dir

from .catalog import QUERIES as _Q
from .catalog import query
from .models_oracle import FIXTURE_DIR, _dbl, _runner


def _compiled(spark, rel_path: str):
    """Compile + execute one reference model over the bronze fixtures;
    refs resolve through the shared view-only Runner (the same upstream
    plans the model__* entries use, so any divergence is THIS model's
    compiled text, not its inputs)."""
    import datetime as dt

    from furchild_spark.engine import sql_compiler as SC

    rendered = SC.compile_model_file(
        os.path.join(_reference_dir(), "models", rel_path),
        now=dt.datetime(2024, 6, 2),  # the shared Runner's frozen now
    )
    return SC.run_model_sql(
        spark, rendered,
        source=lambda sch, t: spark.read.parquet(
            os.path.join(FIXTURE_DIR, f"{t}.parquet")
        ),
        ref=lambda m: _runner(spark).ref(m),
    )


def _register():
    @query(
        "sql_compiled_model_e2e",
        section="§2.7 SQL compiler (ref stg_transactions.sql:1-67 "
        "executed AS WRITTEN): dbt-Jinja render (config/source) + "
        "Snowflake→Spark rewrites — varchar→string, POSIX [[:alnum:]], "
        "leftmost-LONGEST alternation reorder — through spark.sql with "
        "DataFrame substitution; oracle shared verbatim with "
        "model__stg_transactions",
        oracle=_Q["model__stg_transactions"].oracle,
    )
    def sql_compiled_model_e2e(spark, sf_dir):
        return _compiled(spark, "staging/stg_transactions.sql")

    @query(
        "sql_compiled__stg_users",
        section="§2.7 SQL compiler (ref stg_users.sql:1-4 executed as "
        "written); oracle shared with model__stg_users",
        oracle=_Q["model__stg_users"].oracle,
    )
    def sql_compiled__stg_users(spark, sf_dir):
        return _compiled(spark, "staging/stg_users.sql")

    @query(
        "sql_compiled__fct_orders_revenue",
        section="§2.7 SQL compiler (ref fct_orders_revenue.sql:1-23 "
        "executed as written: ref() substitution, group-by ordinal, "
        "to_date on NTZ); oracle shared with model__fct_orders_revenue",
        oracle=_Q["model__fct_orders_revenue"].oracle,
    )
    def sql_compiled__fct_orders_revenue(spark, sf_dir):
        df = _compiled(spark, "marts/commerce/facts/fct_orders_revenue.sql")
        return df.select(
            "customer_id", "order_id", "order_date", "channel",
            *_dbl("order_revenue_ex_vat"),
        )

    @query(
        "sql_compiled__stg_orders",
        section="§2.7 SQL compiler (ref stg_orders.sql:1-160 executed as "
        "written: QUALIFY→windowed subquery + * except, slot-text join, "
        "convert_timezone, try_to_*); oracle shared with "
        "model__stg_orders",
        oracle=_Q["model__stg_orders"].oracle,
    )
    def sql_compiled__stg_orders(spark, sf_dir):
        df = _compiled(spark, "staging/stg_orders.sql")
        return df.select(
            "order_id", "customer_id", "created_at_local", "created_at_utc",
            "updated_at_utc", "order_date_local", "order_date_utc",
            "expected_delivery_date",
            *_dbl("gross_amount", "total_amount", "vat_percentage",
                  "discount_total"),
            "payment_status", "delivery_status", "payment_method_raw",
            "coupon_code", "device_type", "customer_name",
        )

    @query(
        "sql_compiled__dim_customer",
        section="§2.7 SQL compiler (ref dim_customer.sql:1-85 executed "
        "as written: dbt_utils.generate_surrogate_key macro expansion, "
        "6-arg (?i) regexp_replace, QUALIFY); oracle shared with "
        "model__dim_customer",
        oracle=_Q["model__dim_customer"].oracle,
    )
    def sql_compiled__dim_customer(spark, sf_dir):
        return _compiled(spark, "marts/commerce/dims/dim_customer.sql")


if _reference_dir() is not None:
    _register()
