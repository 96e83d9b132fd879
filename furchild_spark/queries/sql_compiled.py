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
    from furchild_spark.engine import sql_compiler as SC

    rendered = SC.compile_model_file(
        os.path.join(_reference_dir(), "models", rel_path)
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


if _reference_dir() is not None:
    _register()
