"""dbt 1.8 unit tests (engine/unit.py + models/unit_tests.py): the
shipped fixtures must actually run green against the model registry
(r6 ADVICE: they shipped broken and unwired), and `cli test` must run
them with --models selection applied."""

from __future__ import annotations

from furchild_spark.cli import main
from furchild_spark.engine.unit import UnitTest, run_unit_tests
from furchild_spark.models import registry
from furchild_spark.models.unit_tests import UNIT_TESTS


def test_shipped_fixtures_all_pass(spark):
    results = run_unit_tests(spark, registry, UNIT_TESTS)
    assert len(results) == len(UNIT_TESTS) == 10
    assert {r.model for r in results} >= {
        "stg_transactions", "stg_items", "stg_delivery_slots", "fct_orders",
        "stg_invoice_payments", "fct_order_items",
    }
    bad = [(r.name, r.error, r.unexpected, r.missing)
           for r in results if not r.passed]
    assert not bad, bad


def test_all_null_column_needs_explicit_schema(spark):
    """The trap the r6 fixtures fell into: an all-NULL column makes
    schema inference raise; the (rows, ddl) fixture form is the fix and
    must produce a typed NULL column."""
    rows = [{"ID": 1, "X": None}]
    t = UnitTest(
        name="boom", model="stg_items",
        given={"transaction_items": rows}, expect=[],
    )
    res = run_unit_tests(spark, registry, [t])
    assert not res[0].passed and "CANNOT_DETERMINE_TYPE" in (res[0].error or "")

    df = spark.createDataFrame(rows, schema="ID int, X double")
    assert dict(df.dtypes)["X"] == "double"


def test_failure_reports_row_diff(spark):
    t = UnitTest(
        name="wrong_expectation", model="stg_items",
        given={
            "transaction_items": ([
                {"ID": 1, "TRANSACTION_ID": "t1", "PRODUCT_ID": 5,
                 "PRODUCT_NAME": "kibble", "STOCK_ID": 2, "STOCK_NAME": "s",
                 "UNIT": "kg", "QUANTITY": 1, "PRICE": 8.0, "HAS_VAT": 0,
                 "DISCOUNT_PERCENTAGE": None, "BULK_DISCOUNT_PERCENTAGE": None,
                 "FRIENDBUY_DISCOUNT_PERCENTAGE": None},
            ], "ID int, TRANSACTION_ID string, PRODUCT_ID int, "
               "PRODUCT_NAME string, STOCK_ID int, STOCK_NAME string, "
               "UNIT string, QUANTITY int, PRICE double, HAS_VAT int, "
               "DISCOUNT_PERCENTAGE int, BULK_DISCOUNT_PERCENTAGE int, "
               "FRIENDBUY_DISCOUNT_PERCENTAGE int"),
        },
        expect=[{"transaction_item_id": "999"}],
    )
    res = run_unit_tests(spark, registry, [t])[0]
    assert not res.passed and res.error is None
    assert res.unexpected and res.missing


def test_cli_test_runs_unit_tests_with_selection(spark, tmp_path, capsys):
    bronze = str(tmp_path / "bronze")
    assert main(["gen-fixtures", "--bronze", bronze]) == 0
    rc = main(
        ["test", "--bronze", bronze, "--models", "stg_items",
         "--now", "2024-03-05T00:00:00"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert rc == 0
    # both stg_items unit tests ran, the stg_transactions one did not
    assert "stg_items_realized_price_vat_and_discount_clamp" in out
    assert "stg_items_vat_rate_var_override" in out
    assert "stg_transactions_normalizes_ids_and_bridges_users" not in out
    assert "2 unit tests" in out
