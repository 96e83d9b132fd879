"""dbt unit tests (dbt-core 1.8): given MOCKED inputs, run one model's
transform and compare its output to expected rows — logic tests, distinct
from the data tests in :mod:`checks` (which validate real materialized
data). The reference project predates dbt 1.8 and ships none, but the
surface is part of the dbt lifecycle this engine replaces (``dbt test``
runs both kinds).

Execution model: a view-only :class:`~.registry.Runner` is built whose
ref()/source() resolution is pre-seeded with the mock DataFrames, so ONLY
the model under test executes — its upstreams never build, exactly like
dbt rendering the model's SQL against CTE-ed fixture rows. Comparison is
driver-side ``collect`` of both sides: unit-test fixtures are a handful
of rows by design (dbt's own docs call out that unit tests run on tiny
static inputs), so this is not a scale path.

Column semantics mirror dbt: ``expect`` rows may specify a SUBSET of the
model's output columns — comparison is restricted to the specified
columns; unspecified columns are ignored. Row order never matters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from .registry import ModelRegistry, Runner


@dataclass(frozen=True)
class UnitTest:
    name: str
    model: str
    # ref/source name -> mock rows (list of dicts), a (rows, schema_ddl)
    # tuple, or a ready DataFrame. Bare dict rows are schema-inferred;
    # use the tuple/DataFrame form when a column is all-NULL or needs an
    # exact type (timestamp/decimal).
    given: dict
    # expected output rows (list of dicts over a subset of output columns)
    expect: list[dict]
    description: str = ""
    # dbt `overrides: vars:` — var values visible to the model under test
    vars: dict = field(default_factory=dict)


@dataclass(frozen=True)
class UnitTestResult:
    name: str
    model: str
    passed: bool
    # normalized row multisets that differed (empty on pass)
    unexpected: list[tuple] = field(default_factory=list)
    missing: list[tuple] = field(default_factory=list)
    error: str | None = None


def _as_df(spark: SparkSession, rows, name: str) -> DataFrame:
    if isinstance(rows, DataFrame):
        return rows
    # (rows, "col type, ...") — explicit DDL schema. Required whenever a
    # column is NULL in every fixture row (inference raises
    # CANNOT_DETERMINE_TYPE) or needs an exact type (timestamp/decimal).
    if isinstance(rows, tuple) and len(rows) == 2 and isinstance(rows[1], str):
        data, schema = rows
        return spark.createDataFrame(data, schema=schema)
    if not rows:
        raise ValueError(
            f"mock input {name!r}: empty dict-row fixtures can't infer a "
            "schema — pass (rows, schema_ddl) or a DataFrame built with "
            "an explicit schema"
        )
    return spark.createDataFrame(rows)


def _normalize(rows: list[dict], cols: list[str]) -> list[tuple]:
    import decimal

    def canon(v):
        # scale-insensitive decimal equality: Decimal('9.000000') and the
        # author's Decimal('9') are the same expected value (and exact
        # zero reprs as '0E-6' at scale 6 — normalize removes the trap)
        if isinstance(v, decimal.Decimal):
            v = v.normalize()
        return repr(v)

    out = []
    for r in rows:
        out.append(tuple((c, canon(r.get(c))) for c in cols))
    out.sort()
    return out


def run_unit_tests(
    spark: SparkSession,
    registry: ModelRegistry,
    tests: list[UnitTest],
    variables: dict | None = None,
) -> list[UnitTestResult]:
    """Run each unit test in an isolated mocked Runner; never touches a
    warehouse. A test whose model raises reports ``error`` instead of a
    row diff (and fails)."""
    results: list[UnitTestResult] = []
    for t in tests:
        try:
            runner = Runner(
                spark,
                registry,
                sources=lambda n, _t=t: _as_df(spark, _t.given[n], n),
                warehouse_dir=None,
                variables={**(variables or {}), **t.vars},
            )
            # pre-seed ref() resolution: a mocked upstream must NOT build
            for up, rows in t.given.items():
                if up in registry:
                    runner._cache[up] = _as_df(spark, rows, up)
            actual_df = runner.ref(t.model)
            cols = sorted({c for row in t.expect for c in row})
            unknown = [c for c in cols if c not in actual_df.columns]
            if unknown:
                raise ValueError(
                    f"expect references columns {unknown} not in the "
                    f"model output {sorted(actual_df.columns)}"
                )
            actual = _normalize(
                [r.asDict() for r in actual_df.select(*cols).collect()], cols
            )
            expected = _normalize(t.expect, cols)
        except Exception as e:  # noqa: BLE001 — report, don't abort the suite
            results.append(UnitTestResult(
                t.name, t.model, passed=False,
                error=f"{type(e).__name__}: {e}",
            ))
            continue
        if actual == expected:
            results.append(UnitTestResult(t.name, t.model, passed=True))
        else:
            exp_pool = list(expected)
            unexpected = []
            for row in actual:
                if row in exp_pool:
                    exp_pool.remove(row)
                else:
                    unexpected.append(row)
            results.append(UnitTestResult(
                t.name, t.model, passed=False,
                unexpected=unexpected, missing=exp_pool,
            ))
    return results
