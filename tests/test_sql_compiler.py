"""Unit tests for the Snowflake-dbt → Spark SQL compiler
(furchild_spark/engine/sql_compiler.py) plus execution-equality proofs
against the hand-ported Python models (reference checkout required for
the latter — skipped when absent, like tests/test_dbt_yaml.py)."""

from __future__ import annotations

import os

import pytest

from furchild_spark.engine import sql_compiler as SC
from furchild_spark.engine.dbt_yaml import reference_dir


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

def test_segments_protect_literals_and_comments():
    sql = "select 'a -- not a comment', \"QUOTED\" -- real\n/* block */ x"
    kinds = [k for k, _ in SC.segments(sql)]
    assert kinds == ["code", "str", "code", "qident", "code", "line",
                     "code", "block", "code"]
    assert SC._join(SC.segments(sql)) == sql


def test_segments_quote_escape():
    sql = "select 'it''s', 2"
    segs = SC.segments(sql)
    assert ("str", "'it''s'") in segs


# ---------------------------------------------------------------------------
# jinja render
# ---------------------------------------------------------------------------

def test_render_ref_source_config_var():
    r = SC.render(
        "{{ config(materialized='incremental', unique_key='k') }}\n"
        "select {{ var('rate', 1.05) }} as r from {{ ref('m1') }} "
        "join {{ source('bronze', 't1') }} using (k)"
    )
    assert r.config["materialized"] == "incremental"
    assert r.refs == ("m1",) and r.sources == (("bronze", "t1"),)
    assert "{ref__m1}" in r.sql and "{src__bronze__t1}" in r.sql
    assert "1.05 as r" in r.sql


def test_render_var_override_and_missing():
    r = SC.render("select {{ var('x') }}", variables={"x": 7})
    assert "7" in r.sql
    with pytest.raises(KeyError):
        SC.render("select {{ var('x') }}")


def test_render_is_incremental_blocks():
    sql = ("select * from {{ ref('m') }}\n"
           "{% if is_incremental() %}where ts > (select max(ts) from "
           "{{ this }}){% endif %}")
    cold = SC.render(sql, is_incremental=False)
    hot = SC.render(sql, is_incremental=True)
    assert "where" not in cold.sql
    assert "where ts >" in hot.sql and "{this}" in hot.sql


def test_render_escapes_braces_for_formatter():
    # regex quantifiers like {2} must survive spark.sql's str.format pass
    r = SC.render("select regexp_substr(x, ':(\\\\d{2})') from {{ ref('m') }}")
    assert "{{2}}" in r.sql


# ---------------------------------------------------------------------------
# dialect rewrites
# ---------------------------------------------------------------------------

def test_dcolon_cast_forms():
    assert SC.to_spark_sql("select a::string") == \
        "select cast(a as string)"
    assert SC.to_spark_sql("select t.c::number(38,2)") == \
        "select cast(t.c as decimal(38,2))"
    assert SC.to_spark_sql("select x::number") == \
        "select cast(x as decimal(38,0))"
    # operand spanning string literals (iff -> if first, then cast)
    out = SC.to_spark_sql("select iff(b, 'TRUE', 'FALSE')::boolean")
    assert out == "select cast(if(b, 'TRUE', 'FALSE') as boolean)"
    # '::' inside a literal is untouched
    assert "'a::b'" in SC.to_spark_sql("select 'a::b'")


def test_bare_varchar_becomes_string():
    assert SC.to_spark_sql("select cast(x as varchar)") == \
        "select cast(x as string)"
    assert "varchar(10)" in SC.to_spark_sql("select cast(x as varchar(10))")
    assert "'varchar'" in SC.to_spark_sql("select 'varchar'")


def test_datediff_units():
    assert SC.to_spark_sql("select datediff(day, a, b)") == \
        "select datediff(b, a)"
    assert SC.to_spark_sql("select datediff('day', a, b)") == \
        "select datediff(b, a)"
    out = SC.to_spark_sql("select datediff(month, s, e)")
    assert "(year(e) - year(s)) * 12" in out and "month(e) - month(s)" in out
    out = SC.to_spark_sql("select datediff('second', s, e)")
    assert "unix_timestamp(cast(e as timestamp))" in out
    # Spark's own 2-arg form passes through
    assert SC.to_spark_sql("select datediff(b, a)") == "select datediff(b, a)"


def test_dateadd_and_convert_timezone():
    assert SC.to_spark_sql("select dateadd(day, -7, current_timestamp())") \
        == "select timestampadd(day, -7, current_timestamp())"
    out = SC.to_spark_sql(
        "select convert_timezone('Asia/Dubai', 'UTC', \"TS\")")
    # quoted identifiers become backticks (Spark default parses "X" as a
    # string literal)
    assert out == \
        "select to_utc_timestamp(cast(`TS` as timestamp), 'Asia/Dubai')"


def test_regexp_substr_occurrence_and_group():
    out = SC.to_spark_sql(
        "select regexp_substr(s, ':(\\\\d{2})', 1, 2, 'e', 1)")
    assert out == ("select try_element_at(regexp_extract_all(s, "
                   "':(\\\\d{2})', 1), 2)")
    out = SC.to_spark_sql("select regexp_substr(s, '\\\\d{1,2}', 1, 2)")
    assert "try_element_at(regexp_extract_all(s, '\\\\d{1,2}', 0), 2)" in out


def test_regexp_like_full_match_and_count():
    out = SC.to_spark_sql("select regexp_like(x, 'a|bb')")
    assert out == "select (x) rlike '^(?:a|bb)$'"
    out = SC.to_spark_sql("select regexp_count(x, '\\\\d')")
    assert "size(regexp_extract_all(x, '\\\\d', 0))" in out
    assert "is null" in out  # NULL subject propagates NULL, not -1


def test_posix_classes_and_leftmost_longest():
    out = SC.to_spark_sql("select regexp_replace(x, '[^[:alnum:]]', '')")
    assert "'[^a-zA-Z0-9]'" in out
    # 2-arg Snowflake regexp_replace removes matches
    out = SC.to_spark_sql("select regexp_replace(x, '[:digit:]')")
    assert out == "select regexp_replace(x, '0-9', '')"
    # literal alternation reordered longest-first (stable)
    out = SC.to_spark_sql(
        "select regexp_replace(x, '^(SO\\\\-|SO|ORD\\\\-|ORD|ORDER\\\\-|ORDER|#)', '')"
    )
    i = out.index
    assert i("ORDER\\\\-") < i("ORD\\\\-") < i("SO\\\\-") < i("#")
    assert out.index("ORDER|") < out.index("ORD|")  # ORDER before bare ORD
    # non-literal alternatives untouched
    out = SC.to_spark_sql("select regexp_replace(x, '(a+|bb)', '')")
    assert "(a+|bb)" in out


def test_iff_try_to_and_misc_functions():
    assert SC.to_spark_sql("select iff(a > b, 1, 0)") == \
        "select if(a > b, 1, 0)"
    assert SC.to_spark_sql("select try_to_date(x)") == \
        "select try_cast(x as date)"
    assert SC.to_spark_sql("select try_to_timestamp_ntz(x)") == \
        "select try_cast(x as timestamp_ntz)"
    assert SC.to_spark_sql("select try_to_decimal(x, 9, 6)") == \
        "select try_cast(x as decimal(9,6))"
    assert SC.to_spark_sql("select to_varchar(x)") == \
        "select cast(x as string)"
    assert SC.to_spark_sql("select zeroifnull(x)") == \
        "select coalesce(x, 0)"
    # nested rewrites compose inside-out
    out = SC.to_spark_sql("select iff(try_to_date(a) is null, 1, 0)")
    assert out == "select if(try_cast(a as date) is null, 1, 0)"


def test_comments_do_not_break_call_args():
    out = SC.to_spark_sql(
        "select regexp_replace(x, -- strips -, _, etc\n  '[-_ ]', '')"
    )
    assert out == "select regexp_replace(x, '[-_ ]', '')"


# ---------------------------------------------------------------------------
# execution equality vs the Python models (needs the reference checkout)
# ---------------------------------------------------------------------------

# The canonical compilable-model list (and the documented exclusions)
# lives next to the catalog entries that consume it — import it so the
# equality suite and the mixed-DAG entry can never drift apart.
from furchild_spark.queries.sql_compiled import COMPILED_MODELS  # noqa: E402


@pytest.mark.skipif(reference_dir() is None,
                    reason="reference dbt project not present")
@pytest.mark.parametrize("model,rel", COMPILED_MODELS,
                         ids=[m for m, _ in COMPILED_MODELS])
def test_compiled_sql_equals_python_model(spark, model, rel):
    """The reference SQL, compiled and executed, is byte-equal to the
    hand-ported Python model over the bronze fixtures — the Python port
    is already value-proven against DuckDB (model__* entries), so the
    compiled text transitively inherits that proof."""
    import datetime as dt

    from furchild_spark.engine.registry import Runner
    from furchild_spark.models import registry

    fixture_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "bronze")
    runner = Runner(
        spark, registry,
        sources=lambda n: spark.read.parquet(f"{fixture_dir}/{n}.parquet"),
        warehouse_dir=None, now=dt.datetime(2024, 6, 2),
    )
    rendered = SC.compile_model_file(
        os.path.join(reference_dir(), "models", rel),
        now=dt.datetime(2024, 6, 2))
    got = SC.run_model_sql(
        spark, rendered,
        source=lambda sch, t: spark.read.parquet(
            f"{fixture_dir}/{t}.parquet"),
        ref=runner.ref,
    )
    want = runner.ref(model)
    cols = sorted(got.columns)
    assert sorted(want.columns) == cols
    a = sorted((tuple(r) for r in got.select(*cols).collect()), key=repr)
    b = sorted((tuple(r) for r in want.select(*cols).collect()), key=repr)
    assert a == b
