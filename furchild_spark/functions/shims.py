"""Snowflake-semantics shims as pure Column helpers (SURVEY.md §2.7).

Everything here emits built-in Catalyst expressions — **no Python UDFs** —
so whole-stage codegen and predicate pushdown are preserved (SURVEY §2.9:
the reference has no UDFs either; keep it that way for 100 TB scale).

Each helper cites the reference usage it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "empty_to_null",
    "norm_ws",
    "normalize_order_id",
    "normalize_slot_text",
    "surrogate_key",
    "dedup_keep_latest",
    "try_to_date",
    "try_to_timestamp_ntz",
    "try_to_decimal",
    "try_to_number",
    "try_cast_float",
    "sf_datediff_day",
    "sf_datediff_month",
    "sf_datediff_second",
    "sf_regexp_like",
    "regexp_substr_occ",
    "to_utc_from",
    "iff",
    "str_to_bool",
    "d386",
    "z386",
    "c100_386",
]

SURROGATE_NULL = "_dbt_utils_surrogate_key_null_"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# string hygiene
# ---------------------------------------------------------------------------

def empty_to_null(col) -> Column:
    """``nullif(trim(x), '')`` — the empty→NULL idiom
    (reference models/staging/stg_addresses.sql:12-36)."""
    return F.nullif(F.trim(_c(col)), F.lit(""))


def norm_ws(col) -> Column:
    """Collapse runs of whitespace to a single space
    (reference models/staging/stg_orders.sql:25-32)."""
    return F.regexp_replace(_c(col), r"\s+", " ")


def normalize_order_id(col) -> Column:
    """Order-id normalization, byte-for-byte the reference's three nested
    regexp_replace calls (models/staging/stg_transactions.sql:51-61 ==
    stg_orders.sql:68-76):

    1. strip a leading ``SO-|SO|ORD-|ORD|ORDER-|ORDER|#`` prefix
    2. drop ``-``, ``_``, spaces
    3. keep only alphanumerics (Snowflake POSIX ``[[:alnum:]]`` → Java
       ``[^a-zA-Z0-9]``, SURVEY §2.7 regex table)

    ⚠ Snowflake regex is POSIX ERE (alternation = leftmost-LONGEST) while
    Java regex is leftmost-FIRST; the reference's alternative order
    ``ORD-|ORD|ORDER-...`` would strip only ``ORD-`` from ``ORDER-77`` under
    Java. Reordering alternatives longest-first reproduces the POSIX result
    exactly for this fixed alternative set.
    """
    out = F.regexp_replace(F.trim(_c(col).cast("string")), r"^(ORDER\-|ORDER|ORD\-|ORD|SO\-|SO|#)", "")
    out = F.regexp_replace(out, r"[-_ ]", "")
    out = F.regexp_replace(out, r"[^a-zA-Z0-9]", "")
    return out.cast("string")


def normalize_slot_text(col) -> Column:
    """Delivery-slot free-text normalization: en/em dash → '-', collapse
    whitespace, trim, lower (reference models/staging/stg_orders.sql:25-32,
    stg_delivery_slots.sql:8-15)."""
    out = F.replace(_c(col).cast("string"), F.lit("–"), F.lit("-"))
    out = F.replace(out, F.lit("—"), F.lit("-"))
    return F.lower(F.trim(norm_ws(out)))


# ---------------------------------------------------------------------------
# surrogate keys (parity-critical, SURVEY §2.7 hash table)
# ---------------------------------------------------------------------------

def surrogate_key(*cols) -> Column:
    """``dbt_utils.generate_surrogate_key`` expansion:
    ``md5(concat_ws('-', coalesce(cast(c as string), <sentinel>), ...))``
    (reference models/staging/stg_addresses.sql:103; hand-inlined twin at
    fct_orders.sql:163 — both forms MUST agree, they are join keys at
    fct_customers.sql:14-15)."""
    parts = [
        F.coalesce(_c(c).cast("string"), F.lit(SURROGATE_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


# ---------------------------------------------------------------------------
# dedup-keep-latest (the QUALIFY rewrite, SURVEY §2.2 P5/P6)
# ---------------------------------------------------------------------------

def dedup_keep_latest(df, keys, order_cols):
    """``qualify row_number() over (partition by keys order by ...) = 1``
    (reference models/staging/stg_orders.sql:93-96 and 9 other sites).

    ``order_cols`` are Columns already carrying desc()/asc() ordering.
    At scale this is a single shuffle on ``keys``; AQE handles skew.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*[_c(k) for k in keys]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# try_* casts (Snowflake lenient parsing under ANSI Spark)
# ---------------------------------------------------------------------------

def try_to_date(col) -> Column:
    """Snowflake ``try_to_date`` (reference stg_orders.sql:24): NULL on
    unparseable input, no ANSI error."""
    return _try_cast(_c(col), "date")


def try_to_timestamp_ntz(col) -> Column:
    """Snowflake ``try_to_timestamp_ntz`` (reference stg_addresses.sql:39)."""
    return _try_cast(_c(col), "timestamp")


def try_to_decimal(col, precision: int, scale: int) -> Column:
    """Snowflake ``try_to_decimal(x, p, s)`` (reference stg_addresses.sql:35-36).

    Snowflake *rounds* when the value has more fractional digits than the
    target scale; Spark try_cast also rounds (half-up) — parity verified in
    tests/test_shims.py.
    """
    return _try_cast(_c(col), f"decimal({precision},{scale})")


def try_to_number(col, precision: int = 38, scale: int = 0) -> Column:
    return try_to_decimal(col, precision, scale)


def try_cast_float(col) -> Column:
    """Snowflake ``try_cast(x as float)`` (reference stg_customers.sql:36-37)."""
    return _try_cast(_c(col), "double")


def _try_cast(col: Column, t: str) -> Column:
    return col.try_cast(t)


# ---------------------------------------------------------------------------
# datediff family (SURVEY §2.7 ⚠: Snowflake arg order + month semantics)
# ---------------------------------------------------------------------------

def sf_datediff_day(start, end) -> Column:
    """Snowflake ``datediff(day, start, end)`` = Spark ``datediff(end, start)``
    (reference fct_customers.sql:30)."""
    return F.datediff(_c(end), _c(start))


def sf_datediff_month(start, end) -> Column:
    """Snowflake ``datediff(month, start, end)`` counts **month boundaries
    crossed** — (y2-y1)*12 + (m2-m1) — regardless of day-of-month; NOT
    Spark's fractional ``months_between`` (reference
    fct_customer_monthly_revenue.sql:24-28)."""
    s, e = _c(start), _c(end)
    return ((F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))).cast("int")


def sf_datediff_second(start, end) -> Column:
    """Snowflake ``datediff(second, start, end)`` (reference
    fct_orders.sql:135, the as-of join proximity term)."""
    return _c(end).cast("long") - _c(start).cast("long")


# ---------------------------------------------------------------------------
# regex (SURVEY §2.7 regex table)
# ---------------------------------------------------------------------------

def sf_regexp_like(col, pattern: str) -> Column:
    """Snowflake ``regexp_like`` is FULL-match; Spark ``rlike`` is find —
    wrap the whole pattern in a non-capturing group and anchor both ends so
    top-level alternations (``a|b``) stay full-match
    (reference stg_delivery_slots.sql:98,101)."""
    return _c(col).rlike("^(?:" + pattern + ")$")


def regexp_substr_occ(col, pattern: str, occurrence: int, group: int = 0) -> Column:
    """Snowflake ``regexp_substr(s, pat, 1, occurrence[, 'e', group])`` —
    nth occurrence, optional capture group (reference
    stg_delivery_slots.sql:35-40). Spark's regexp_extract has no occurrence
    arg → ``element_at(regexp_extract_all(...), n)`` (NULL when absent:
    element_at on an out-of-range index returns NULL only with
    ``try_element_at``)."""
    arr = F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(group))
    return F.try_element_at(arr, F.lit(occurrence))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def to_utc_from(col, tz: str = "Asia/Dubai") -> Column:
    """Snowflake ``convert_timezone(tz, 'UTC', ts)`` for NTZ input
    (reference stg_orders.sql:17-21). The cast lets TIMESTAMP_NTZ inputs
    (Spark 4's type for non-UTC-adjusted parquet) through; with the session
    TZ pinned to UTC it is wall-clock-preserving."""
    return F.to_utc_timestamp(_c(col).cast("timestamp"), tz)


def iff(cond: Column, a, b) -> Column:
    """Snowflake ``iff`` (reference stg_delivery_slots.sql:52-79)."""
    return F.when(cond, a).otherwise(b)


def str_to_bool(col, truthy=("1", "TRUE", "Y")) -> Column:
    """Snowflake ``iff(upper(nullif(trim(x),'')) in ('1','TRUE','Y'),'TRUE','FALSE')::boolean``
    (reference stg_addresses.sql:31-32). NULL input → FALSE (the reference's
    iff returns 'FALSE' when the IN is NULL? No: IN over NULL yields NULL,
    iff(NULL,...) takes the else branch → FALSE). Parity: NULL → False."""
    return F.when(F.upper(empty_to_null(col)).isin(*truthy), F.lit(True)).otherwise(F.lit(False))


# ---------------------------------------------------------------------------
# the decimal(38,6) numeric domain (reference fct_order_items.sql:7-11)
# ---------------------------------------------------------------------------

def d386(col) -> Column:
    """Cast into the fact-math numeric domain decimal(38,6)."""
    return _c(col).cast("decimal(38,6)")


def z386() -> Column:
    return F.lit(0).cast("decimal(38,6)")


def c100_386() -> Column:
    return F.lit(100).cast("decimal(38,6)")
