"""Engine-capability entries beyond the reference's own model surface:
multidimensional aggregation (ROLLUP), window frames, pivot, and
Gopher/C4-style document quality rules for the training-data pipeline.

The reference (a dbt project) has no equivalents — these are the analytic
and curation primitives a user of a PySpark engine expects on top of the
ported models, so they register LAST (queries/__init__.py import order):
if a driver correctness run truncates again, the reference-parity entries
keep their rows and only these engine extras fall off the end.

Same cross-engine hash rules as the rest of the catalog (see
queries/__init__.py): exact decimal sums cast to double at the boundary,
BIGINT counts, IEEE-deterministic double division only on identical
operands, explicit tiebreaks on every window ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import money, query, table, widen_scan


# money-domain cast — single definition in catalog.py
_m = money


# ---------------------------------------------------------------------------
# multidimensional aggregation — ROLLUP with grouping_id
# ---------------------------------------------------------------------------

@query(
    "rollup_revenue",
    section="engine extra (multidim agg; complements A1-A4)",
    oracle="""
SELECT coalesce(o_orderpriority, '(all)') AS priority,
  coalesce(o_orderstatus, '(all)') AS status,
  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
""",
)
def rollup_revenue(spark, sf_dir):
    """Priority × status revenue with subtotal + grand-total rows in one
    pass. Spark plans ROLLUP as a single Expand + hash agg — one shuffle
    for all grouping sets, with map-side partial aggregation, so at 100 TB
    this costs the same as the finest-grained groupBy alone. grouping_id
    bit order (first col = MSB) matches DuckDB's GROUPING(a, b)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_m("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# window frames — running total + bounded moving average
# ---------------------------------------------------------------------------

@query(
    "window_frames",
    section="engine extra (frame-bounded windows; complements W1-W4)",
    oracle="""
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w_3 AS DOUBLE)
    / CAST(COUNT(*) OVER w_3 AS DOUBLE) AS moving_avg_3,
  CAST(COUNT(*) OVER w_3 AS BIGINT) AS frame_rows
FROM events
WHERE event_type = 'purchase'
WINDOW
  w_run AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_3 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def window_frames(spark, sf_dir):
    """Per-user running revenue and 3-event moving average. Both frames
    share one partitioning (user_id) and one sort (ts, event_id) — Spark
    computes them in a single Window exchange+sort, no second shuffle.
    Sums are exact decimal (double addition is order-sensitive across
    partitions); the avg divides two identical operands → IEEE-identical
    in both engines. Explicit event_id tiebreak makes frames unique."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    order = [F.asc("ts"), F.asc("event_id")]
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_3 = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-2, 0)
    frame_rows = F.count(F.lit(1)).over(w_3)
    return e.select(
        "event_id",
        "user_id",
        F.sum(_m("value")).over(w_run).cast("double").alias("running_total"),
        (F.sum(_m("value")).over(w_3).cast("double") / frame_rows.cast("double")).alias(
            "moving_avg_3"
        ),
        frame_rows.cast("long").alias("frame_rows"),
    )


# ---------------------------------------------------------------------------
# pivot — wide per-entity feature counts
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    section="engine extra (pivot; training-feature construction)",
    oracle="""
SELECT user_id,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
  COUNT(*) AS total
FROM events
GROUP BY user_id
""",
)
def pivot_event_counts(spark, sf_dir):
    """Per-user event-type count vector (the classic feature-matrix
    construction), written as conditional counts over a KNOWN value list
    rather than ``DataFrame.pivot``. Two reasons, both scale:

    - ``.pivot()`` without values runs a distinct-scan job at plan time (a
      driver-blocking action this catalog forbids), and even with values
      Spark plans it as TWO aggregations — groupBy(user, type) + pivotfirst
      — i.e. two exchanges.
    - ``count(when(...))`` compiles to ONE hash agg with map-side partial
      combine: single shuffle on user_id, the minimum any per-user
      aggregate can do (asserted in tests/test_plans.py)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(t)
            for t in EVENT_TYPES
        ],
        F.count(F.lit(1)).alias("total"),
    )


# ---------------------------------------------------------------------------
# Gopher/C4-style quality rules — in-row repetition metrics
# ---------------------------------------------------------------------------

_SPLIT = "string_split(lower(trim(text)), ' ')"


@query(
    "quality_rules",
    section="engine extra (doc quality gates; complements text_stats)",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_SPLIT} AS toks,
    list_transform(range(1, len({_SPLIT})),
                   i -> {_SPLIT}[i] || ' ' || {_SPLIT}[i+1]) AS bg
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CASE WHEN len(bg) = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
    END AS dup_bigram_frac,
    CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
         ELSE CAST(list_max(list_transform(list_distinct(toks),
                u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
              / CAST(len(toks) AS DOUBLE)
    END AS top_token_frac
  FROM t
)
SELECT doc_id, n_tokens, dup_bigram_frac, top_token_frac,
  (n_tokens >= 20 AND dup_bigram_frac <= 0.6 AND top_token_frac <= 0.2)
    AS passes
FROM m
""",
)
def quality_rules(spark, sf_dir):
    """Gopher/C4-style repetition gates, entirely IN-ROW: duplicate-bigram
    fraction and most-frequent-token dominance via higher-order array
    functions — no explode, no shuffle, map-only over the corpus (the
    only plan shape that survives 100 TB of documents; asserted in
    tests/test_plans.py). The per-row distinct×filter count is O(k²) on
    k≈60 tokens — trivial next to the scan.

    Tokenization here is deliberately the plain lower/trim/split the
    oracle can mirror exactly (documents.text is single-spaced); the
    richer normalize_text path is covered by text_stats."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    d = d.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    bg = F.when(n >= 2, F.expr(
        "transform(sequence(0, size(toks) - 2),"
        " i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"
    )).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", "toks", bg.alias("bg"))
    nbg = F.size("bg")
    dup_bigram = F.when(nbg == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("bg")).cast("double") / nbg.cast("double")
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda u: F.size(F.filter(F.col("toks"), lambda x: x == u)),
        )
    )
    top_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        top_count.cast("double") / n.cast("double")
    )
    out = d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        dup_bigram.alias("dup_bigram_frac"),
        top_frac.alias("top_token_frac"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_tokens") >= 20)
        & (F.col("dup_bigram_frac") <= 0.6)
        & (F.col("top_token_frac") <= 0.2),
    )


# ---------------------------------------------------------------------------
# data-mixture report — the per-source accounting a training run starts from
# ---------------------------------------------------------------------------

@query(
    "mixture_report",
    section="engine extra (training-data mixture accounting per source × lang)",
    oracle="""
SELECT source, lang,
  COUNT(*) AS n_docs,
  CAST(SUM(CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT))
    AS BIGINT) AS total_tokens,
  round(
    CAST(SUM(CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE),
    6) AS avg_doc_tokens
FROM documents
GROUP BY source, lang
""",
)
def mixture_report(spark, sf_dir):
    """Docs and token totals per (source, lang) — the table you weight a
    training mixture from. Token counts are computed in-row (map-side)
    then summed with partial aggregation: one shuffle keyed on the tiny
    (source, lang) domain, exact integer sums (no double accumulation)."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).cast("long")
    return (
        d.select("source", "lang", n_tokens.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            # rounded below the cross-engine float noise floor: the raw
            # bigint/bigint quotient is IEEE-identical on both engines, but
            # the driver's hash formats doubles differently than this repo's
            # local check (the one r4 driver-red row) — same noise-floor
            # pattern as stats_moments (queries/curation.py).
            F.round(
                F.sum("n_tokens").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_doc_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing — assign docs to fixed-token-budget training bins
# ---------------------------------------------------------------------------

@query(
    "pack_sequences",
    section="engine extra (greedy sequence packing via window cumsum)",
    oracle="""
SELECT doc_id, shard, n_tokens,
  CAST(floor((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS bin_id
FROM (
  SELECT doc_id, shard, n_tokens,
    SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS cum_tokens
  FROM (
    SELECT doc_id,
      CAST(doc_id % 8 AS BIGINT) AS shard,
      CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tokens
    FROM documents
  )
)
""",
)
def pack_sequences(spark, sf_dir):
    """Deterministic sequence packing: docs are sharded (doc_id % 8 —
    in production a hash), ordered within the shard, and binned by the
    running token count so every bin holds ~512 tokens of consecutive
    docs. One window exchange per shard — no sequential driver loop, no
    Python — which is what makes packing feasible over 100 TB: each
    shard's cumsum is independent, so shards scale out linearly. The
    ``cum - n`` form bins by each doc's START offset (a doc straddling a
    boundary belongs to the bin it started in — greedy first-fit)."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).cast("long")
    staged = d.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("long").alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return staged.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / F.lit(512.0)).cast("long").alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# ranking-window family — ntile / percent_rank / cume_dist / lead / lag
# ---------------------------------------------------------------------------

@query(
    "window_rank_family",
    section="engine extra (ranking windows; complements W1-W4)",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(ntile(4) OVER w AS BIGINT) AS spend_quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  lag(o_totalprice) OVER w AS prev_price,
  lead(o_totalprice) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
""",
)
def window_rank_family(spark, sf_dir):
    """Per-customer spend quartiles, distribution ranks, and neighbor
    prices — the full ranking-window surface in ONE window definition, so
    Spark plans a single exchange+sort for all five functions.
    percent_rank/cume_dist divide identical integer operands in both
    engines → IEEE-identical doubles; lead/lag pass values through
    untouched; explicit o_orderkey tiebreak makes every rank unique."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


# ---------------------------------------------------------------------------
# CUBE — all 2^k grouping combinations in one Expand + one shuffle
# ---------------------------------------------------------------------------

@query(
    "cube_revenue",
    section="engine extra (multidim agg CUBE; complements rollup_revenue)",
    oracle="""
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
  coalesce(l_linestatus, '(all)') AS linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  COUNT(*) AS n_lines,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_revenue(spark, sf_dir):
    """Revenue over every grouping combination of (returnflag, linestatus).
    Spark plans CUBE as one Expand (4 replicas tagged by grouping_id)
    feeding ONE hash aggregate — a single shuffle for all 2^k cuboids,
    vs 4 separate group-bys; partial aggregation still applies map-side.
    grouping_id() uses the standard bit encoding in both engines."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_m("l_extendedprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "gid",
            "n_lines",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# UNPIVOT — wide metric columns → long (metric, value) rows
# ---------------------------------------------------------------------------

@query(
    "unpivot_metrics",
    section="engine extra (unpivot/melt; long-form metric export)",
    oracle="""
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
  l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
""",
)
def unpivot_metrics(spark, sf_dir):
    """Three metric columns melted to (metric, val) rows via
    ``DataFrame.unpivot`` — planned as one Expand (3 output rows per input
    row, zero shuffles, no self-union rescan of the table; the UNION ALL
    oracle form would scan lineitem three times). Values pass through
    untouched — no arithmetic to drift."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    ).withColumn("metric", F.expr("substring(metric, 3)"))


# ---------------------------------------------------------------------------
# higher-order array functions — transform/filter/aggregate in-row
# ---------------------------------------------------------------------------

@query(
    "higher_order_funcs",
    section="engine extra (higher-order array functions; in-row analytics)",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS words
  FROM documents
)
SELECT doc_id,
  CAST(len(words) AS BIGINT) AS n_words,
  CAST(len(list_filter(words, x -> length(x) > 4)) AS BIGINT) AS n_long,
  CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
  CAST(list_sum(list_transform(words, x -> length(x))) AS BIGINT)
    AS total_chars,
  upper(words[1]) AS first_upper,
  list_sort(words)[1] AS min_word
FROM w
""",
)
def higher_order_funcs(spark, sf_dir):
    """The in-row (per-document) analytics surface: transform / filter /
    aggregate / distinct / sort over a words array, all as Catalyst array
    expressions inside whole-stage codegen — zero shuffles, zero Python.
    This is the shape that keeps per-document feature extraction map-only
    at 100 TB (the alternative — explode + groupBy — shuffles every
    token)."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim("text")), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda x: F.length(x) > 4))
        .cast("long").alias("n_long"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.upper(F.element_at(words, 1)).alias("first_upper"),
        F.element_at(F.sort_array(words), 1).alias("min_word"),
    )


# ---------------------------------------------------------------------------
# min/max-normalized fixed-width histogram (profiling a numeric column)
# ---------------------------------------------------------------------------

@query(
    "numeric_histogram",
    section="engine extra (data profiling: 20-bin min/max-normalized "
    "histogram with scalar-broadcast bounds)",
    oracle="""
WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
binned AS (
  SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
         ELSE least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0)) AS BIGINT),
                    CAST(19 AS BIGINT)) END AS bin,
         lo, (hi - lo) / 20.0 AS w
  FROM orders, b
)
SELECT CAST(bin AS BIGINT) AS bin,
  round(lo + CAST(bin AS DOUBLE) * w, 6) AS bin_lo,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM binned GROUP BY bin, lo, w
""",
)
def numeric_histogram(spark, sf_dir):
    """The profile you pull before choosing partition bounds or spotting
    a degenerate value distribution: equal-width bins between the
    column's observed min/max. Two passes, both cheap at any scale — a
    scalar min/max aggregate that BROADCASTS (one row), then a map-side
    binning + 20-key aggregation. Bin edges are IEEE-deterministic
    (identical subtraction/division/floor on identical doubles in both
    engines); the max value lands in the last bin via least(). bin_lo is
    a derived double → rounded to the catalog's 6 dp noise floor. A
    CONSTANT column (hi == lo → zero bin width) degenerates to one bin 0
    holding every row instead of NaN/NULL bins — guarded identically in
    the oracle, so the branch is hash-provable too (r5 ADVICE)."""
    o = table(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    binned = o.crossJoin(F.broadcast(b)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / w),
                F.lit(19).cast("long"),
            )
        )
        .alias("bin"),
        F.col("lo"),
        w.alias("w"),
    )
    return (
        binned.groupBy("bin", "lo", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(
            "bin",
            F.round(
                F.col("lo") + F.col("bin").cast("double") * F.col("w"), 6
            ).alias("bin_lo"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# weighted PageRank over the nation trade graph (iterative relational algo)
# ---------------------------------------------------------------------------

_PR_REV = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
           "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")
_PR_D = "CAST(0.85 AS DOUBLE)"
_PR_TELEPORT = f"(CAST(1.0 AS DOUBLE) - {_PR_D})"


def _pagerank_oracle(iterations: int = 8) -> str:
    """Unrolled PageRank iterations as chained CTEs — the oracle replays
    the EXACT trajectory (decimal-exact contribution sums, 8 dp rounding
    per round) so the value hash proves all `iterations` rounds."""
    ctes = [f"""
WITH rev AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, SUM({_PR_REV}) AS rev_d
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst,
    CAST(rev_d AS DOUBLE)
      / CAST(SUM(rev_d) OVER (PARTITION BY src) AS DOUBLE) AS w
  FROM rev
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT node, 1.0 / CAST(nn.n AS DOUBLE) AS rank FROM nodes CROSS JOIN nn
)"""]
    for k in range(1, iterations + 1):
        ctes.append(f""",
r{k} AS (
  SELECT n.node,
    round({_PR_TELEPORT} / CAST(nn.n AS DOUBLE)
      + {_PR_D} * coalesce(CAST(s.s AS DOUBLE), 0.0), 8) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN (
    SELECT x.node, SUM(x.c) AS s FROM (
      SELECT e.dst AS node, CAST(e.w * r.rank AS DECIMAL(38,18)) AS c
      FROM edges e JOIN r{k - 1} r ON e.src = r.node
    ) x GROUP BY x.node
  ) s ON n.node = s.node
)""")
    ctes.append(f"""
SELECT CAST(r.node AS BIGINT) AS nation_key, n.n_name AS nation,
  r.rank AS pagerank
FROM r{iterations} r JOIN nation n ON r.node = n.n_nationkey
""")
    return "".join(ctes)


@query(
    "pagerank_trade",
    section="engine extra (iterative graph algo beyond CC): weighted "
    "PageRank over the customer-nation -> supplier-nation revenue graph — "
    "the authority score a curation pipeline assigns to domains from a "
    "link graph, as 8 relational join+agg rounds",
    oracle=_pagerank_oracle(8),
)
def pagerank_trade(spark, sf_dir):
    """Authority ranking of nations in the trade graph: edge weights are
    each buyer nation's revenue share toward each supplier nation (exact
    decimal sums; the share division is IEEE-deterministic), then 8
    damped PageRank rounds via operators/graph.py — per round one
    edges⋈ranks equi-join + one dst-keyed aggregation, contributions
    summed EXACTLY in DECIMAL(38,18) and the new rank rounded to 8 dp so
    the trajectory is byte-stable and the oracle can replay it. The node
    count enters as a 1-row broadcast scalar (no driver action); dangling
    nodes deliberately leak mass (documented variant). At 100 TB node
    grain (domains), both per-round shuffles key on the node id — the
    classic Pregel-as-relational plan."""
    from furchild_spark.operators import graph

    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(
            F.sum(
                _m("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _m("l_discount"))
            ).alias("rev_d")
        )
    )
    w_src = Window.partitionBy("src")
    edges = rev.select(
        "src",
        "dst",
        (
            F.col("rev_d").cast("double")
            / F.sum("rev_d").over(w_src).cast("double")
        ).alias("w"),
    )
    ranks = graph.pagerank(
        edges, src="src", dst="dst", weight="w",
        iterations=8, damping=0.85, round_dp=8,
    )
    return ranks.join(
        F.broadcast(n), ranks["node"] == n["n_nationkey"]
    ).select(
        F.col("node").cast("long").alias("nation_key"),
        F.col("n_name").alias("nation"),
        F.col("rank").alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# one-pass table profiling (per-column nulls / distincts / min / max)
# ---------------------------------------------------------------------------

@query(
    "table_profile",
    section="engine extra (data-quality profiling): per-column null "
    "count, distinct count and min/max in ONE scan of the table — the "
    "dbt-docs/Deequ-style profile a pipeline publishes next to every "
    "materialized dataset",
    oracle="""
WITH b AS (
  SELECT COUNT(*) AS n_rows,
    COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
      CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
    COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
      CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
    COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
      MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
    COUNT(o_totalprice) AS c4, COUNT(DISTINCT o_totalprice) AS d4,
      CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn4,
      CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx4,
    COUNT(o_orderdate) AS c5, COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS d5,
      CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS mn5,
      CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS mx5,
    COUNT(o_orderpriority) AS c6, COUNT(DISTINCT o_orderpriority) AS d6,
      MIN(o_orderpriority) AS mn6, MAX(o_orderpriority) AS mx6
  FROM orders
)
SELECT * FROM (
  SELECT 'o_orderkey' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
    CAST(n_rows - c1 AS BIGINT) AS n_nulls, CAST(d1 AS BIGINT) AS n_distinct,
    mn1 AS min_repr, mx1 AS max_repr FROM b
  UNION ALL SELECT 'o_custkey', CAST(n_rows AS BIGINT),
    CAST(n_rows - c2 AS BIGINT), CAST(d2 AS BIGINT), mn2, mx2 FROM b
  UNION ALL SELECT 'o_orderstatus', CAST(n_rows AS BIGINT),
    CAST(n_rows - c3 AS BIGINT), CAST(d3 AS BIGINT), mn3, mx3 FROM b
  UNION ALL SELECT 'o_totalprice', CAST(n_rows AS BIGINT),
    CAST(n_rows - c4 AS BIGINT), CAST(d4 AS BIGINT), mn4, mx4 FROM b
  UNION ALL SELECT 'o_orderdate', CAST(n_rows AS BIGINT),
    CAST(n_rows - c5 AS BIGINT), CAST(d5 AS BIGINT), mn5, mx5 FROM b
  UNION ALL SELECT 'o_orderpriority', CAST(n_rows AS BIGINT),
    CAST(n_rows - c6 AS BIGINT), CAST(d6 AS BIGINT), mn6, mx6 FROM b
)
""",
)
def table_profile(spark, sf_dir):
    """Profile the orders table in one aggregation: every per-column
    measure (non-null count, distinct count, min/max) is an expression in
    a SINGLE agg — Spark plans the multi-distinct via one Expand, so the
    table is scanned once however many columns are profiled; the pivoted
    per-column rows come from exploding an in-memory 6-element array, not
    a second pass. min/max render through type-canonical forms (BIGINT →
    string, DOUBLE through DECIMAL(18,2), TIMESTAMP through DATE) so the
    representation is engine-portable. At 100 TB this is the profile you
    compute WHILE writing a dataset, not a post-hoc scan per column."""
    # widen_scan: the single-row-group input otherwise serializes the
    # Expand + partial multi-distinct aggregate on one core (2.9 s →
    # 1.4 s measured); every measure here is partition-order-free
    o = widen_scan(spark, table(spark, sf_dir, "orders"))
    n_rows = F.count(F.lit(1))

    def measures(c, kind):
        col = F.col(c)
        nn = F.count(col)
        if kind == "key":
            nd = F.count_distinct(col)
            mn, mx = F.min(col).cast("string"), F.max(col).cast("string")
        elif kind == "money":
            nd = F.count_distinct(col)
            mn = F.min(col).cast("decimal(18,2)").cast("string")
            mx = F.max(col).cast("decimal(18,2)").cast("string")
        elif kind == "date":
            nd = F.count_distinct(col.cast("date"))
            mn = F.min(col.cast("date")).cast("string")
            mx = F.max(col.cast("date")).cast("string")
        else:  # str
            nd = F.count_distinct(col)
            mn, mx = F.min(col), F.max(col)
        return [
            (n_rows - nn).cast("long").alias(f"nulls_{c}"),
            nd.cast("long").alias(f"nd_{c}"),
            mn.alias(f"mn_{c}"),
            mx.alias(f"mx_{c}"),
        ]

    cols = [
        ("o_orderkey", "key"), ("o_custkey", "key"),
        ("o_orderstatus", "str"), ("o_totalprice", "money"),
        ("o_orderdate", "date"), ("o_orderpriority", "str"),
    ]
    aggs = [n_rows.cast("long").alias("n_rows")]
    for c, kind in cols:
        aggs.extend(measures(c, kind))
    one = o.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"nulls_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_repr"),
                F.col(f"mx_{c}").alias("max_repr"),
            )
            for c, _ in cols
        ]
    )
    return one.select(
        "n_rows", F.explode(per_col).alias("p")
    ).select(
        F.col("p.column_name").alias("column_name"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_repr").alias("min_repr"),
        F.col("p.max_repr").alias("max_repr"),
    )


# ---------------------------------------------------------------------------
# native VARIANT semi-structured path (Spark 4 parse_json / variant_get)
# ---------------------------------------------------------------------------

@query(
    "variant_props_rollup",
    section="engine extra (modern F5 twin): Spark 4 native VARIANT — "
    "parse_json once, typed variant_get extraction, malformed-input "
    "null-safety via try_parse_json; the binary-encoded semi-structured "
    "path that replaces from_json-with-declared-schema when the shape "
    "is open-ended",
    oracle="""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(*) FILTER (WHERE props IS NULL OR NOT json_valid(props))
       AS BIGINT) AS n_unparseable,
  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
)
def variant_props_rollup(spark, sf_dir):
    """The F5 JSON path on Spark 4's native VARIANT type instead of
    ``from_json`` with a declared schema: ``parse_json`` decodes each
    props payload ONCE into the binary VARIANT encoding, every
    ``variant_get`` then navigates the binary form (no re-parse per
    path, and columnar readers can shred hot paths at scan time —
    the open-schema answer when producers add fields freely).
    ``try_parse_json`` gives the malformed-row null path the staging
    models implement with try_cast. Plan is a single map-side-combined
    aggregation — the JSON never shuffles, only the extracted longs."""
    e = table(spark, sf_dir, "events")
    # try_parse_json in the VALUE path too — strict parse_json would
    # throw on the first malformed row, the exact input this entry's
    # null-safety column exists to tolerate
    v = F.variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select(
            "event_type",
            v.alias("k"),
            F.try_parse_json(F.col("props")).isNull().alias("bad"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("bad"), 1).otherwise(0))
            .cast("long").alias("n_unparseable"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )
