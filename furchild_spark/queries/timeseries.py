"""Time-series / product-analytics catalog over the events table.

Four shapes every analytics engine is asked for sooner or later, each
with an exact DuckDB oracle:

- ``gapfill_forward_fill`` — calendar densification (sequence + explode)
  with last-observation-carried-forward over an ordered window
- ``funnel_conversion``    — staged min-timestamp funnel with bounded
  conversion windows (signup → click → purchase)
- ``retention_matrix``     — weekly cohort × week-offset retention counts
- ``rolling_active_users`` — sliding 7-day distinct users via bounded
  fan-out (explode each user-day into the ≤7 report days it supports),
  NOT a range self-join

Scale notes (100 TB of events): everything aggregates to (user, day) or
(user) grain FIRST — the raw event stream is touched once per query and
reduced with map-side combines before any window or join.  Windows
partition by user (bounded rows per partition), never a global ORDER BY.
The gap-fill explode is bounded by the calendar span, the rolling-DAU
explode by the window width (7) — both linear fan-outs, no n² range
joins on the Spark side (the oracle may use one: it only ever runs at
sf0.01).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import query, table


# ---------------------------------------------------------------------------
# calendar gap-fill + forward fill (LOCF)
# ---------------------------------------------------------------------------

@query(
    "gapfill_forward_fill",
    section="§2.6 calendar densification + last-observation-carried-forward "
    "(engine extra; sequence/explode + ignoreNulls window)",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         MAX(value) AS day_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
), spans AS (
  SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
  FROM daily GROUP BY user_id
), calendar AS (
  SELECT user_id,
         CAST(unnest(generate_series(first_day, last_day, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM spans
)
SELECT c.user_id, c.day,
  LAST_VALUE(d.day_value IGNORE NULLS) OVER (
    PARTITION BY c.user_id ORDER BY c.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS filled_value,
  d.day_value IS NULL AS is_gap
FROM calendar c
LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
""",
)
def gapfill_forward_fill(spark, sf_dir):
    """Densify each user's 'view' series to a daily calendar and forward-
    fill gaps.  The raw stream reduces to (user, day) grain in one
    map-side-combined pass; the calendar explode is bounded by each
    user's own span (days, not events); the LOCF window partitions by
    user, so no task sees more than one user's calendar.  MAX is the
    per-day reducer (deterministic cross-engine; doubles never summed)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.max("value").alias("day_value"))
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.sequence("first_day", "last_day")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# staged conversion funnel
# ---------------------------------------------------------------------------

@query(
    "funnel_conversion",
    section="§2.5 staged min-timestamp funnel with bounded conversion "
    "windows (engine extra)",
    oracle="""
WITH stage1 AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), stage2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN stage1 s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t_signup
    AND e.ts <= s.t_signup + INTERVAL 7 DAY
  GROUP BY e.user_id
), stage3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN stage2 s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.t_click
    AND e.ts <= s.t_click + INTERVAL 7 DAY
  GROUP BY e.user_id
)
SELECT 's1_signup' AS stage, COUNT(*) AS n_users FROM stage1
UNION ALL
SELECT 's2_click' AS stage, COUNT(*) AS n_users FROM stage2
UNION ALL
SELECT 's3_purchase' AS stage, COUNT(*) AS n_users FROM stage3
""",
)
def funnel_conversion(spark, sf_dir):
    """signup → click (≤7d) → purchase (≤7d after the click): each stage
    is a per-user MIN over the *candidate* events joined against the
    previous stage's timestamp.  Stage tables shrink monotonically and
    carry one row per user — bounded by |users|, NOT constant, so no
    forced broadcast hint: Catalyst's size-based planning broadcasts
    them while they fit and falls back to a keyed shuffle join at scale.
    The event stream is scanned once per stage with the event-type
    filter pushed to the scan."""
    e = table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t_signup"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    s2 = (
        clicks.join(s1, F.col("c_user") == F.col("user_id"))
        .filter(
            (F.col("c_ts") > F.col("t_signup"))
            & (F.col("c_ts") <= F.col("t_signup") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id").agg(F.min("c_ts").alias("t_click"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    s3 = (
        purchases.join(s2, F.col("p_user") == F.col("user_id"))
        .filter(
            (F.col("p_ts") > F.col("t_click"))
            & (F.col("p_ts") <= F.col("t_click") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id").agg(F.min("p_ts").alias("t_purchase"))
    )
    def stage(df, name):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
    return (
        stage(s1, "s1_signup")
        .unionAll(stage(s2, "s2_click"))
        .unionAll(stage(s3, "s3_purchase"))
    )


# ---------------------------------------------------------------------------
# weekly cohort retention
# ---------------------------------------------------------------------------

@query(
    "retention_matrix",
    section="§2.5 cohort × week-offset retention (engine extra; "
    "date_trunc week is Monday-start on both engines)",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
    CAST(date_diff('day', f.cohort_week,
                   CAST(date_trunc('day', e.ts) AS DATE)) // 7 AS BIGINT)
      AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset, COUNT(*) AS n_active
FROM activity GROUP BY cohort_week, week_offset
""",
)
def retention_matrix(spark, sf_dir):
    """Classic retention triangle: cohort = Monday of the user's first
    event week, offset = whole weeks since.  The per-user first-seen
    table is one map-side-combined MIN; the join back carries no
    broadcast hint (per-user cardinality is unbounded — Catalyst
    broadcasts while it fits, shuffles on user at scale, keyed either
    way); events reduce to distinct (user, offset) before the final
    count so a user active 1000× in a week counts once.  All integer
    arithmetic (DIV 7 on day counts) — nothing float-ordering-sensitive
    anywhere."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            F.expr("CAST(datediff(CAST(ts AS DATE), cohort_week) DIV 7 AS BIGINT)")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# ---------------------------------------------------------------------------
# sliding 7-day distinct users (DAU / WAU)
# ---------------------------------------------------------------------------

@query(
    "rolling_active_users",
    section="§2.5 sliding-window COUNT DISTINCT via bounded fan-out "
    "(engine extra; the oracle uses the range join the Spark plan "
    "deliberately avoids)",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), days AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day
), dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
SELECT dau.day, dau.dau, wau.wau
FROM dau JOIN wau ON dau.day = wau.day
""",
)
def rolling_active_users(spark, sf_dir):
    """Distinct-over-a-sliding-range can't ride an ordinary window frame
    (COUNT DISTINCT isn't frame-decomposable), and the textbook range
    self-join is O(days × user-days).  Scale path: each (user, day) fact
    supports exactly the 7 report days [day, day+6], so explode that —
    a constant ×7 fan-out at (user, day) grain (already deduped, vastly
    smaller than raw events) — and count distinct users per report day.
    Report days outside the observed range are dropped with a broadcast
    semi join against the observed-day set."""
    e = table(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    supported = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("report_day"),
    )
    wau = (
        supported.join(
            F.broadcast(days.select(F.col("day").alias("report_day"))),
            "report_day", "left_semi",
        )
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, dau.day == wau.report_day)
        .select("day", "dau", "wau")
    )
