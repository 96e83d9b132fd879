"""Brute-force semantic oracles for the time-series catalog.

The DuckDB oracles prove cross-engine parity; these prove the SEMANTICS
against straight-line Python on small seeded-random datasets — an
independent check that both engines aren't sharing one misunderstanding
(e.g. an off-by-one in the rolling window or a gap-fill that leaks
across users).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from furchild_spark.queries import QUERIES


@pytest.fixture(scope="module")
def tiny_sf_dir(spark, tmp_path_factory):
    """A synthetic events table with adversarial shape: multi-day gaps,
    users with a single event, same-day bursts, value ties."""
    rng = random.Random(20260814)
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(1, 13):
        n = rng.choice([1, 2, 5, 9, 14])
        t = base + dt.timedelta(hours=rng.randrange(0, 48))
        for _ in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    t,
                    user,
                    rng.choice(["view", "click", "purchase", "signup"]),
                    round(rng.uniform(0, 100), 2),
                    "{}",
                )
            )
            # gaps from minutes to a week, so calendars have real holes
            t = t + dt.timedelta(minutes=rng.choice([7, 90, 60 * 26, 60 * 24 * 6]))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d = tmp_path_factory.mktemp("tiny_sf")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d), rows


def test_rolling_active_users_brute_force(spark, tiny_sf_dir):
    sf_dir, rows = tiny_sf_dir
    got = {
        r["day"]: (r["dau"], r["wau"])
        for r in QUERIES["rolling_active_users"].fn(spark, sf_dir).collect()
    }
    user_days = {(u, ts.date()) for (_, ts, u, _, _, _) in rows}
    days = sorted({d for (_, d) in user_days})
    for day in days:
        dau = len({u for (u, d) in user_days if d == day})
        wau = len({
            u for (u, d) in user_days
            if day - dt.timedelta(days=6) <= d <= day
        })
        assert got[day] == (dau, wau), f"{day}: {got[day]} != {(dau, wau)}"
    assert set(got) == set(days)


def test_gapfill_forward_fill_brute_force(spark, tiny_sf_dir):
    sf_dir, rows = tiny_sf_dir
    out = QUERIES["gapfill_forward_fill"].fn(spark, sf_dir).collect()
    got = {(r["user_id"], r["day"]): (r["filled_value"], r["is_gap"]) for r in out}

    daily = {}
    for (_, ts, u, et, v, _) in rows:
        if et != "view":
            continue
        k = (u, ts.date())
        daily[k] = max(daily[k], v) if k in daily else v
    expected = {}
    for u in {u for (u, _) in daily}:
        ds = sorted(d for (uu, d) in daily if uu == u)
        last = None
        day = ds[0]
        while day <= ds[-1]:
            if (u, day) in daily:
                last = daily[(u, day)]
                expected[(u, day)] = (last, False)
            else:
                expected[(u, day)] = (last, True)
            day += dt.timedelta(days=1)
    assert got == expected
    # no calendar row may leak outside its user's own observed span
    assert len(out) == len(expected)


def test_retention_matrix_brute_force(spark, tiny_sf_dir):
    sf_dir, rows = tiny_sf_dir
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in QUERIES["retention_matrix"].fn(spark, sf_dir).collect()
    }
    first = {}
    for (_, ts, u, _, _, _) in rows:
        first[u] = min(first.get(u, ts), ts)

    def monday(t):
        d = t.date()
        return d - dt.timedelta(days=d.weekday())

    expected = {}
    seen = set()
    for (_, ts, u, _, _, _) in rows:
        cw = monday(first[u])
        off = (ts.date() - cw).days // 7
        if (u, cw, off) in seen:
            continue
        seen.add((u, cw, off))
        expected[(cw, off)] = expected.get((cw, off), 0) + 1
    assert got == expected


def test_funnel_conversion_brute_force(spark, tiny_sf_dir):
    sf_dir, rows = tiny_sf_dir
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["funnel_conversion"].fn(spark, sf_dir).collect()
    }
    by_user = {}
    for (_, ts, u, et, _, _) in rows:
        by_user.setdefault(u, []).append((ts, et))
    week = dt.timedelta(days=7)
    s1 = s2 = s3 = 0
    for u, evs in by_user.items():
        signups = [t for (t, e) in evs if e == "signup"]
        if not signups:
            continue
        s1 += 1
        t1 = min(signups)
        clicks = [t for (t, e) in evs if e == "click" and t1 < t <= t1 + week]
        if not clicks:
            continue
        s2 += 1
        t2 = min(clicks)
        buys = [t for (t, e) in evs if e == "purchase" and t2 < t <= t2 + week]
        if buys:
            s3 += 1
    assert got == {"s1_signup": s1, "s2_click": s2, "s3_purchase": s3}
