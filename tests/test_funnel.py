"""Funnel + cohort retention: brute-force re-simulation on a small log."""

import datetime as dt

from jassv2_spark.operators.events import funnel_conversion, retention_cohorts

T0 = dt.datetime(2024, 1, 1)


def _ts(days, minutes=0):
    return T0 + dt.timedelta(days=days, minutes=minutes)

# (user, ts, type)
LOG = [
    (1, _ts(0, 0), "view"),
    (1, _ts(0, 5), "click"),
    (1, _ts(0, 9), "purchase"),
    (2, _ts(0, 0), "view"),
    (2, _ts(0, 1), "click"),
    (3, _ts(0, 2), "click"),      # click before any view: not converted
    (3, _ts(0, 3), "view"),
    (4, _ts(1, 0), "view"),
    (4, _ts(1, 0), "click"),      # same instant: strict > excludes it
    (1, _ts(7, 0), "view"),
    (2, _ts(9, 0), "click"),
    (3, _ts(20, 0), "view"),
]


def _df(spark):
    return spark.createDataFrame(
        [(u, t, e) for u, t, e in LOG], "user_id long, ts timestamp, event_type string"
    )


def _py_funnel(steps):
    users = {u for u, _, _ in LOG}
    counts = []
    prev = {}
    for i, s in enumerate(steps):
        cur = {}
        for u in users:
            ts = [
                t
                for uu, t, e in LOG
                if uu == u and e == s and (i == 0 or (u in prev and t > prev[u]))
            ]
            if ts:
                cur[u] = min(ts)
        counts.append((i + 1, s, len(cur)))
        prev = cur
    return counts


def test_funnel_strict_order(spark):
    got = {
        (r["step_idx"], r["step"], r["users"])
        for r in funnel_conversion(_df(spark), ["view", "click", "purchase"]).collect()
    }
    assert got == set(_py_funnel(["view", "click", "purchase"]))
    # sanity: user 2 converts view->click, users 3 & 4 do not
    assert (2, "click", 2) in got
    assert (3, "purchase", 1) in got


def _py_retention(period_days=7):
    first = {}
    for u, t, _ in LOG:
        d = t.date()
        first[u] = min(first.get(u, d), d)
    seen = {(u, t.date()) for u, t, _ in LOG}
    cells = {}
    per_user = {
        (u, first[u], (d - first[u]).days // period_days) for u, d in seen
    }
    for _, cohort, period in per_user:
        cells[(cohort, period)] = cells.get((cohort, period), 0) + 1
    return {(c, p, n) for (c, p), n in cells.items()}


def test_retention_cohorts(spark):
    got = {
        (r["cohort_day"], r["period"], r["users"])
        for r in retention_cohorts(_df(spark)).collect()
    }
    assert got == _py_retention()
