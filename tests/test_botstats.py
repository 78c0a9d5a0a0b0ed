"""Per-session automation signals (rate + metronomic timing)."""

from datetime import datetime, timedelta

from jassv2_spark.operators.events import session_bot_stats

T0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, "view", 1.0, "{}") for i, (u, t) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def test_metronomic_session_flags_bot(spark):
    # user 1: 6 events exactly 10s apart (metronomic, slow -> still bot);
    # user 2: 6 events with jittered gaps, slow -> human.
    rows = [(1, T0 + timedelta(seconds=10 * i)) for i in range(6)]
    rows += [(2, T0 + timedelta(seconds=s)) for s in (0, 11, 19, 33, 41, 57)]
    got = {(r["user_id"], r["session_idx"]): r
           for r in session_bot_stats(_ev(spark, rows), min_events=5).collect()}
    b1, b2 = got[(1, 1)], got[(2, 1)]
    assert b1["is_bot"] and b1["min_gap_us"] == b1["max_gap_us"] == 10_000_000
    assert not b2["is_bot"] and b2["min_gap_us"] < b2["max_gap_us"]
    assert b1["n_events"] == 6 and b1["duration_us"] == 50_000_000
    # rate: 5 intervals over 50s = 6 events/min -> 6000 milli-epm
    assert b1["epm_milli"] == 6000


def test_high_rate_flags_bot_even_with_jitter(spark):
    # 10 events inside one second, irregular gaps -> rate flag fires.
    ms = (0, 3, 9, 21, 102, 230, 377, 450, 601, 999)
    rows = [(3, T0 + timedelta(milliseconds=m)) for m in ms]
    (row,) = session_bot_stats(_ev(spark, rows), min_events=5).collect()
    assert row["is_bot"] and row["epm_milli"] >= 30_000
    assert row["min_gap_us"] != row["max_gap_us"]


def test_gap_rule_matches_sessionizer_and_small_sessions_pass(spark):
    # 31-minute gap splits sessions; 2-event sessions never flag.
    rows = [(4, T0), (4, T0 + timedelta(seconds=1)),
            (4, T0 + timedelta(minutes=32)), (4, T0 + timedelta(minutes=33))]
    got = session_bot_stats(_ev(spark, rows), gap_minutes=30).collect()
    assert sorted((r["session_idx"], r["n_events"]) for r in got) == [(1, 2), (2, 2)]
    assert not any(r["is_bot"] for r in got)
    # single-event session: zero rate, NULL gaps
    (solo,) = session_bot_stats(_ev(spark, [(5, T0)])).collect()
    assert (solo["epm_milli"], solo["min_gap_us"], solo["is_bot"]) == (0, None, False)
