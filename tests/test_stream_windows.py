"""Watermarked tumbling-window rollup under Structured Streaming: batch
equivalence on the exact columns, append-mode emission, and the
late-beyond-watermark drop."""

import time
from datetime import datetime

import pytest

from jassv2_spark.operators.events import tumbling_counts
from jassv2_spark.streaming.windows import tumbling_rollup_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _rows(spec):
    return [
        (i, datetime(2024, 1, 1, h, m), uid, et, float(v))
        for i, (h, m, uid, et, v) in enumerate(spec)
    ]


def _run_stream(spark, src, name, mode):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        tumbling_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_rejects_batch_frame(spark):
    batch = spark.createDataFrame(_rows([(10, 0, 1, "click", 1.0)]), SCHEMA)
    with pytest.raises(ValueError):
        tumbling_rollup_stream(batch)


def test_stream_equals_batch_rollup(spark, tmp_path):
    spec = [
        (10, 5, 1, "click", 1.25), (10, 40, 2, "click", 2.5),
        (10, 50, 1, "view", 0.75), (11, 10, 3, "click", 4.0),
        (12, 30, 1, "view", 0.5),
    ]
    src = str(tmp_path / "ev1")
    batch = spark.createDataFrame(_rows(spec), SCHEMA)
    batch.repartition(2).write.parquet(src)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_milli)
        for r in _run_stream(spark, src, "win_upd", "update").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_milli)
        for r in tumbling_counts(batch).collect()
    }
    assert got == want


def test_append_mode_drops_watermark_late_rows(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: the watermark is
    durable state, so a row arriving in run 2 behind the run-1 watermark
    is dropped — the core late-data guarantee."""
    src = tmp_path / "ev2"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(name):
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = (
            tumbling_rollup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).collect()

    # run 1: two 10:xx clicks plus a 12:30 event — final watermark
    # 12:30 - 1h = 11:30 closes the 10:00 window (emitted, n=2)
    for i, row in enumerate(_rows([(10, 5, 1, "click", 1.0),
                                   (10, 20, 2, "click", 1.0),
                                   (12, 30, 9, "view", 1.0)])):
        spark.createDataFrame([row], SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    out1 = run("win_app1")
    assert sorted((r.window_start.hour, r.event_type, r.n_events) for r in out1) == [
        (10, "click", 2)
    ]

    # run 2: a 10:15 click arrives — behind the checkpointed 11:30
    # watermark, its window already finalized: dropped, nothing emitted
    time.sleep(1.1)
    spark.createDataFrame(
        _rows([(10, 15, 3, "click", 1.0)]), SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    out2 = run("win_app2")
    # the sink still holds only the run-1 rows: the late click was dropped
    assert sorted((r.window_start.hour, r.event_type, r.n_events) for r in out2) == [
        (10, "click", 2)
    ]


def _run_session_stream(spark, src, name, mode="append"):
    from jassv2_spark.streaming.windows import session_rollup_stream

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        session_rollup_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_session_stream_rejects_batch(spark):
    from jassv2_spark.streaming.windows import session_rollup_stream

    batch = spark.createDataFrame(_rows([(10, 0, 1, "click", 1.0)]), SCHEMA)
    with pytest.raises(ValueError):
        session_rollup_stream(batch)


def test_session_stream_gap_merging_matches_batch_sessionizer(spark, tmp_path):
    from jassv2_spark.operators.events import sessionize

    # user 1: events at 10:00, 10:10, 10:25 (one session: gaps < 30m),
    #         then 11:30 (new session: gap 65m)
    # user 2: one event (singleton session)
    spec = [
        (10, 0, 1, "click", 1.0), (10, 10, 1, "view", 2.0),
        (10, 25, 1, "click", 0.5), (11, 30, 1, "view", 4.0),
        (10, 5, 2, "click", 3.0),
    ]
    # session windows only support append mode: a session emits once the
    # watermark passes its end, so a far-future flush event (user 99)
    # advances the watermark past every real session; the flush session
    # itself stays open and is excluded below.
    flush = [(23, 0, 99, "view", 0.0)]
    src = str(tmp_path / "ev_sess")
    batch = spark.createDataFrame(_rows(spec), SCHEMA)
    spark.createDataFrame(_rows(spec + flush), SCHEMA).repartition(2).write.parquet(src)

    got = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value_milli)
        for r in _run_session_stream(spark, src, "sess_app", "append").collect()
        if r.user_id != 99
    }
    # batch sessionizer ground truth (already one row per session)
    want_counts = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionize(batch).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want_counts
    assert got[(1, datetime(2024, 1, 1, 10, 0))] == (3, 3500)
    assert got[(1, datetime(2024, 1, 1, 11, 30))] == (1, 4000)
    assert got[(2, datetime(2024, 1, 1, 10, 5))] == (1, 3000)
