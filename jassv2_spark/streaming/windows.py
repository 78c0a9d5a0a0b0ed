"""Event-time windowed aggregation under Structured Streaming.

The streaming twin of ``operators.events.tumbling_counts``: the same
epoch-aligned tumbling groupBy, run over a streaming DataFrame with an
event-time WATERMARK so late data is handled with bounded state —
watermark-late rows are dropped, in-watermark late rows update their
window, and (in append mode) a window is emitted exactly once, when the
watermark passes its end.

One deliberate divergence from the batch rollup: streaming aggregation
cannot do exact countDistinct (state would be unbounded per window), so
``n_users`` becomes ``n_users_approx`` via HLL++ (approx_count_distinct) —
the standard swap; n_events and the fixed-point value sum stay exact.

At scale this is the canonical Spark shape: state is keyed by
(window, event_type) — bounded by watermark horizon × type cardinality —
and the shuffle is the same single keyed exchange as the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_rollup_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(window_start, event_type, n_events, n_users_approx,
    sum_value_milli) over a STREAMING events DataFrame.

    Append output mode gives exactly-once window emission (a window's row
    appears when the watermark passes window end); update mode re-emits a
    window on every in-watermark late arrival."""
    if not events.isStreaming:
        raise ValueError("tumbling_rollup_stream needs a streaming DataFrame; "
                         "use operators.events.tumbling_counts for batch")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.approx_count_distinct("user_id").cast("long").alias("n_users_approx"),
            F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long")).alias(
                "sum_value_milli"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n_events",
            "n_users_approx",
            "sum_value_milli",
        )
    )


def session_rollup_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value_milli):
    gap-based SESSION windows per user over a streaming DataFrame — the
    streaming twin of ``operators.events.sessionize``, expressed with
    Spark's native ``session_window`` (the idiomatic replacement for a
    hand-rolled applyInPandasWithState sessionizer: dynamic-gap merging,
    watermark-bounded state and append-mode exactly-once emission come
    from the engine).

    A session closes once the watermark passes last-event + gap; in
    append mode each session row is emitted exactly once. Boundary
    semantics are half-open: an event landing EXACTLY gap after the
    previous one starts a new session (the batch sessionizer keeps it —
    its rule is strictly-greater; the divergence exists only at the
    exact boundary instant).

    At scale: state is (user, open-session) — one small row per active
    user bounded by the watermark horizon; the shuffle is one
    user-keyed exchange, identical to the batch sessionizer's."""
    if not events.isStreaming:
        raise ValueError("session_rollup_stream needs a streaming DataFrame; "
                         "use operators.events.sessionize for batch")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long")).alias(
                "sum_value_milli"
            ),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value_milli",
        )
    )
