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
