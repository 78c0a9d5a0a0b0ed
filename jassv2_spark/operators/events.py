"""Event-stream analytics operators (sessionization, tumbling windows).

The reference engine is batch IR only; these cover the event-log side of a
large-scale training-data pipeline (user sessions for interaction data,
time-bucketed rollups for monitoring the crawl/ingest firehose). Both are
pure DataFrame plans:

- `sessionize`: the classic gap-based session split — lag() over a
  (user_id, ts) window, cumulative-sum of session-start flags, then one
  per-(user, session) aggregate. The only shuffle is keyed on user_id; a
  Zipf-hot user skews it, which is why the window never materialises
  per-user arrays (lag/sum are streaming window ops, constant memory).
- `tumbling_counts`: epoch-aligned tumbling windows via the built-in
  `window()` expression — identical semantics to the Structured Streaming
  plan (`readStream` + `withWatermark` + the same groupBy), so the batch
  oracle here doubles as the correctness model for the streaming path in
  `jassv2_spark.streaming`.

Float-sum determinism: aggregate of raw doubles is partial-order dependent,
so cross-engine comparable sums use `floor(value * 1000)` fixed-point
(exact IEEE ops, associative integer sum) — same trick as the fixed-point
1/rank accumulation in `operators/evaluate.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    sum_value_milli): gap-based sessions — a new session starts when the
    time since the user's previous event exceeds `gap_minutes`.

    session_idx is 1-based per user in time order; deterministic under ties
    via the `order_tiebreak` column.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # timestamp_diff (not unix_micros) so TIMESTAMP and TIMESTAMP_NTZ both work
    gap = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    is_new = F.when(prev_ts.isNull() | (gap > F.lit(gap_us)), 1).otherwise(0)
    sess = F.sum(is_new).over(
        Window.partitionBy(user_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(order_tiebreak),
            F.col("value"),
            sess.cast("long").alias("session_idx"),
        )
        .groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long")).alias(
                "sum_value_milli"
            ),
        )
    )


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(window_start, event_type, n_events, n_users, sum_value_milli):
    epoch-aligned tumbling-window rollup per event type. Identical groupBy
    runs under Structured Streaming with a watermark on `ts_col`."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_size).alias("w"), F.col(type_col)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long")).alias(
                "sum_value_milli"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n_events",
            "n_users",
            "sum_value_milli",
        )
    )
