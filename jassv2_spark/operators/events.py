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


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(window_start, event_type, n_events, n_users, sum_value_milli):
    epoch-aligned SLIDING-window rollup — the overlapping-window companion
    to :func:`tumbling_counts` (slide < window ⇒ each event lands in
    window/slide windows; the moving-average shape dashboards want).
    `F.window(ts, size, slide)` under the hood, so the identical groupBy
    runs under Structured Streaming with a watermark on `ts_col`.

    Scale shape: map-side fan-out of window/slide rows per event followed
    by one (window, type)-keyed partial agg — the same single exchange as
    the tumbling plan, just window/slide× the pre-agg rows (a constant,
    not a function of corpus size)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_size, slide).alias("w"), F.col(type_col)
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


def trending_terms(
    docs: DataFrame,
    doc_ts: DataFrame,
    bucket_s: int = 3600,
    top_m: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    tokenizer: str = "parity",
) -> DataFrame:
    """(bucket, term, df, prev_df, delta, trend_rank): the top-`top_m`
    document-frequency RISERS per time bucket vs the previous bucket —
    the trending-terms analytic every content platform runs over a
    timestamped crawl (window-over-window df delta; `vocab_diff` is the
    same comparison between two whole builds). All exact integers.

    Buckets are RELATIVE to the corpus' earliest timestamp
    (bucket = (epoch(ts) − epoch(min ts)) DIV bucket_s), so the layout is
    a pure function of the inputs — session timezone and absolute epoch
    cancel. The first bucket trends against an empty predecessor
    (prev_df 0: everything is new, deterministically).

    Scale shape: one tokenize pass → DISTINCT (bucket, term, doc) →
    (bucket, term)-keyed partial-agg df (vocabulary×buckets rows, never
    corpus-sized); prev_df is a self equi-join on (term, bucket−1); the
    per-bucket top-m window partitions by bucket — parallel across
    buckets, each task over one bucket's vocabulary."""
    from jassv2_spark.functions.tokenizer import spark_tokens

    ts = doc_ts.select(
        F.col(id_col).alias("doc_id"),
        F.unix_timestamp(F.col(ts_col)).alias("__epoch"),
    )
    ref = ts.agg(F.min("__epoch").alias("__ref"))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(spark_tokens(text_col, mode=tokenizer)).alias("term"),
    )
    per_bucket = (
        toks.join(ts, "doc_id")
        .crossJoin(F.broadcast(ref))
        .select(
            F.expr(f"(__epoch - __ref) DIV {int(bucket_s)}").alias("bucket"),
            "term",
            "doc_id",
        )
        .distinct()
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    prev = per_bucket.select(
        (F.col("bucket") + 1).alias("bucket"), "term",
        F.col("df").alias("prev_df"),
    )
    joined = (
        per_bucket.join(prev, ["bucket", "term"], "left")
        .na.fill(0, ["prev_df"])
        .withColumn("delta", (F.col("df") - F.col("prev_df")).cast("long"))
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("delta").desc(), F.col("term").asc()
    )
    return (
        joined.withColumn("trend_rank", F.row_number().over(w).cast("long"))
        .where(F.col("trend_rank") <= F.lit(int(top_m)))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "term", "df",
            F.col("prev_df").cast("long").alias("prev_df"),
            "delta", "trend_rank",
        )
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(step_idx, step, users): strictly-ordered funnel — a user converts
    at step i when they have a step-i event STRICTLY after their earliest
    step-(i-1) conversion time (the classic clickstream funnel; earliest-
    completion semantics make the count deterministic and engine-portable:
    only min-timestamps and counts, no floats).

    Scale shape: one (user)-keyed partial agg per step plus a (user)-keyed
    equi-join of the shrinking converted-users frame back onto the events
    of the next step — each stage is a standard hash-agg exchange on
    user_id; nothing is ever per-user materialized as an array."""
    out_rows = None
    prev = None  # (user_id, t): earliest completion of the previous step
    for i, step in enumerate(steps):
        ev = events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("et"),
        ).where(F.col("et") == step)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev.withColumnRenamed("t", "__pt"), "user_id")
                .where(F.col("ts") > F.col("__pt"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        row = cur.agg(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).cast("long").alias("users"),
        )
        out_rows = row if out_rows is None else out_rows.unionByName(row)
        prev = cur
    return out_rows


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """(cohort_day, period, users): classic cohort retention — users are
    cohorted by the calendar day of their first event; `period` is the
    whole number of `period_days` blocks between cohort day and each
    active day, counted once per (user, period). All date/day arithmetic
    is exact integer (datediff of DATEs), so the matrix is engine-portable.

    Scale shape: one (user)-keyed min-agg for cohorts (broadcast-sized
    relative to events only when users ≪ events — it stays a keyed
    equi-join either way), then one (cohort, period)-keyed distinct-count
    agg; both standard partial-agg exchanges."""
    first = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.min(F.col(ts_col).cast("date")).alias("cohort_day")
    )
    act = events.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).cast("date").alias("day")
    ).distinct()
    return (
        act.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.datediff("day", "cohort_day") / F.lit(int(period_days)))
            .cast("long")
            .alias("period"),
        )
        .distinct()
        .groupBy("cohort_day", "period")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def session_bot_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    *,
    min_events: int = 5,
    max_epm_milli: int = 30_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(user_id, session_idx, n_events, duration_us, epm_milli,
    min_gap_us, max_gap_us, is_bot): per-session automation signals —
    the traffic-hygiene pass a webtext pipeline runs before trusting
    click/crawl logs (automated sessions poison both analytics and any
    training data derived from them).

    Sessions follow :func:`sessionize`'s exact gap rule (same window,
    same tie-break). Signals, all exact integers: event rate
    epm_milli = (60·10⁹·(n−1)) DIV duration_us (milli-events/minute
    over the n−1 inter-arrival intervals; 0 for single-event or
    zero-duration sessions) and the min/max inter-arrival gap.
    is_bot = n_events ≥ min_events AND (rate above `max_epm_milli` OR
    metronomic timing min_gap == max_gap — human traffic jitters,
    schedulers don't).

    Scale shape: one (user)-keyed window pass (same exchange the
    sessionizer already pays) + one (user, session) partial agg; no
    floats, no driver hops."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col))
    is_new = F.when(prev_ts.isNull() | (gap > F.lit(gap_us)), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # a gap belongs to the session it CLOSES; session-opening rows carry NULL
    in_sess_gap = F.when(is_new == 1, F.lit(None).cast("long")).otherwise(gap)
    per = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            sess.cast("long").alias("session_idx"),
            in_sess_gap.alias("g"),
        )
        .groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col))
            .cast("long")
            .alias("duration_us"),
            F.min("g").cast("long").alias("min_gap_us"),
            F.max("g").cast("long").alias("max_gap_us"),
        )
    )
    epm = F.when(
        (F.col("n_events") >= 2) & (F.col("duration_us") > 0),
        F.expr("(60000000000 * (n_events - 1)) div duration_us"),
    ).otherwise(F.lit(0))
    return per.withColumn("epm_milli", epm.cast("long")).select(
        user_col,
        "session_idx",
        "n_events",
        "duration_us",
        "epm_milli",
        "min_gap_us",
        "max_gap_us",
        (
            (F.col("n_events") >= min_events)
            & (
                (F.col("epm_milli") >= max_epm_milli)
                | (F.col("min_gap_us") == F.col("max_gap_us"))
            )
        ).alias("is_bot"),
    )


def position_ctr(
    impressions: DataFrame,
    rank_col: str = "rank",
    click_col: str = "clicked",
) -> DataFrame:
    """(rank, n_impressions, n_clicks, ctr_micros): the global
    position-bias curve of a SERP impression log — CTR by displayed
    rank, the examination prior of the position-based click model
    (PBM, Craswell et al. WSDM'08) and the denominator COEC debiases
    against. Exact int64 counts; ctr_micros is the one fixed IEEE
    floor(1e6·clicks/imps) chain per rank.

    Scale shape: one rank-keyed partial-agg shuffle over the log —
    combiner-friendly, output is ≤ SERP-depth rows."""
    clicked = F.col(click_col).cast("boolean")
    return (
        impressions.groupBy(F.col(rank_col).alias("rank"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_impressions"),
            F.sum(clicked.cast("long")).cast("long").alias("n_clicks"),
        )
        .select(
            "rank",
            "n_impressions",
            "n_clicks",
            F.floor(
                F.lit(1000000.0)
                * F.col("n_clicks").cast("double")
                / F.col("n_impressions").cast("double")
            )
            .cast("long")
            .alias("ctr_micros"),
        )
    )


def item_coec(
    impressions: DataFrame,
    item_col: str = "item_id",
    rank_col: str = "rank",
    click_col: str = "clicked",
) -> DataFrame:
    """(item_id, n_impressions, n_clicks, sum_ctr_micros, coec_micros):
    clicks over expected clicks (COEC, Zhang & Jones 2007) — each
    item's click count debiased by WHERE it was shown: expected clicks
    = Σ over its impressions of the global rank-CTR from
    :func:`position_ctr`. COEC > 1e6 (micros) means the item
    out-performs its positions; the standard position-debiased
    relevance prior for LTR labels. sum_ctr_micros is an exact int64
    sum of per-rank micros; coec_micros is one fixed IEEE
    floor(1e12·clicks/sum) chain (exact while clicks < 2^53/1e12,
    deterministic always).

    Scale shape: the ≤ depth-row CTR table broadcasts onto the log
    (map-side probe), then ONE item-keyed partial-agg shuffle."""
    ctr = position_ctr(impressions, rank_col=rank_col, click_col=click_col)
    clicked = F.col(click_col).cast("boolean")
    joined = impressions.join(
        F.broadcast(ctr.select(F.col("rank").alias("__ctr_rank"), "ctr_micros")),
        F.col(rank_col) == F.col("__ctr_rank"),
    )
    agg = joined.groupBy(F.col(item_col).alias("item_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_impressions"),
        F.sum(clicked.cast("long")).cast("long").alias("n_clicks"),
        F.sum("ctr_micros").cast("long").alias("sum_ctr_micros"),
    )
    return agg.select(
        "item_id",
        "n_impressions",
        "n_clicks",
        "sum_ctr_micros",
        F.when(F.col("sum_ctr_micros") > 0,
               F.floor(
                   F.lit(1000000000000.0)
                   * F.col("n_clicks").cast("double")
                   / F.col("sum_ctr_micros").cast("double")
               ).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("coec_micros"),
    )


def ab_test_conversion(
    events: DataFrame,
    *,
    conversion_event: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """ONE row (n_a, conv_a, n_b, conv_b, conv_a_ppm, conv_b_ppm,
    z_micros): the two-proportion z-test every experimentation pipeline
    runs on its event log. Users split into variants by the portable
    md5-32 hash (mod 2 — the deterministic bucketing `split_assign`
    uses for corpora); a user CONVERTS if they emit ≥1
    `conversion_event`. Rates are exact-integer ppm; z is the pooled
    two-proportion statistic

        z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

    computed as ONE fixed IEEE chain over the four exact int64 counts
    (sqrt/div/mul are correctly rounded, the operand order is pinned,
    so the floor-micros value is bitwise cross-engine — the repo's
    fixed-point recipe). z is NULL when p̂ ∈ {0, 1} (zero variance);
    an experiment where a whole arm received no users emits no row
    (the cross join of an empty arm — run a bigger experiment).

    Scale shape: one user-keyed partial agg (converted = max over the
    user's events) then a 2-row variant agg — a 10^12-event log costs
    one shuffle keyed on user_id."""
    per_user = (
        events.select(
            F.col(user_col).alias("u"),
            (F.col(type_col) == conversion_event).cast("int").alias("c"),
        )
        .groupBy("u")
        .agg(F.max("c").alias("converted"))
        .select(
            (
                F.conv(F.substring(F.md5(F.col("u").cast("string")), 1, 8), 16, 10)
                .cast("long") % 2
            ).alias("variant"),
            "converted",
        )
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    a = arms.where(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = arms.where(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    joined = a.crossJoin(b)
    z = F.expr(
        "CASE WHEN n_a > 0 AND n_b > 0"
        " AND (conv_a + conv_b) > 0 AND (conv_a + conv_b) < (n_a + n_b) THEN"
        " floor(1000000.0 * ((cast(conv_a as double) / cast(n_a as double)"
        "                     - cast(conv_b as double) / cast(n_b as double))"
        " / sqrt((cast(conv_a + conv_b as double) / cast(n_a + n_b as double))"
        "        * (1.0 - cast(conv_a + conv_b as double) / cast(n_a + n_b as double))"
        "        * (1.0 / cast(n_a as double) + 1.0 / cast(n_b as double)))))"
        " END"
    )
    return joined.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.expr("1000000 * conv_a div n_a").cast("long").alias("conv_a_ppm"),
        F.expr("1000000 * conv_b div n_b").cast("long").alias("conv_b_ppm"),
        z.cast("long").alias("z_micros"),
    )
