"""Repeated-span exact-substring dedup, PII scrubbing, and deterministic
train/val split — hand-checkable semantics + determinism."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.dedup import repeated_spans
from jassv2_spark.operators.textstats import pii_scrub, split_assign


def test_repeated_spans_cross_doc(spark):
    boiler = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {boiler} gamma delta"),
            (2, f"{boiler} epsilon zeta eta theta iota kappa"),
            (3, "nothing shared here at all whatsoever in this document"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
           for r in repeated_spans(docs, length=8, min_count=2).collect()}
    # doc 1: boiler at token offset 2..10; 8-token windows at 2 and 3 merge
    assert out[1] == (2, 10, 9)
    # doc 2: boiler at offset 0..8
    assert out[2] == (0, 8, 9)
    assert 3 not in out


def test_repeated_spans_self_repeat(spark):
    # pure-alpha tokens: the tokenizer splits alnum mixes like "a1" -> "a","1"
    eight = "ape bat cow dog elk fox gnu hen"
    docs = spark.createDataFrame(
        [(1, f"{eight} fillerx fillery {eight}")], ["doc_id", "text"]
    )
    out = sorted(
        (r["span_start"], r["span_end"]) for r in
        repeated_spans(docs, length=8, min_count=2).collect()
    )
    assert out == [(0, 7), (10, 17)]


def test_repeated_spans_islands_merge_adjacent(spark):
    # two docs sharing a 16-token run: windows tile the run, must merge to one
    # span (pure-alpha tokens — the tokenizer splits alnum mixes like "t0")
    run = ("ape bat cow dog elk fox gnu hen ibex jay kit lark mole newt owl pug")
    docs = spark.createDataFrame([(1, run), (2, run)], ["doc_id", "text"])
    out = repeated_spans(docs, length=8, min_count=2).collect()
    assert {(r["doc_id"], r["span_start"], r["span_end"]) for r in out} == {
        (1, 0, 15),
        (2, 0, 15),
    }


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.co.uk or call 555-123-4567"),
            (2, "server at 192.168.10.1 and 10.0.0.7 ok"),
            (3, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[1]["clean_text"] == "mail me at [EMAIL] or call [PHONE]"
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 0)
    assert out[2]["clean_text"] == "server at [IP] and [IP] ok"
    assert out[2]["n_ips"] == 2
    assert out[3]["clean_text"] == out[3]["clean_text"] == "clean text with no pii at all"


def test_split_assign_deterministic_and_sized(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in split_assign(docs, 0.1).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in
         split_assign(docs.repartition(13), 0.1).collect()}
    assert a == b  # stable under partitioning / re-runs
    n_val = sum(1 for v in a.values() if v[1] == "val")
    assert 120 <= n_val <= 280  # ~10% of 2000, hash-uniform
    assert all(0 <= v[0] < (1 << 32) for v in a.values())


def test_repetition_signals_hand_checked(spark):
    from jassv2_spark.operators.textstats import repetition_signals

    docs = spark.createDataFrame(
        [
            # 4 lines, "same line" repeated twice -> 1 dup of 3 distinct;
            # chars: 3*9+5=32 total, 9 duplicated
            (1, "same line\nsame line\nother\nthird line"),
            # "go go go go": top 2-gram "go go" covers all 4 tokens (8 ch);
            # 3-gram "go go go" occurs twice -> covers all tokens
            (2, "go go go go"),
            # no repetition at all
            (3, "alpha beta gamma delta"),
            # tie between "a b" and "b a" (2 each) -> lexicographically
            # smallest "a b" wins; occurrences at 1,3 cover positions 1-4
            (4, "a b a b c"),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    r1 = out[1]
    assert r1["dup_line_frac"] == pytest.approx(1 / 4)
    # line chars: same(9)+same(9)+other(5)+thirdline(10)=33; dup 9
    assert r1["dup_line_char_frac"] == pytest.approx(9 / 33)
    r2 = out[2]
    assert r2["top2_char_frac"] == 1.0
    assert r2["dup3_char_frac"] == 1.0
    r3 = out[3]
    # top 2-gram ("alpha beta", count 1, lexicographic min) covers 2 of 4
    # tokens: alpha(5)+beta(4)=9 of 19 chars; no duplicated 3-gram
    assert r3["top2_char_frac"] == pytest.approx(9 / 19)
    assert r3["dup3_char_frac"] == 0.0
    r4 = out[4]
    # "a b" at positions 1 and 3 covers tokens 1-4 -> 4 of 5 chars
    assert r4["top2_char_frac"] == pytest.approx(4 / 5)
    r5 = out[5]
    assert (
        r5["dup_line_frac"]
        == r5["dup_line_char_frac"]
        == r5["top2_char_frac"]
        == r5["dup3_char_frac"]
        == 0.0
    )


def test_gopher_quality_hand_checked(spark):
    from jassv2_spark.operators.textstats import gopher_quality

    good = (
        "the quick brown fox jumps over that lazy dog and it all works "
        "with plenty of normal prose to be sure this has enough words "
        "for the gopher minimum bound which is fifty words total here "
        "so keep padding along with more and more ordinary text until "
        "we have crossed the threshold of fifty whitespace words okay"
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            # bullet lines + ellipsis line
            (2, "- item one\n- item two\nplain line...\n"),
            # symbols: 2 '#' + 1 '...' over 5 words ('...' is a word too)
            (3, "num #1 and #2 ..."),
            (4, "1 22 333 4444"),  # no alpha words, no stopwords
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] >= 50 and r1["keep_gopher"]
    assert r1["frac_alpha_words"] == 1.0
    assert r1["n_stop_hits"] >= 2
    r2 = out[2]
    assert r2["frac_lines_bullet"] == pytest.approx(2 / 3)
    assert r2["frac_lines_ellipsis"] == pytest.approx(1 / 3)
    assert r2["frac_lines_end_punct"] == pytest.approx(1 / 3)  # '...' ends in '.'
    assert not r2["keep_gopher"]
    r3 = out[3]
    assert r3["symbol_word_ratio"] == pytest.approx(3 / 5)
    r4 = out[4]
    assert r4["frac_alpha_words"] == 0.0
    assert r4["n_stop_hits"] == 0
    assert not r4["keep_gopher"]


def test_dup_rate_over_time_hand_checked(spark):
    import datetime

    from jassv2_spark.operators.dedup import dup_rate_over_time

    base = datetime.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        ["doc_id", "text"],
    )
    # buckets of 60s: docs 1,2 in bucket 0; 3,4 in bucket 1; 5 in bucket 2
    ts = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=s))
         for i, s in [(1, 0), (2, 30), (3, 60), (4, 90), (5, 120)]],
        ["doc_id", "ts"],
    )
    got = {r["bucket"]: r for r in dup_rate_over_time(
        docs, ts, bucket_s=60).collect()}
    assert (got[0]["n_docs"], got[0]["n_dups"]) == (2, 0)
    assert (got[1]["n_docs"], got[1]["n_dups"]) == (2, 2)  # both re-crawls
    assert got[1]["dup_ppm"] == 1_000_000
    assert (got[2]["n_docs"], got[2]["n_dups"]) == (1, 0)


def test_dup_within_bucket_keeps_first_by_id(spark):
    import datetime

    from jassv2_spark.operators.dedup import dup_rate_over_time

    base = datetime.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [(7, "same"), (8, "same")], ["doc_id", "text"]
    )
    ts = spark.createDataFrame(
        [(7, base), (8, base)], ["doc_id", "ts"]
    )
    (r,) = dup_rate_over_time(docs, ts, bucket_s=60).collect()
    # same bucket: the lower doc_id is the original, the other a dup
    assert (r["n_docs"], r["n_dups"], r["dup_ppm"]) == (2, 1, 500_000)


def test_stopword_candidates_threshold_and_order(spark):
    from jassv2_spark.operators.textstats import stopword_candidates

    stats = spark.createDataFrame(
        [("the", 90), ("of", 50), ("and", 50), ("rare", 10)],
        ["term", "df"],
    )
    got = stopword_candidates(stats, n_docs=100, min_df_ppm=200_000).collect()
    rows = [(r["rank"], r["term"], r["df_ppm"]) for r in sorted(
        got, key=lambda r: r["rank"])]
    # rare (10% of docs) is below the 20% bar; df ties break term ASC
    assert rows == [(1, "the", 900_000), (2, "and", 500_000), (3, "of", 500_000)]


def test_sliding_counts_covering_windows(spark):
    """Sliding rollup: each event lands in exactly window/slide windows,
    epoch-aligned, and counts are per overlapping window."""
    from datetime import datetime

    from jassv2_spark.operators.events import sliding_counts

    ev = spark.createDataFrame(
        [
            (datetime(2024, 1, 1, 10, 7), "click", 1, 1.25),
            (datetime(2024, 1, 1, 10, 20), "click", 2, 0.5),
            (datetime(2024, 1, 1, 12, 0), "view", 1, 2.0),
        ],
        ["ts", "event_type", "user_id", "value"],
    )
    rows = sliding_counts(ev, window_size="1 hour", slide="15 minutes").collect()
    # every event covered by exactly 4 windows
    assert sum(r["n_events"] for r in rows) == 3 * 4
    # the 10:00-11:00 window (start 10:00) holds both clicks
    both = [r for r in rows
            if r["event_type"] == "click" and r["window_start"].minute == 0
            and r["window_start"].hour == 10]
    assert len(both) == 1 and both[0]["n_events"] == 2 and both[0]["n_users"] == 2
    assert both[0]["sum_value_milli"] == 1250 + 500
    # 10:15 window start excludes the 10:07 click, keeps the 10:20 one
    later = [r for r in rows
             if r["event_type"] == "click" and r["window_start"].hour == 10
             and r["window_start"].minute == 15]
    assert len(later) == 1 and later[0]["n_events"] == 1
    assert later[0]["sum_value_milli"] == 500
    # a 12:00 event's earliest covering window starts 11:15
    view_starts = sorted(r["window_start"] for r in rows if r["event_type"] == "view")
    assert view_starts[0].hour == 11 and view_starts[0].minute == 15
