"""Heaps profile: prefix vocab growth, token counts, decile cuts."""

import pytest

from jassv2_spark.operators.textstats import heaps_profile

DOCS = [
    (10, "a b c"),        # pos 1
    (11, "a b"),          # pos 2
    (12, "d"),            # pos 3
    (13, "a d e f"),      # pos 4
    (14, "g"),            # pos 5
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_heaps_hand_checked(spark, docs):
    rows = {r["decile"]: r for r in heaps_profile(docs, buckets=5).collect()}
    assert len(rows) == 5
    # prefix 1: doc 10 → vocab {a,b,c}, 3 tokens
    assert (rows[1]["n_docs"], rows[1]["n_tokens"], rows[1]["vocab_size"]) == (1, 3, 3)
    # prefix 3: +doc 11 (no new), +doc 12 (d) → vocab 4, tokens 6
    assert (rows[3]["n_docs"], rows[3]["n_tokens"], rows[3]["vocab_size"]) == (3, 6, 4)
    # full corpus: vocab {a..g}=7, tokens 11
    assert (rows[5]["n_docs"], rows[5]["n_tokens"], rows[5]["vocab_size"]) == (5, 11, 7)


def test_heaps_monotone(spark, docs):
    rows = sorted(heaps_profile(docs, buckets=10).collect(), key=lambda r: r["decile"])
    for a, b in zip(rows, rows[1:]):
        assert b["n_tokens"] >= a["n_tokens"] and b["vocab_size"] >= a["vocab_size"]


def test_dl_histogram_buckets(spark):
    from jassv2_spark.operators.textstats import dl_histogram

    dls = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 8), (5, 0)], ["doc_id", "dl"]
    )
    got = {r["bucket"]: (r["n_docs"], r["total_tokens"])
           for r in dl_histogram(dls).collect()}
    # 1 -> bucket 0; 2,3 -> bucket 1; 8 -> bucket 3; 0 -> bucket -1
    assert got == {0: (1, 1), 1: (2, 5), 3: (1, 8), -1: (1, 0)}


def test_exact_percentiles_nearest_rank(spark):
    from jassv2_spark.operators.textstats import exact_percentiles

    vals = [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]  # 1..10
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {r["p"]: (r["value"], r["n_rows"])
           for r in exact_percentiles(df, "x", [10, 50, 90, 100]).collect()}
    # nearest-rank: ceil(p/100 * 10)-th smallest
    assert got == {10: (1, 10), 50: (5, 10), 90: (9, 10), 100: (10, 10)}


def test_exact_percentiles_grouped(spark):
    from jassv2_spark.operators.textstats import exact_percentiles

    rows = [("a", v) for v in range(1, 5)] + [("b", v) for v in (10, 20)]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {(r["g"], r["p"]): r["value"]
           for r in exact_percentiles(df, "x", [50, 100], ["g"]).collect()}
    assert got == {("a", 50): 2, ("a", 100): 4, ("b", 50): 10, ("b", 100): 20}
