"""Phrase search semantics: adjacency, overlap counting, scoring, top-k.

The reference is bag-of-words (parser.cpp drops positions), so these
semantics are pinned here, not against a reference golden: ptf counts ALL
start positions of the exact adjacent token run (overlaps included), and
the ranking is ATIRE BM25 with the phrase as a pseudo-term, ties to the
higher doc_id (operators/phrase.py).
"""

import math

import pytest

from jassv2_spark.operators.phrase import (
    phrase_match_counts,
    phrase_topk,
    proximity_match_counts,
    proximity_topk,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "in new york city new york is big"),
            (2, "new in york but never adjacent"),
            (3, "aa aa aa aa"),
            (4, "plain filler text here"),
            (5, "New York!"),
        ],
        ["doc_id", "text"],
    )


def _q(spark, *pairs):
    return spark.createDataFrame(list(pairs), ["query_id", "phrase"])


def test_adjacency_required_and_overlap_counted(spark, docs):
    out = phrase_match_counts(docs, _q(spark, ("p1", "new york"), ("p2", "aa aa"))).collect()
    by = {(r["query_id"], r["doc_id"]): r for r in out}
    assert by[("p1", 1)]["ptf"] == 2          # two occurrences
    assert ("p1", 2) not in by                # terms present, never adjacent
    assert by[("p1", 5)]["ptf"] == 1          # casefold + punctuation strip
    assert by[("p2", 3)]["ptf"] == 3          # overlapping runs all counted
    assert by[("p1", 1)]["dl"] == 8


def test_single_term_oov_and_empty_phrase(spark, docs):
    out = phrase_match_counts(
        docs, _q(spark, ("s", "filler"), ("o", "zzz qqq"), ("e", "!!!"))
    ).collect()
    got = {(r["query_id"], r["doc_id"]) for r in out}
    assert got == {("s", 4)}  # OOV and zero-term phrases match nothing


def test_phrase_topk_scores_and_ranks(spark, docs):
    out = phrase_topk(docs, _q(spark, ("p1", "new york")), k=10, k1=0.9, b=0.4).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 5]
    by = {r["doc_id"]: r for r in out}
    # hand-computed ATIRE BM25: N=5, clen=8+6+4+4+2=24, mean=24/5, df=2
    mean = 24.0 / 5.0
    idf = math.log(5 / 2)

    def bm25(tf, dl):
        return idf * ((tf * 1.9) / (tf + 0.9 * (0.6 + 0.4 * dl / mean)))

    assert by[1]["score"] == bm25(2.0, 8.0)
    assert by[5]["score"] == bm25(1.0, 2.0)
    assert by[1]["rank"] == 1  # higher score wins


def test_proximity_window_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha x x beta rest here"),     # within window 4
            (2, "alpha x x x x x x beta"),       # gap 7: outside window 4
            (3, "beta alpha together"),          # order-free
            (4, "alpha only no second term"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([("p", "alpha beta")], ["query_id", "query"])
    out4 = proximity_match_counts(docs, q, window=4).collect()
    assert {r["doc_id"] for r in out4} == {1, 3}
    out8 = proximity_match_counts(docs, q, window=8).collect()
    assert {r["doc_id"] for r in out8} == {1, 2, 3}
    # ptf counts window START positions covering all terms: doc 1 windows
    # starting at tokens 1..1 (alpha..beta spans 4) -> exactly 1 for w=4
    assert {r["doc_id"]: r["ptf"] for r in out4}[1] == 1


def test_proximity_topk_scores_like_phrase_scorer(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta x"), (2, "alpha y beta"), (3, "nothing here at all")],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([("p", "alpha beta")], ["query_id", "query"])
    out = proximity_topk(docs, q, window=3, k=10).collect()
    assert len(out) == 2
    by = {r["doc_id"]: r for r in out}
    # doc 1: starts 1 ("alpha beta x") -> both in window; doc 2: start 1
    assert by[1]["ptf"] == 1 and by[2]["ptf"] == 1
    # equal tf and dl -> equal score -> higher doc_id ranks first
    assert by[2]["rank"] == 1 and by[1]["rank"] == 2


def test_bigram_index_counts_equal_scan_ptf(spark, docs):
    from jassv2_spark.operators.phrase import build_bigram_index, phrase_topk_bigram

    bidx = build_bigram_index(docs, text_col="text", key_col="doc_id",
                              doc_id_col="doc_id")
    # postings tf over the bigram vocabulary == the scan path's ptf for
    # every 2-token phrase (same overlap-counting semantics)
    scan = phrase_match_counts(
        docs, spark.createDataFrame([("p1", "new york"), ("p2", "aa aa")],
                                    ["query_id", "phrase"])
    ).collect()
    post = {(r["term"], r["doc_id"]): r["tf"] for r in bidx.postings.collect()}
    for r in scan:
        ph = {"p1": "new york", "p2": "aa aa"}[r["query_id"]]
        assert post[(ph, r["doc_id"])] == r["ptf"], (ph, r["doc_id"])
    # dl = token count - 1 per doc with >= 2 tokens
    dl = {r["doc_id"]: r["dl"] for r in bidx.doc_lengths.collect()}
    assert dl[1] == 7 and dl[5] == 1
    # serving: a 2-token phrase hits exactly the scan path's doc set
    out = phrase_topk_bigram(
        bidx, spark.createDataFrame([("p1", "new york")], ["query_id", "phrase"]),
        k=10,
    ).collect()
    assert {r["doc_id"] for r in out} == {1, 5}
    assert sorted(r["rank"] for r in out) == [1, 2]
    # one-token phrase: no bigrams -> no results (route to ordinary index)
    empty = phrase_topk_bigram(
        bidx, spark.createDataFrame([("s", "filler")], ["query_id", "phrase"]), k=10
    ).collect()
    assert empty == []


def test_phrase_topk_tie_breaks_to_higher_docid_and_k_cuts(spark):
    docs = spark.createDataFrame(
        [(i, "x y filler") for i in range(1, 6)], ["doc_id", "text"]
    )
    out = phrase_topk(docs, _q(spark, ("t", "x y")), k=3).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [5, 4, 3]  # identical scores -> higher doc_id first, k=3


def test_sdm_blend_hand_checked(spark):
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.phrase import sdm_topk
    from jassv2_spark.operators.search import search

    docs = spark.createDataFrame(
        [
            (1, "new york city guide"),          # adjacent bigram
            (2, "york is new to the new area"),  # both terms, never adjacent
            (3, "new things"),                   # one term only
        ],
        ["doc_id", "text"],
    )
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    q = spark.createDataFrame([("q1", "new york")], ["query_id", "query"])
    rsv = {r["doc_id"]: r["rsv"]
           for r in search(idx, q, k=5, with_keys=False).collect()}
    got = {r["doc_id"]: r for r in sdm_topk(
        idx, docs, q, k=5, with_keys=False).collect()}
    # doc 1: "new york" adjacent once -> otf 1; window-8 co-occurrence:
    # starts 1..4, windows containing both = start 1 only -> utf 1
    assert (got[1]["otf"], got[1]["utf"]) == (1, 1)
    # doc 2: both terms, never adjacent; tokens: york is new to the new
    # area — 'york' sits at position 1, so only the start-1 window holds
    # both -> otf 0, utf 1
    assert (got[2]["otf"], got[2]["utf"]) == (0, 1)
    assert (got[3]["otf"], got[3]["utf"]) == (0, 0)
    for d in (1, 2, 3):
        assert got[d]["blend"] == 85 * rsv[d] + 10 * got[d]["otf"] + 5 * got[d]["utf"]


def test_sdm_single_term_matches_search_ranks(spark):
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.phrase import sdm_topk
    from jassv2_spark.operators.search import search

    docs = spark.createDataFrame(
        [(1, "apple apple"), (2, "apple pie"), (3, "pear")],
        ["doc_id", "text"],
    )
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    want = [(r["doc_id"], r["rank"])
            for r in search(idx, q, k=5, with_keys=False).collect()]
    got = [(r["doc_id"], r["rank"])
           for r in sdm_topk(idx, docs, q, k=5, with_keys=False).collect()]
    assert sorted(got) == sorted(want)  # no bigrams: pure w_T scaling
