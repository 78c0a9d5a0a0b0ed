"""BM25F semantics (operators/bm25f.py): simple-BM25F weighted tf/length
(Robertson et al. CIKM'04), integer weights, any-field df, fixed-point rsv.
"""

import math

import pytest

from jassv2_spark.operators.bm25f import MICRO, bm25f_topk, bm25f_weighted_counts


@pytest.fixture()
def fields(spark):
    return spark.createDataFrame(
        [
            (1, "title", "apple pie"),
            (1, "body", "apple apple banana"),
            (2, "title", "banana"),
            (2, "body", "apple cherry cherry"),
            (3, "body", "cherry pie pie"),
        ],
        ["doc_id", "field", "text"],
    )


def test_weighted_counts(spark, fields):
    out = {
        (r["doc_id"], r["term"]): r["wtf"]
        for r in bm25f_weighted_counts(fields, {"title": 3, "body": 1}).collect()
    }
    assert out[(1, "apple")] == 3 * 1 + 1 * 2   # title once, body twice
    assert out[(1, "pie")] == 3                 # title only
    assert out[(2, "banana")] == 3
    assert out[(3, "pie")] == 2                 # body only, weight 1
    # a field missing from the weight map contributes nothing
    only_title = {
        (r["doc_id"], r["term"]): r["wtf"]
        for r in bm25f_weighted_counts(fields, {"title": 2}).collect()
    }
    assert (3, "pie") not in only_title and only_title[(1, "apple")] == 2


def test_non_integer_weight_rejected(spark, fields):
    with pytest.raises(ValueError, match="integer"):
        bm25f_weighted_counts(fields, {"title": 1.5})


def test_topk_matches_hand_computation(spark, fields):
    q = spark.createDataFrame([("q", "apple")], ["query_id", "query"])
    out = {r["doc_id"]: r for r in
           bm25f_topk(fields, q, {"title": 3, "body": 1}, k=10, k1=0.9, b=0.4).collect()}
    # wtf: d1=5, d2=1; wdl: d1 = 3*2+1*3 = 9, d2 = 3*1+1*3 = 6, d3 = 3
    # N=3 docs with weighted content, total wdl=18, mean=6; df(apple)=2
    idf = math.log(3 / 2)

    def score(wtf, wdl):
        return idf * ((wtf * 1.9) / (wtf + 0.9 * (0.6 + 0.4 * wdl / 6.0)))

    assert out[1]["rsv_micro"] == math.floor(MICRO * score(5.0, 9.0))
    assert out[2]["rsv_micro"] == math.floor(MICRO * score(1.0, 6.0))
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2 and 3 not in out


def test_title_weight_changes_ranking(spark):
    # same unweighted content; doc 20 carries the term in its TITLE
    fields = spark.createDataFrame(
        [
            (10, "title", "filler words"), (10, "body", "target plus padding"),
            (20, "title", "target words"), (20, "body", "filler plus padding"),
            (30, "title", "unrelated"), (30, "body", "nothing here"),  # df < N
        ],
        ["doc_id", "field", "text"],
    )
    q = spark.createDataFrame([("q", "target")], ["query_id", "query"])
    flat = {r["doc_id"]: r["rank"]
            for r in bm25f_topk(fields, q, {"title": 1, "body": 1}).collect()}
    boosted = {r["doc_id"]: r["rank"]
               for r in bm25f_topk(fields, q, {"title": 3, "body": 1}).collect()}
    assert flat[20] == 1 and flat[10] == 2  # equal evidence: higher id first
    assert boosted[20] == 1                  # title hit dominates
    b20 = {r["doc_id"]: r["rsv_micro"]
           for r in bm25f_topk(fields, q, {"title": 3, "body": 1}).collect()}
    assert b20[20] > b20[10]
