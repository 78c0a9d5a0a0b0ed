"""Hard-negative mining (DPR recipe): exclusion, renumbering, cap, and
the no-positives query keeping its whole top-k."""

import pytest

from jassv2_spark.fixtures import ten_documents
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.ltr import mine_hard_negatives
from jassv2_spark.operators.search import search


@pytest.fixture(scope="module")
def ten_idx(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs = spark.createDataFrame(rows, ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    yield idx
    idx.unpersist()


def test_hard_negatives_exclude_and_renumber(ten_idx, spark):
    q = spark.createDataFrame([("q1", "ten"), ("q2", "zzz")], ["query_id", "query"])
    topk = search(ten_idx, q, k=10, with_keys=False).collect()
    ranked = sorted(
        [(r["rank"], r["doc_id"], r["rsv"]) for r in topk if r["query_id"] == "q1"]
    )
    assert len(ranked) >= 3

    # mark ranks 1 and 3 as positives -> negatives are the others, renumbered
    pos_docs = [ranked[0][1], ranked[2][1]]
    qrels = spark.createDataFrame([("q1", d) for d in pos_docs], ["query_id", "doc_id"])
    neg = mine_hard_negatives(ten_idx, q, qrels, k=10, n_neg=3).collect()
    by_q = {}
    for r in neg:
        by_q.setdefault(r["query_id"], []).append(r)
    n1 = sorted(by_q["q1"], key=lambda r: r["neg_rank"])

    assert all(r["doc_id"] not in pos_docs for r in n1)      # positives excluded
    assert [r["neg_rank"] for r in n1] == list(range(1, len(n1) + 1))
    assert len(n1) <= 3                                       # n_neg cap
    # renumbering preserves original serve order
    assert [r["orig_rank"] for r in n1] == sorted(r["orig_rank"] for r in n1)
    expected_origs = [rk for rk, d, _ in ranked if d not in pos_docs][:3]
    assert [r["orig_rank"] for r in n1] == expected_origs

    # q2 is OOV: no candidates at all -> no negatives (and no crash)
    assert "q2" not in by_q


def test_no_positives_keeps_whole_topk(ten_idx, spark):
    q = spark.createDataFrame([("q1", "ten nine")], ["query_id", "query"])
    qrels = spark.createDataFrame([("q9", 999)], ["query_id", "doc_id"])  # other query
    neg = mine_hard_negatives(ten_idx, q, qrels, k=5, n_neg=10).collect()
    topk = search(ten_idx, q, k=5, with_keys=False).collect()
    assert len(neg) == len(topk)  # everything is a negative


def test_related_doc_pairs_caps_and_ranks(ten_idx, spark):
    """related_doc_pairs: symmetric neighbours, rank by cosine then id,
    df cap drops ubiquitous terms from the vector space."""
    import math

    from jassv2_spark.operators.mlt import related_doc_pairs

    out = related_doc_pairs(ten_idx, max_df=None, top_m=2).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["doc_a"], []).append(r)
    # every doc with >= 1 shared term got neighbours, ranked 1..m
    for a, rows in by_a.items():
        rows.sort(key=lambda r: r["pair_rank"])
        assert [r["pair_rank"] for r in rows] == list(range(1, len(rows) + 1))
        cos = [r["cos_micros"] for r in rows]
        assert cos == sorted(cos, reverse=True)
        assert all(0 <= c <= 1000000 for c in cos)
        assert all(r["doc_b"] != a for r in rows)

    # a term present in EVERY doc contributes idf floor(100*ln(1)) = 0,
    # so max_df cap vs idf-zero must agree: cap at df<10 drops nothing
    # that mattered (10-doc corpus, ubiquitous term weight already 0)
    capped = related_doc_pairs(ten_idx, max_df=9, top_m=2).collect()
    full = {(r["doc_a"], r["doc_b"]): r["cos_micros"] for r in out}
    for r in capped:
        key = (r["doc_a"], r["doc_b"])
        if key in full:
            # cosine may shift (norms lose a zero-weight dim is a no-op;
            # df<=9 also drops df=10 terms whose weight was 0) -> equal
            assert abs(full[key] - r["cos_micros"]) <= 1
