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
