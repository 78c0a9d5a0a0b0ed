"""Two-tier serving: escalation rule semantics, degenerate taus, OOV."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.fixtures import synthetic_corpus, synthetic_queries
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.prune import prune_index
from jassv2_spark.operators.search import search
from jassv2_spark.operators.tiered import search_tiered


@pytest.fixture(scope="module")
def setup(spark):
    rows = synthetic_corpus(250)
    docs = spark.createDataFrame(
        [(r["url"], r["html"].decode()) for r in rows], ["url", "html"]
    )
    idx = build_index(docs, text_col="html", key_col="url")
    champ = prune_index(idx, 8)
    qs = synthetic_queries(10) + [("qoov", "zzz notaword")]
    qdf = spark.createDataFrame(qs, ["query_id", "query"])
    yield idx, champ, qdf
    idx.unpersist()


def _by_query(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["rsv"], r.asDict().get("tier"))
        )
    return {q: sorted(v) for q, v in out.items()}


def test_escalation_rule_definition(spark, setup):
    idx, champ, qdf = setup
    k, tau = 5, 60
    got = _by_query(search_tiered(idx, champ, qdf, k=k, min_kth_rsv=tau))
    pruned = _by_query(search(champ, qdf, k=k, with_keys=False))
    full = _by_query(search(idx, qdf, k=k, with_keys=False))
    seen_champion = seen_full = False
    for q in set(pruned) | set(full):
        p = pruned.get(q, [])
        qualifies = len(p) == k and p[k - 1][2] >= tau
        if qualifies:
            seen_champion = True
            assert got.get(q) == [(r, d, v, "champion") for r, d, v, _ in p], q
        else:
            seen_full = True
            assert got.get(q, []) == [(r, d, v, "full") for r, d, v, _ in full.get(q, [])], q
    assert seen_champion and seen_full, "tau must split the batch for this test"
    assert "qoov" not in got  # OOV falls back and still yields nothing


def test_tau_extremes(spark, setup):
    idx, champ, qdf = setup
    strip = lambda by_q: {q: [(r, d, v) for r, d, v, _ in rows] for q, rows in by_q.items()}
    full = strip(_by_query(search(idx, qdf, k=5, with_keys=False)))
    # impossible tau → everything escalates → equals the full search
    all_full = _by_query(search_tiered(idx, champ, qdf, k=5, min_kth_rsv=10**9))
    assert strip(all_full) == full
    assert all(t == "full" for rows in all_full.values() for *_, t in rows)
    # champion == full index and tau=0 → nothing escalates, same results
    same = _by_query(search_tiered(idx, idx, qdf, k=5, min_kth_rsv=0))
    filled = {q for q, rows in full.items() if len(rows) == 5}
    for q in filled:
        assert strip({q: same[q]})[q] == full[q]
        assert all(t == "champion" for *_, t in same[q])
