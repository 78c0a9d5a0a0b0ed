"""QtfDf posting-list cache admission (operators/caching.py)."""

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.caching import cache_admission, cache_hit_rate

DOCS = [
    (0, "pear plum"),
    (1, "apple pie"),
    (2, "pear pear pear jam"),
    (3, "plum jam"),
    (4, "apple apple tart"),
    (5, "pear pear cider"),
    (6, "plum tart"),
    (7, "apple cake"),
    (8, "pear pear pear pear"),
]

# df: pear 4, plum 3, apple 3, jam 2, tart 2, pie 1, cider 1, cake 1

QUERIES = [
    ("q1", "pear pear apple"),   # qtf pear 2, apple 1
    ("q2", "pear jam"),
    ("q3", "apple"),
    ("q4", "cider zzzoov"),      # zzzoov is OOV — must not appear
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def _py_admission(budget):
    """Independent replay: qtf over the log, df over DOCS, QtfDf greedy."""
    from collections import Counter

    df = Counter()
    for _, text in DOCS:
        for t in set(text.split()):
            df[t] += 1
    qtf = Counter()
    for _, q in QUERIES:
        for t in q.split():
            if t in df:
                qtf[t] += 1
    rows = []
    for t, n in qtf.items():
        rows.append((t, n, df[t], (1_000_000 * n) // df[t]))
    rows.sort(key=lambda r: (-r[3], r[0]))
    out, cum = {}, 0
    for t, n, d, s in rows:
        cum += d
        out[t] = (n, d, s, cum, 1 if cum <= budget else 0)
    return out


@pytest.mark.parametrize("budget", [0, 3, 7, 100])
def test_matches_python_reference(spark, idx, budget):
    q = spark.createDataFrame(QUERIES, ["query_id", "query"])
    got = {r["term"]: (r["qtf"], r["df"], r["score_micros"],
                       r["cum_postings"], r["admitted"])
           for r in cache_admission(idx, q, budget_postings=budget).collect()}
    assert got == _py_admission(budget)
    assert "zzzoov" not in got  # OOV dropped


def test_density_order_and_greedy_prefix(spark, idx):
    q = spark.createDataFrame(QUERIES, ["query_id", "query"])
    rows = sorted(
        cache_admission(idx, q, budget_postings=7).collect(),
        key=lambda r: r["cum_postings"],
    )
    # densities are non-increasing along the admission order
    scores = [r["score_micros"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # admitted is a prefix of the order
    flags = [r["admitted"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    # cider (qtf 1, df 1) is densest; pear (qtf 4... ) next — check head
    assert rows[0]["term"] == "cider" and rows[0]["admitted"] == 1


def test_hit_rate_summary(spark, idx):
    q = spark.createDataFrame(QUERIES, ["query_id", "query"])
    adm = cache_admission(idx, q, budget_postings=7)
    s = cache_hit_rate(adm).collect()[0]
    want = _py_admission(7)
    tot = sum(v[0] for v in want.values())
    hit = sum(v[0] for v in want.values() if v[4])
    assert s["n_terms"] == len(want)
    assert s["n_admitted"] == sum(v[4] for v in want.values())
    assert s["cached_postings"] == sum(v[1] for v in want.values() if v[4])
    assert s["hit_rate_micros"] == (1_000_000 * hit) // tot

    # budget 0 admits nothing; huge budget admits everything
    z = cache_hit_rate(cache_admission(idx, q, budget_postings=0)).collect()[0]
    assert z["n_admitted"] == 0 and z["hit_rate_micros"] == 0
    a = cache_hit_rate(cache_admission(idx, q, budget_postings=10**9)).collect()[0]
    assert a["n_admitted"] == a["n_terms"] and a["hit_rate_micros"] == 1_000_000
