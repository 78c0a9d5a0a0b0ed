"""LM Dirichlet query likelihood vs a pure-Python fixed-point oracle:
exact integer rsv_micro equality, OOV handling, μ sensitivity,
parallelism invariance."""

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.lmdir import MICRO, lm_dirichlet_topk

TOK = re.compile(r"[a-z0-9]+")


def _py_lmdir(docs, queries, k=10, mu=2500.0):
    cnt = {d: Counter(TOK.findall(t.lower())) for d, t in docs}
    dl = {d: sum(c.values()) for d, c in cnt.items()}
    clen = sum(dl.values())
    ctf = Counter()
    for c in cnt.values():
        ctf.update(c)
    out = {}
    for qid, qtext in queries:
        q = Counter(TOK.findall(qtext.lower()))
        qv = {t: n for t, n in q.items() if ctf[t] > 0}
        if not qv:
            continue
        qlen = sum(qv.values())
        scores = defaultdict(int)
        for d, c in cnt.items():
            hit = False
            s = 0
            for t, qtf in qv.items():
                if c[t]:
                    hit = True
                    s += qtf * math.floor(
                        MICRO * math.log(1.0 + (float(c[t]) * float(clen)) / (mu * float(ctf[t])))
                    )
            if hit:
                s += qlen * math.floor(MICRO * math.log(mu / (float(dl[d]) + mu)))
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], -kv[0]))[:k]
        out[qid] = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    # pure-alpha vocabulary: the parity tokenizer splits mixed alnum runs
    # ("alpha3" → "alpha","3"), which the test's simple regex oracle does
    # not model — irrelevant to what THIS test pins (the scoring math).
    rows = [
        (i, f"alpha{'abcdefg'[i % 7]} beta{'abcde'[i % 5]} gamma{'abc'[i % 3]} "
            "shared words everywhere "
            + ("rare unicorn " if i == 17 else "")
            + "tail " * (i % 11))
        for i in range(60)
    ]
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


QUERIES = [
    ("l1", "shared alphab"),
    ("l2", "rare unicorn"),
    ("l3", "tail tail betac"),   # duplicate term → q_tf = 2
    ("l4", "zzz notaword"),      # all OOV → no results
    ("l5", "shared zzz"),        # mixed: OOV dropped from |q|
]


def _canon(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["rsv_micro"]))
    return {q: sorted(v) for q, v in out.items()}


def test_matches_python_oracle(spark, corpus):
    rows, docs = corpus
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query"])
    got = _canon(lm_dirichlet_topk(docs, qdf, k=10))
    want = _py_lmdir(rows, QUERIES, k=10)
    assert got == want
    assert "l4" not in got          # fully-OOV query vanishes
    assert "l5" in got              # OOV term silently dropped


def test_mu_changes_ranking_weights(spark, corpus):
    rows, docs = corpus
    qdf = spark.createDataFrame([("q", "shared tail")], ["query_id", "query"])
    a = _canon(lm_dirichlet_topk(docs, qdf, k=5, mu=500.0))
    b = _canon(lm_dirichlet_topk(docs, qdf, k=5, mu=8000.0))
    want_a = _py_lmdir(rows, [("q", "shared tail")], k=5, mu=500.0)
    want_b = _py_lmdir(rows, [("q", "shared tail")], k=5, mu=8000.0)
    assert a == want_a and b == want_b
    assert a != b  # smoothing strength is observable


def test_parallelism_invariant(spark, corpus):
    rows, docs = corpus
    qdf = spark.createDataFrame(QUERIES, ["query_id", "query"])
    r1 = _canon(lm_dirichlet_topk(docs.repartition(1), qdf, k=10))
    r8 = _canon(lm_dirichlet_topk(docs.repartition(8), qdf, k=10))
    assert r1 == r8
