"""MMR diversification: greedy semantics, twin demotion, quantized-cosine
exactness vs a brute-force Python reference."""

import math

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.mmr import mmr_rerank
from jassv2_spark.operators.search import search

# docs 1 and 2: same text AND same embedding (perfect redundancy);
# doc 4 matches weakly but is maximally different in embedding space.
DOCS = [
    (1, "spark join table"),
    (2, "spark join table"),
    (3, "spark join window window window"),  # longer doc → lower BM25 than the twins
    (4, "spark scan"),
]
EMB = {
    1: [1.0, 0.0, 0.0, 0.0],
    2: [1.0, 0.0, 0.0, 0.0],
    3: [0.9, 0.1, 0.0, 0.0],
    4: [0.0, 0.0, 1.0, 0.0],
}


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(d, v) for d, v in EMB.items()], ["vec_id", "embedding"]
    )


def _brute_mmr(cand, sims, k, lam=0.7):
    """cand: {doc: rsv}; sims: {(a,b): cos}. Greedy reference."""
    oml = 1.0 - lam
    rel = {d: r / 255.0 for d, r in cand.items()}
    picked = [max(rel, key=lambda d: (rel[d], d))]
    while len(picked) < k and len(picked) < len(cand):
        free = [d for d in cand if d not in picked]
        nxt = max(
            free,
            key=lambda d: (lam * rel[d] - oml * max(sims[(d, p)] for p in picked), d),
        )
        picked.append(nxt)
    return picked


def test_mmr_demotes_redundant_twin(spark, idx, emb):
    q = spark.createDataFrame([("q1", "spark join")], ["query_id", "query"])
    got = sorted(
        mmr_rerank(idx, q, emb, k=4, pool=10, lam=0.5).collect(),
        key=lambda r: r["step"],
    )
    order = [r["doc_id"] for r in got]
    # plain relevance order: twins 1,2 adjacent at the top
    plain = [r["doc_id"] for r in sorted(
        search(idx, q, k=4, with_keys=False).collect(), key=lambda r: r["rank"])]
    assert plain[0] in (1, 2) and plain[1] in (1, 2)
    # MMR: after picking one twin, the identical twin (cos=1) must NOT be
    # second — doc 4 (orthogonal embedding) or 3 jumps ahead of it
    assert order[0] == plain[0]
    assert order[1] != plain[1]
    assert set(order) == {1, 2, 3, 4}


def test_mmr_matches_brute_force_reference(spark, idx, emb):
    q = spark.createDataFrame([("q1", "spark join table")], ["query_id", "query"])
    cand = {r["doc_id"]: r["rsv"]
            for r in search(idx, q, k=10, with_keys=False).collect()}

    def qcos(a, b):
        va = [math.floor(x * 1e3 + 0.5) for x in EMB[a]]
        vb = [math.floor(x * 1e3 + 0.5) for x in EMB[b]]
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        return dot / (na * nb)

    sims = {(a, b): qcos(a, b) for a in cand for b in cand if a != b}
    want = _brute_mmr(cand, sims, k=4)
    got = [r["doc_id"] for r in sorted(
        mmr_rerank(idx, q, emb, k=4, pool=10).collect(), key=lambda r: r["step"])]
    assert got == want


def test_mmr_step1_is_relevance_rank1(spark, idx, emb):
    q = spark.createDataFrame(
        [("q1", "spark join"), ("q2", "scan")], ["query_id", "query"]
    )
    top = {r["query_id"]: r["doc_id"]
           for r in search(idx, q, k=1, with_keys=False).collect()}
    got = {r["query_id"]: r["doc_id"]
           for r in mmr_rerank(idx, q, emb, k=3, pool=10).collect()
           if r["step"] == 1}
    assert got == top
