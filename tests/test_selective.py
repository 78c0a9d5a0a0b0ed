"""Selective search (ReDDE resource selection) semantics."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.search import search
from jassv2_spark.operators.selective import search_selective, shard_scores


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


DOCS = [
    # shard = doc_id % 3
    (0, "pear plum"),            # shard 0: one weak pear doc
    (1, "apple pie"),            # shard 1
    (2, "pear pear pear jam"),   # shard 2
    (3, "plum jam"),             # shard 0
    (4, "apple apple tart"),     # shard 1
    (5, "pear pear cider"),      # shard 2
    (6, "plum tart"),            # shard 0
    (7, "apple cake"),           # shard 1
    (8, "pear pear pear pear"),  # shard 2
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def test_full_sample_full_select_equals_search(spark, idx):
    q = spark.createDataFrame([("q1", "apple"), ("q2", "pear jam")],
                              ["query_id", "query"])
    want = {(r["query_id"], r["doc_id"], r["rsv"], r["rank"])
            for r in search(idx, q, k=5, with_keys=False).collect()}
    got = {(r["query_id"], r["doc_id"], r["rsv"], r["rank"])
           for r in search_selective(
               idx, q, k=5, n_shards=3, n_select=3, sample_frac=1.0,
               n_csi=20, with_keys=False).collect()}
    assert got == want  # all shards selected => identical to exhaustive


def test_votes_and_redde_weighting(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    rows = shard_scores(idx, q, n_shards=3, sample_frac=1.0, n_csi=20).collect()
    by_shard = {r["shard"]: r for r in rows}
    # 'apple' lives only in docs 1,4,7 — all shard 1
    assert set(by_shard) == {1}
    assert by_shard[1]["votes"] == 3
    assert by_shard[1]["score_micros"] == 3_000_000  # sample == shard
    assert by_shard[1]["shard_rank"] == 1


def test_partial_sample_weighting_matches_md5_rule(spark, idx):
    frac = 0.7  # samples docs 4 and 7 (buckets .658, .559) but not 1 (.769)
    thresh = int(frac * (1 << 32))
    sampled = {i for i, _ in DOCS if _bucket(i) < thresh}
    apple_sampled = sampled & {1, 4, 7}
    assert apple_sampled == {4, 7}
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    (r,) = shard_scores(idx, q, n_shards=3, sample_frac=frac, n_csi=20).collect()
    shard_sample = len({i for i in sampled if i % 3 == 1})
    assert r["shard"] == 1 and r["votes"] == len(apple_sampled)
    assert r["score_micros"] == (1_000_000 * r["votes"] * 3) // shard_sample


def test_select_one_shard_drops_other_shards_docs(spark, idx):
    # 'pear' mass: shard 2 (docs 2,5,8) >> shard 0 (doc 0 only)
    q = spark.createDataFrame([("q1", "pear")], ["query_id", "query"])
    got = search_selective(
        idx, q, k=5, n_shards=3, n_select=1, sample_frac=1.0,
        n_csi=20, with_keys=False,
    ).collect()
    ids = {r["doc_id"] for r in got}
    assert ids == {2, 5, 8}  # shard 2 selected; doc 0 (shard 0) not searched
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert ranks[8] == 1  # most pear-heavy doc still wins within the shard


def test_no_match_query_selects_nothing(spark, idx):
    q = spark.createDataFrame([("q1", "zzz")], ["query_id", "query"])
    assert shard_scores(idx, q, n_shards=3).count() == 0
    assert search_selective(idx, q, n_shards=3, with_keys=False).count() == 0


def test_mapside_prune_no_post_explode_filter(spark, idx):
    """The doc filter must run INSIDE the doc_ids arrays (map-side), so the
    executed plan contains the lambda filter and no Filter on exploded
    doc_id rows."""
    q = spark.createDataFrame([("q1", "pear")], ["query_id", "query"])
    df = search_selective(idx, q, k=5, n_shards=3, n_select=1,
                          sample_frac=1.0, with_keys=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "filter(doc_ids" in plan or "filter(lambdafunction" in plan.lower()


def _py_cori(idx, query_terms, n_shards, b_micros=400_000):
    """Independent Python replay of the exact-integer CORI recipe over
    collected index stats."""
    from collections import defaultdict

    from jassv2_spark.operators.selective import cori_i_micros

    post = [(r["term"], r["doc_id"]) for r in idx.postings.collect()]
    dls = {r["doc_id"]: r["dl"] for r in idx.doc_lengths.collect()}
    vocab = {t for t, _ in post}
    dfts = defaultdict(int)
    for t, d in post:
        dfts[(t, d % n_shards)] += 1
    cw = defaultdict(int)
    for d, dl in dls.items():
        cw[d % n_shards] += dl
    total_cw = sum(cw.values())
    cf = defaultdict(int)
    for (t, s) in dfts:
        cf[t] += 1
    imap = cori_i_micros(n_shards)

    terms = [t for t in dict.fromkeys(query_terms) if t in vocab]
    out = {}
    for s in range(n_shards):
        tot = 0
        for t in terms:
            df = dfts.get((t, s), 0)
            if df == 0:
                t_mic = 0
            else:
                t_mic = (1_000_000 * df * total_cw) // (
                    (df + 50) * total_cw + 150 * n_shards * cw[s]
                )
            tot += b_micros + ((1_000_000 - b_micros) * t_mic * imap[cf[t]]) // 10**12
        out[s] = tot // len(terms) if terms else None
    return out


def test_cori_matches_python_reference(spark, idx):
    from jassv2_spark.operators.selective import cori_shard_scores

    q = spark.createDataFrame(
        [("q1", "pear"), ("q2", "apple jam"), ("q3", "pear zzzoov")],
        ["query_id", "query"],
    )
    got = {(r["query_id"], r["shard"]): r["score_micros"]
           for r in cori_shard_scores(idx, q, n_shards=3).collect()}
    for qid, terms in [("q1", ["pear"]), ("q2", ["apple", "jam"]),
                       ("q3", ["pear", "zzzoov"])]:
        want = _py_cori(idx, terms, 3)
        for s in range(3):
            assert got[(qid, s)] == want[s], (qid, s)

    # pear lives overwhelmingly in shard 2 — CORI must rank it first
    ranks = {r["shard"]: r["shard_rank"]
             for r in cori_shard_scores(
                 idx, spark.createDataFrame([("q1", "pear")], ["query_id", "query"]),
                 n_shards=3).collect()}
    assert ranks[2] == 1


def test_search_cori_post_filter_semantics(spark, idx):
    from jassv2_spark.operators.selective import search_cori

    q = spark.createDataFrame([("q1", "pear")], ["query_id", "query"])
    got = search_cori(idx, q, k=5, n_shards=3, n_select=1, with_keys=False).collect()
    assert got, "top CORI shard must produce hits"
    # selection picked shard 2; every hit lives there, rsv is the global score
    want = {r["doc_id"]: r["rsv"]
            for r in search(idx, q, k=9, with_keys=False).collect()}
    for r in got:
        assert r["doc_id"] % 3 == 2
        assert want[r["doc_id"]] == r["rsv"]

    # all shards selected => identical to exhaustive
    all_sel = search_cori(idx, q, k=5, n_shards=3, n_select=3, with_keys=False)
    a = {(r["doc_id"], r["rsv"], r["rank"]) for r in all_sel.collect()}
    b = {(r["doc_id"], r["rsv"], r["rank"])
         for r in search(idx, q, k=5, with_keys=False).collect()}
    assert a == b

    # OOV-only query selects no shards: no rows
    oov = spark.createDataFrame([("q9", "zzzoov")], ["query_id", "query"])
    assert search_cori(idx, oov, k=5, n_shards=3, with_keys=False).count() == 0
