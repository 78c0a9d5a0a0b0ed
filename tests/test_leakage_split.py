"""Leakage-safe split: near-dup clusters never straddle train/val."""

import hashlib

import pytest

from jassv2_spark.operators.textstats import leakage_safe_split, split_assign

# docs 1/2/3 near-identical (one token differs), 4/5 identical pair,
# 6..9 singletons
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and once"),
    (3, "the quick brown fox jumps over the lazy dog again and twice"),
    (4, "completely different text about spark joins and hash tables"),
    (5, "completely different text about spark joins and hash tables"),
    (6, "orthogonal content one with unique words alpha beta gamma"),
    (7, "another standalone document mentioning merge sort algorithms"),
    (8, "windows aggregate value data columns rows lines vectors keys"),
    (9, "streaming batches slow fast big small ordered grouped parts"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_clusters_never_straddle_splits(spark, docs):
    rows = leakage_safe_split(docs, val_frac=0.5).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # the identical pair 4/5 shares one cluster
    cid = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert cid[4] == cid[5]


def test_singletons_match_plain_split(spark, docs):
    leak = {r["doc_id"]: (r["split"], r["cluster_size"])
            for r in leakage_safe_split(docs, val_frac=0.3).collect()}
    plain = {r["doc_id"]: r["split"]
             for r in split_assign(docs, val_frac=0.3).collect()}
    for d, (s, size) in leak.items():
        if size == 1:
            assert s == plain[d]  # singleton: identical rule on own id


def test_bucket_is_md5_prefix_of_cluster_id(spark, docs):
    rows = leakage_safe_split(docs, val_frac=0.1).collect()
    for r in rows:
        want = int(hashlib.md5(str(r["cluster_id"]).encode()).hexdigest()[:8], 16)
        assert r["bucket"] == want
