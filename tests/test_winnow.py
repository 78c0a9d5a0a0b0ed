"""Winnowing fingerprints (Schleimer et al. SIGMOD'03) and the
exact-substring candidate-pair stage built on them."""

import hashlib

from jassv2_spark.operators.dedup import substring_dup_pairs, winnow_fingerprints

K, W = 8, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[str]:
    s = text.lower()
    if len(s) < k:
        return set()
    hs = [hashlib.md5(s[i:i + k].encode()).hexdigest() for i in range(len(s) - k + 1)]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


def test_fingerprints_match_reference(spark):
    texts = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "short"),          # < k chars: no fingerprints
        (3, "exactly8!"),      # one k-gram ... a couple of grams, < w of them
        (4, "aaaaaaaaaaaaaaaa"),  # degenerate repeat
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {}
    for r in winnow_fingerprints(docs, k=K, w=W).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    for i, t in texts:
        want = _py_winnow(t)
        assert got.get(i, set()) == want, i


def test_shared_substring_guarantee_and_pairs(spark):
    # shared run of length w + k - 1 = 11 chars embedded in different docs
    shared = "qwertyuiopz"
    assert len(shared) == W + K - 1
    docs = spark.createDataFrame(
        [
            (1, f"left padding {shared} and unrelated tail alpha"),
            (2, f"totally different head {shared} beta gamma ending"),
            (3, "no overlap with anything else at all here xyzzy"),
        ],
        ["doc_id", "text"],
    )
    # guarantee: 1 and 2 share >= 1 fingerprint
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in substring_dup_pairs(docs, k=K, w=W, max_df=10).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)  # doc 3 pairs with nobody


def test_max_df_drops_boilerplate(spark):
    # the same boilerplate line in EVERY doc; max_df below the doc count
    # must suppress the quadratic bucket entirely
    boiler = "copyright two thousand the example company all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"unique page body {i} " * 2 + boiler) for i in range(6)],
        ["doc_id", "text"],
    )
    pairs = substring_dup_pairs(docs, k=K, w=W, max_df=3).collect()
    # every pair evidence must come from non-boilerplate fps; with the cap,
    # boilerplate fingerprints (df=6 > 3) are gone -> no pairs at all
    assert pairs == []
    # without the cap they all pair up
    pairs_nocap = substring_dup_pairs(docs, k=K, w=W, max_df=100).collect()
    assert len(pairs_nocap) == 15  # C(6,2)
