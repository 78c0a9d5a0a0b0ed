"""DSIR importance weights: exact parity with a python re-simulation of
the hashed-bigram bit-length log-ratio, plus directional checks (docs
resembling the target score higher than off-domain docs)."""

import hashlib
import re

from jassv2_spark.operators.curation import dsir_weights

BUCKETS = 64


def _feats(text, n=2):
    toks = re.findall(r"[a-z]+|[0-9]+", text.lower())
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % BUCKETS for g in grams
    ]


def _py_dsir(raw, target, n=2):
    cr, ct = {}, {}
    for _, t in raw:
        for b in _feats(t, n):
            cr[b] = cr.get(b, 0) + 1
    for _, t in target:
        for b in _feats(t, n):
            ct[b] = ct.get(b, 0) + 1
    zr = sum(cr.values()) + BUCKETS
    zt = sum(ct.values()) + BUCKETS
    bits = lambda x: x.bit_length()
    out = {}
    for i, t in raw:
        fs = _feats(t, n)
        s = sum(
            bits(ct.get(b, 0) + 1) - bits(cr.get(b, 0) + 1) + bits(zr) - bits(zt)
            for b in fs
        )
        out[i] = (len(fs), s, s / len(fs) if fs else 0.0)
    return out


def _run(spark, raw, target):
    docs = spark.createDataFrame(raw, ["doc_id", "text"])
    tgt = spark.createDataFrame(target, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_feat"], r["sum_bits"], r["mean_bits"])
        for r in dsir_weights(docs, tgt, buckets=BUCKETS).collect()
    }


def test_dsir_python_parity(spark):
    raw = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "neural network training with gradient descent optimization"),
        (3, "buy cheap pills online casino poker win money now"),
        (4, "gradient descent converges for convex neural objectives"),
        (5, ""),
    ]
    target = [
        (101, "neural network gradient descent theory"),
        (102, "convex optimization and gradient methods for neural models"),
    ]
    assert _run(spark, raw, target) == _py_dsir(raw, target)


def test_dsir_on_domain_beats_off_domain(spark):
    raw = [
        (1, "gradient descent neural network optimization " * 4),
        (2, "casino poker slots jackpot bonus spins " * 4),
    ]
    target = [(101, "neural network gradient descent optimization research")]
    got = _run(spark, raw, target)
    assert got[1][2] > got[2][2]


def test_dsir_empty_doc_zero_row(spark):
    got = _run(spark, [(1, "")], [(2, "anything at all")])
    assert got[1] == (0, 0, 0.0)
