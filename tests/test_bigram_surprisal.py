"""Bigram stupid-backoff surprisal: python parity on the exact bit-length
semantics (self-trained and held-out LM), plus the structural check that
text with unseen bigrams backs off and costs more bits."""

import re

from jassv2_spark.operators.curation import bigram_surprisal


def _py_bigram(corpus, lm=None):
    lm = corpus if lm is None else lm
    tok = {i: re.findall(r"[a-z]+|[0-9]+", t.lower()) for i, t in corpus}
    uni, big = {}, {}
    for _, t in lm:
        ts = re.findall(r"[a-z]+|[0-9]+", t.lower())
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    bits = lambda x: x.bit_length()
    out = {}
    for i, ts in tok.items():
        s, back = 0, 0
        if ts:
            s += bits(n) - bits(uni.get(ts[0], 0) + 1)
        for a, b in zip(ts, ts[1:]):
            if (a, b) in big:
                s += bits(uni[a]) - bits(big[(a, b)])
            else:
                back += 1
                s += 2 + bits(n) - bits(uni.get(b, 0) + 1)
        out[i] = (len(ts), back, s, s / len(ts) if ts else 0.0)
    return out


def _run(spark, corpus, lm=None):
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    lmdf = None if lm is None else spark.createDataFrame(lm, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_tok"], r["n_backoff"], r["sum_bits"], r["mean_bits"])
        for r in bigram_surprisal(docs, lmdf).collect()
    }


def test_bigram_surprisal_self_lm_python_parity(spark):
    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "mat the on sat cat the"),
        (4, "one token"),
        (5, ""),
    ]
    got = _run(spark, corpus)
    assert got == _py_bigram(corpus)
    # self-trained LM has every scored bigram -> backoff never fires
    assert all(v[1] == 0 for v in got.values())


def test_bigram_surprisal_heldout_lm_parity_and_backoff(spark):
    lm = [(101, "the quick brown fox jumps over the lazy dog"),
          (102, "the quick brown fox runs over the lazy cat")]
    corpus = [
        (1, "the quick brown fox"),           # all bigrams seen
        (2, "dog the over fox lazy quick"),   # shuffled: unseen bigrams
        (3, "completely novel wording here"), # OOV words too
    ]
    got = _run(spark, corpus, lm)
    assert got == _py_bigram(corpus, lm)
    assert got[1][1] == 0
    assert got[2][1] > 0
    assert got[3][1] == len("completely novel wording here".split()) - 1
    assert got[2][3] > got[1][3]  # shuffled costs more bits per token


def test_bigram_surprisal_empty_doc(spark):
    got = _run(spark, [(1, ""), (2, "a b")])
    assert got[1] == (0, 0, 0, 0.0)
