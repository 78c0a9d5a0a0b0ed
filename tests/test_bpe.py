"""BPE training goldens: pair statistics, merge application order,
and the sequential learner vs a hand-run of Sennrich et al.'s algorithm."""

from jassv2_spark.operators.bpe import (
    apply_merge,
    learn_bpe,
    pair_counts,
    segment_words,
    word_counts,
)


def test_word_and_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest widest")],
        ["doc_id", "text"],
    )
    wc = {r["word"]: r["freq"] for r in word_counts(docs).collect()}
    assert wc == {"low": 3, "lower": 1, "newest": 2, "widest": 1}

    pc = {(r["left"], r["right"]): r["n"]
          for r in pair_counts(spark.createDataFrame(
              [("low", 3), ("lower", 1)], ["word", "freq"])).collect()}
    # l-o and o-w appear in both words: 3 + 1
    assert pc[("l", "o")] == 4 and pc[("o", "w")] == 4
    assert pc[("w", "e")] == 1 and pc[("e", "r")] == 1
    # single-char words contribute no pairs
    pc1 = pair_counts(spark.createDataFrame([("a", 5)], ["word", "freq"])).collect()
    assert pc1 == []


def test_apply_merge_leftmost_nonoverlapping(spark):
    v = spark.createDataFrame(
        [("aaa", 1, ["a", "a", "a"]), ("abab", 1, ["a", "b", "a", "b"])],
        ["word", "freq", "symbols"],
    )
    out = {r["word"]: r["symbols"] for r in apply_merge(v, "a", "a").collect()}
    assert out["aaa"] == ["aa", "a"]  # leftmost-first, non-overlapping
    assert out["abab"] == ["a", "b", "a", "b"]
    out2 = {r["word"]: r["symbols"] for r in apply_merge(v, "a", "b").collect()}
    assert out2["abab"] == ["ab", "ab"]


def test_learn_bpe_matches_textbook_run(spark):
    # the Sennrich et al. (2016) worked example vocabulary
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], ["doc_id", "text"])
    merges = learn_bpe(docs, n_merges=4)

    # hand-run: e-s (9), es-t (9), est-? ... first merges per the paper:
    # pairs: (e,s)=9, (s,t)=9, ... tie (e,s) vs (s,t) -> (e,s) first by
    # left ASC; then (es,t)=9; then (l,o)=7; then (lo,w)=7
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    assert merges[2][:2] == ("l", "o") and merges[2][2] == 7
    assert merges[3][:2] == ("lo", "w") and merges[3][2] == 7

    seg = {r["word"]: r["symbols"]
           for r in segment_words(word_counts(docs), merges).collect()}
    assert seg["newest"] == ["n", "e", "w", "est"]
    assert seg["low"] == ["low"]
    assert seg["widest"] == ["w", "i", "d", "est"]
    assert seg["lower"] == ["low", "e", "r"]


def test_learn_bpe_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert learn_bpe(docs, n_merges=3) == []
