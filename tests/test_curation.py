"""Decontamination, sequence packing, and domain-cap sampling —
hand-checkable semantics, determinism, and boundary cases."""

import hashlib

from pyspark.sql import functions as F

from jassv2_spark.operators.curation import (
    decontaminate,
    domain_cap_sample,
    pack_sequences,
    temperature_mix_sample,
    unigram_surprisal,
)


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def test_decontaminate_flags_shared_ngram(spark):
    leak = "alpha beta gamma delta epsilon"  # 5 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words {leak} trailing text here"),
            (2, "completely disjoint training document with no overlap"),
            (3, f"{leak} {leak}"),  # leak twice -> still distinct grams
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, f"benchmark prompt {leak} answer")], ["doc_id", "text"])
    out = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(train, ev, n=5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    # doc 3: "... epsilon alpha ..." bridge grams exist in doc 3 only, not in
    # the eval doc, so exactly the one eval 5-gram matches
    assert out[3] == (1, True)
    assert len(out) == 3  # every train doc reported, hit or not


def test_decontaminate_short_docs_are_clean(spark):
    train = spark.createDataFrame([(1, "too short")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "too short")], ["doc_id", "text"])
    out = decontaminate(train, ev, n=5).collect()
    assert [(r["n_hits"], r["contaminated"]) for r in out] == [(0, False)]


def test_pack_sequences_offsets_and_spans(spark):
    # source A: 3 docs of 4, 3, 2 tokens; ctx_len=5
    # stream: [0..3][4..6][7..8] -> seq 0 covers 0-4, seq 1 covers 5-9
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (2, "e f g", "A"),
            (3, "h i", "A"),
            (10, "x y z w v u", "B"),  # other shard packs independently
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["doc_id"]: (r["n_tok"], r["tok_start"], r["seq_first"], r["seq_last"])
           for r in pack_sequences(docs, ctx_len=5).collect()}
    assert out[1] == (4, 0, 0, 0)
    assert out[2] == (3, 4, 0, 1)  # spans the seq-0/seq-1 boundary
    assert out[3] == (2, 7, 1, 1)
    assert out[10] == (6, 0, 0, 1)  # shard B restarts at offset 0


def test_pack_sequences_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e", "A"), (2, "...", "A"), (3, "f", "A")],
        ["doc_id", "text", "source"],
    )
    out = {r["doc_id"]: (r["n_tok"], r["tok_start"], r["seq_first"], r["seq_last"])
           for r in pack_sequences(docs, ctx_len=5).collect()}
    assert out[2] == (0, 5, 1, 1)  # zero tokens: sits at its offset's sequence
    assert out[3] == (1, 5, 1, 1)


def test_domain_cap_sample_keeps_cap_lowest_buckets(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "A") for i in range(10)]
        + [(100 + i, f"text {100+i}", "B") for i in range(3)],
        ["doc_id", "text", "source"],
    )
    out = domain_cap_sample(docs, cap=4).collect()
    kept_a = sorted(r["doc_id"] for r in out if r["source"] == "A" and r["keep"])
    expect_a = sorted(range(10), key=lambda i: (_bucket(i), i))[:4]
    assert kept_a == sorted(expect_a)
    # under-cap domain keeps everything
    assert all(r["keep"] for r in out if r["source"] == "B")
    # bucket matches the split_assign md5 recipe (composability contract)
    for r in out:
        assert r["bucket"] == _bucket(r["doc_id"])


def test_unigram_surprisal_hand_checked(spark):
    # corpus: "a" x4, "b" x2, "c" x1, "rare" x1 -> N=8, bits(8)=4
    # bits: a -> 4-3=1, b -> 4-2=2, c -> 4-1=3, rare -> 4-1=3
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c"), (3, "rare"), (4, "...")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["n_tok"], r["sum_bits"], r["mean_bits"])
           for r in unigram_surprisal(docs).collect()}
    assert out[1] == (4, 1 + 1 + 1 + 2, 5 / 4)
    assert out[2] == (3, 1 + 2 + 3, 2.0)
    assert out[3] == (1, 3, 3.0)  # the all-rare doc scores highest
    assert out[4] == (0, 0, 0.0)  # token-free doc present with zeros
    # supplying the known collection total (two-pass plan) is identical
    out2 = {r["doc_id"]: (r["n_tok"], r["sum_bits"], r["mean_bits"])
            for r in unigram_surprisal(docs, n_total=8).collect()}
    assert out2 == out


def test_collocations_hand_checked(spark):
    from jassv2_spark.operators.curation import collocations

    # "new york" sticks together (3/3 co-occurrences); "the cat" is common
    # but both words are frequent elsewhere -> lower PMI
    docs = spark.createDataFrame(
        [
            (1, "new york is big the cat sat"),
            (2, "in new york the cat slept"),
            (3, "new york again the cat the dog"),
        ],
        ["doc_id", "text"],
    )
    out = collocations(docs, min_count=3, top_k=5).collect()
    rows = {r["bigram"]: r for r in out}
    assert set(rows) == {"new york", "the cat"}
    ny, tc = rows["new york"], rows["the cat"]
    assert (ny["n_ab"], ny["n_a"], ny["n_b"]) == (3, 3, 3)
    assert tc["n_ab"] == 3 and tc["n_a"] == 4  # 'the' appears 4x
    assert ny["pmi_bits"] > tc["pmi_bits"]
    # bits identity: n_u = 20 tokens -> bits 5; n_bi = 17 bigrams -> bits 5
    # ny: bits(3) + 2*5 - bits(3) - bits(3) - 5 = 2 + 10 - 2 - 2 - 5 = 3
    assert ny["pmi_bits"] == 3 and tc["pmi_bits"] == 2


def test_temperature_mix_sqrt_flattening(spark):
    import math

    # domain A: 16 docs, domain B: 4 docs -> rate_A = sqrt(4/16) = 0.5,
    # rate_B = 1.0 (smallest domain keeps everything)
    docs = spark.createDataFrame(
        [(i, "t", "A") for i in range(16)] + [(100 + i, "t", "B") for i in range(4)],
        ["doc_id", "text", "source"],
    )
    out = temperature_mix_sample(docs).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["rate"] == 0.5 and by[0]["n_source"] == 16
    assert by[100]["rate"] == 1.0
    assert all(by[100 + i]["keep"] for i in range(4))
    # keep decision reproduces the md5-bucket rule exactly
    for r in out:
        expect = _bucket(r["doc_id"]) < math.sqrt(4 / r["n_source"]) * 2**32
        assert r["keep"] == expect, r


def test_temperature_mix_dyadic_alpha(spark):
    import math

    # A: 16 docs, B: 1 doc; alpha = 3/4 -> exponent 1/4:
    # rate_A = (1/16)^(1/4) = 0.5 EXACTLY (power of two -> sqrt chain exact)
    docs = spark.createDataFrame(
        [(i, "t", "A") for i in range(16)] + [(100, "t", "B")],
        ["doc_id", "text", "source"],
    )
    out = {r["doc_id"]: r for r in temperature_mix_sample(docs, alpha=0.75).collect()}
    assert out[0]["rate"] == 0.5
    assert out[100]["rate"] == 1.0
    # alpha=1 is the proportional no-op: every rate is 1, everything kept
    out1 = temperature_mix_sample(docs, alpha=1.0).collect()
    assert all(r["rate"] == 1.0 and r["keep"] for r in out1)
    # alpha=0 is uniform: rate_A = 1/16 exactly
    out0 = {r["doc_id"]: r for r in temperature_mix_sample(docs, alpha=0.0).collect()}
    assert out0[0]["rate"] == 1.0 / 16.0
    # general dyadic: alpha = 45/64 -> exponent 19/64; the recipe's value is
    # the 19-fold product of the 6-fold sqrt — reproduce it in CPython
    out_g = {r["doc_id"]: r for r in
             temperature_mix_sample(docs, alpha=45 / 64).collect()}
    y = 1.0 / 16.0
    for _ in range(6):
        y = math.sqrt(y)
    expect = y
    for _ in range(18):
        expect = expect * y
    assert out_g[0]["rate"] == expect  # bitwise


def test_temperature_mix_rejects_non_dyadic_alpha(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "t", "A")], ["doc_id", "text", "source"])
    with _pytest.raises(ValueError, match="0.703125"):
        temperature_mix_sample(docs, alpha=0.7)
    with _pytest.raises(ValueError, match=r"\[0, 1\]"):
        temperature_mix_sample(docs, alpha=1.5)


def test_dyadic_exponent_decomposition():
    from jassv2_spark.operators.curation import dyadic_exponent

    assert dyadic_exponent(0.5) == (1, 1)       # 1-a = 1/2
    assert dyadic_exponent(0.75) == (1, 2)      # 1/4
    assert dyadic_exponent(45 / 64) == (19, 6)  # 19/64
    assert dyadic_exponent(1.0) == (0, 0)
    assert dyadic_exponent(0.0) == (1, 0)


def test_domain_cap_sample_rank_is_dense_and_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "t", "A") for i in range(6)], ["doc_id", "text", "source"]
    )
    a = domain_cap_sample(docs, cap=3).collect()
    b = domain_cap_sample(docs.repartition(5), cap=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(r["rk"] for r in a) == [1, 2, 3, 4, 5, 6]


def test_chunk_passages_goldens(spark):
    """Sliding-window passage chunking: coverage, overlap, tail, empty doc."""
    from jassv2_spark.operators.curation import chunk_passages

    docs = spark.createDataFrame(
        [
            (1, "ta tb tc td te tf tg th ti tj"),        # 10 tokens
            (2, "a b c d e f g h i j k"),                 # 11 tokens
            (3, "x y"),                                    # shorter than window
            (4, ""),                                       # empty
        ],
        ["doc_id", "text"],
    )
    rows = chunk_passages(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])

    # doc 1: n=10 -> 1 + ceil(6/3) = 3 chunks at starts 0, 3, 6
    c1 = by_doc[1]
    assert [(r["tok_start"], r["n_tok"]) for r in c1] == [(0, 4), (3, 4), (6, 4)]
    assert c1[0]["chunk_text"] == "ta tb tc td"
    assert c1[1]["chunk_text"] == "td te tf tg"   # 1-token overlap
    assert c1[2]["chunk_text"] == "tg th ti tj"

    # doc 2: n=11 -> 4 chunks; tail is short but covers the last token
    c2 = by_doc[2]
    assert [(r["tok_start"], r["n_tok"]) for r in c2] == [
        (0, 4), (3, 4), (6, 4), (9, 2)]
    assert c2[3]["chunk_text"] == "j k"

    # doc 3: single chunk shorter than window
    assert [(r["tok_start"], r["n_tok"], r["chunk_text"]) for r in by_doc[3]] == [
        (0, 2, "x y")]

    # doc 4: empty doc -> one empty chunk (accountability row)
    assert [(r["n_tok"], r["chunk_text"]) for r in by_doc[4]] == [(0, "")]

    # every token of doc 2 is covered by at least one chunk
    covered = set()
    for r in c2:
        covered.update(range(r["tok_start"], r["tok_start"] + r["n_tok"]))
    assert covered == set(range(11))

    # stride == window -> disjoint exact partition
    dis = chunk_passages(docs.where("doc_id = 1"), window=5, stride=5).collect()
    assert sorted((r["tok_start"], r["n_tok"]) for r in dis) == [(0, 5), (5, 5)]
