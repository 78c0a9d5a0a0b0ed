"""Permuterm wildcard matching: rotation-table completeness vs a brute
fnmatch reference, cap determinism, and serve-chain equivalence."""

import fnmatch

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.search import search
from jassv2_spark.operators.wildcard import (
    permuterm_rotations,
    search_wildcard,
    wildcard_term_expansions,
)

VOCAB = [
    ("spark", 40), ("stream", 30), ("steam", 12), ("scan", 25),
    ("join", 30), ("jargon", 3), ("table", 25), ("cable", 9),
    ("ring", 7), ("string", 11), ("spring", 2), ("a", 50),
]


@pytest.fixture(scope="module")
def stats(spark):
    return spark.createDataFrame(VOCAB, ["term", "df"])


@pytest.fixture(scope="module")
def tiny_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join table"),
            (2, "spark spark stream"),
            (3, "join stream table table"),
            (4, "cable scan string"),
        ],
        ["doc_id", "text"],
    )
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def test_rotation_count_and_contents(spark, stats):
    rows = permuterm_rotations(stats.where("term = 'scan'")).collect()
    got = sorted(r["rotation"] for r in rows)
    assert got == sorted(["scan$", "can$s", "an$sc", "n$sca", "$scan"])


def test_expansions_match_fnmatch_reference(spark, stats):
    """Every supported pattern form agrees with fnmatch over the vocab
    (prefix, suffix, infix, substring doublet, exact-length overlap)."""
    pats = ["s*", "*ing", "s*ing", "*ab*", "j*n", "sp*k", "zz*", "st*m"]
    probes = spark.createDataFrame([(p,) for p in pats], ["pattern"])
    got = {}
    for r in wildcard_term_expansions(stats, probes, max_expand=100).collect():
        got.setdefault(r["pattern"], set()).add(r["term"])
    terms = [t for t, _ in VOCAB]
    for p in pats:
        want = {t for t in terms if fnmatch.fnmatchcase(t, p)}
        assert got.get(p, set()) == want, p


def test_cap_keeps_highest_df_then_term_asc(spark, stats):
    probes = spark.createDataFrame([("s*",)], ["pattern"])
    rows = wildcard_term_expansions(stats, probes, max_expand=3).collect()
    ranked = [r["term"] for r in sorted(rows, key=lambda r: r["cand_rank"])]
    # s-terms by df DESC, term ASC: stream(30), scan(25), spark... wait
    # spark has df 40 — order: spark(40), stream(30), scan(25)
    assert ranked == ["spark", "stream", "scan"]


def test_single_expansion_equals_plain_search(spark, tiny_index):
    q = spark.createDataFrame([("q1", "sp*k table")], ["query_id", "query"])
    plain = spark.createDataFrame([("q1", "spark table")], ["query_id", "query"])
    got = sorted(map(tuple, search_wildcard(tiny_index, q, k=5, with_keys=False).collect()))
    want = sorted(map(tuple, search(tiny_index, plain, k=5, with_keys=False).collect()))
    assert got == want


def test_literal_collides_with_own_expansion_sums_qtf(spark, tiny_index):
    """'st*m stream' expands st*m→stream beside the literal stream: the
    served q_tf is 2, exactly like typing the term twice."""
    q = spark.createDataFrame([("q1", "st*m stream")], ["query_id", "query"])
    twice = spark.createDataFrame([("q1", "stream stream")], ["query_id", "query"])
    got = sorted(map(tuple, search_wildcard(tiny_index, q, k=5, with_keys=False).collect()))
    want = sorted(map(tuple, search(tiny_index, twice, k=5, with_keys=False).collect()))
    assert got == want


def test_unmatched_pattern_drops_like_oov(spark, tiny_index):
    q = spark.createDataFrame([("q1", "zz*")], ["query_id", "query"])
    assert search_wildcard(tiny_index, q, k=5, with_keys=False).count() == 0
    mixed = spark.createDataFrame([("q2", "zz* table")], ["query_id", "query"])
    got = search_wildcard(tiny_index, mixed, k=5, with_keys=False)
    assert got.count() > 0  # the literal still serves


def test_unsupported_multi_star_matches_nothing(spark, stats):
    probes = spark.createDataFrame([("a*b*c",), ("**",)], ["pattern"])
    assert wildcard_term_expansions(stats, probes).count() == 0


def test_literal_token_stemmed_on_stem_built_index(spark):
    """ADVICE r2: on a stem-built index a literal token in a wildcard
    query must stem to the vocabulary form (as search() does) instead of
    silently going OOV; patterns expand against the stemmed vocabulary."""
    from jassv2_spark.operators.build import BuildConf, build_index

    docs = spark.createDataFrame(
        [("d1", "running runner runs jogging"), ("d2", "walking walks"),
         ("d3", "running table")],
        ["url", "html"],
    )
    idx = build_index(docs, text_col="html", key_col="url",
                      conf=BuildConf(stem=True))
    q = spark.createDataFrame([("q1", "running")], ["query_id", "query"])
    want = sorted(map(tuple, search(idx, q, k=5, with_keys=False).collect()))
    got = sorted(map(tuple, search_wildcard(idx, q, k=5, with_keys=False).collect()))
    assert want and got == want
    # and a pattern still expands against the stemmed vocabulary
    qp = spark.createDataFrame([("q2", "run*")], ["query_id", "query"])
    assert search_wildcard(idx, qp, k=5, with_keys=False).count() > 0
    idx.unpersist()
