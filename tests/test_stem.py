"""Porter v1 stemmer: the paper's own example vectors (Porter 1980 §3),
plus end-to-end vocabulary consistency between build and query."""

import pytest

from jassv2_spark.functions.stem import porter_stem, stem_tokens

# (input, expected) — examples from the published algorithm description
VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"), ("rational", "ration"),
    ("valenci", "valenc"), ("hesitanci", "hesit"), ("digitizer", "digit"),
    ("radicalli", "radic"), ("differentli", "differ"), ("vileli", "vile"),
    ("analogousli", "analog"), ("vietnamization", "vietnam"),
    ("predication", "predic"), ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formaliti", "formal"),
    ("sensitiviti", "sensit"), ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"), ("formative", "form"), ("formalize", "formal"),
    ("electriciti", "electr"), ("electrical", "electr"), ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"), ("homologou", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", VECTORS)
def test_porter_vectors(word, expected):
    assert porter_stem(word) == expected


def test_gating():
    # tokens of length ≤ 2 and numerics pass through (JASS_index.cpp:314)
    assert stem_tokens(["is", "a", "12", "2024", "running"]) == [
        "is", "a", "12", "2024", "run"
    ]
    assert stem_tokens(None) is None


def test_stemmed_index_end_to_end(spark):
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.saat import saat_search
    from jassv2_spark.operators.search import search

    docs = spark.createDataFrame(
        [("d1", "the runner was running fast races"),
         ("d2", "she runs a race daily"),
         ("d3", "completely unrelated text here")],
        ["url", "text"],
    )
    idx = build_index(docs, text_col="text", key_col="url", conf=BuildConf(stem=True))
    terms = {r["term"] for r in idx.term_stats.select("term").collect()}
    assert "run" in terms and "race" in terms and "running" not in terms

    q = spark.createDataFrame([("q1", "racing runners")], ["query_id", "query"])
    hits = search(idx, q, k=3, with_keys=True).collect()
    assert {r["key"] for r in hits} >= {"d1", "d2"}
    # SaaT path applies the same stemming
    a = sorted((r["doc_id"], r["rsv"]) for r in search(idx, q, k=3, with_keys=False).collect())
    b = sorted((r["doc_id"], r["rsv"]) for r in saat_search(idx, q, k=3).collect())
    assert a == b
    idx.unpersist()
