"""URL canonicalization + paragraph dedup (web-pipeline operators)."""

from pyspark.sql import functions as F

from jassv2_spark.operators.weburls import (
    canonical_urls,
    paragraph_duplicates,
    paragraph_hashes,
)

CASES = [
    # (input, canonical, host)
    ("HTTPS://Example.org:443/Web/9/?utm_source=x&ref=1#frag",
     "https://example.org/Web/9/?ref=1", "example.org"),
    ("http://example.ORG:80/web/1", "http://example.org/web/1", "example.org"),
    ("https://example.org/a/?gclid=abc", "https://example.org/a", "example.org"),
    ("https://example.org/a?b=1&utm_campaign=z&c=2", "https://example.org/a?b=1&c=2",
     "example.org"),
    ("https://example.org/a?utm_a=1&utm_b=2", "https://example.org/a", "example.org"),
    ("https://Sub.Example.org:8080/P/Q?x=1", "https://sub.example.org:8080/P/Q?x=1",
     "sub.example.org"),
    ("https://example.org/", "https://example.org", "example.org"),
]


def test_canonicalize_golden_cases(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], ["url"])
    got = {r["url"]: (r["canon_url"], r["host"]) for r in canonical_urls(df).collect()}
    for u, canon, host in CASES:
        assert got[u] == (canon, host), u


def test_paragraph_dedup(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared footer. unique one. shared footer"),
            (2, "unique two. shared footer"),
            (3, "totally different text"),
        ],
        ["doc_id", "text"],
    )
    ph = paragraph_hashes(docs)
    assert ph.where(F.col("doc_id") == 1).count() == 3
    dups = paragraph_duplicates(docs, min_docs=2).collect()
    assert len(dups) == 1  # only 'shared footer' crosses documents
    assert dups[0]["n_docs"] == 2 and dups[0]["n_occurrences"] == 3
    assert dups[0]["keep_doc"] == 1


def test_lang_ngram_heuristic(spark):
    """n-gram language ID on real sentences of each profiled language."""
    from jassv2_spark.operators.textstats import lang_ngram_scores

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox is jumping over the lazy dog in the garden."),
            (2, "Der schnelle braune Fuchs springt über den faulen Hund und das Kind."),
            (3, "Le renard brun rapide saute par-dessus le chien paresseux dans le parc."),
            (4, "El rápido zorro marrón salta sobre el perro perezoso en el parque."),
            (5, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_ngram"] for r in lang_ngram_scores(docs).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_strip_boilerplate_drops_common_paragraphs(spark):
    from jassv2_spark.operators.weburls import strip_boilerplate

    footer = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha content. {footer}. more alpha"),
            (2, f"{footer}. unique beta content"),
            (3, f"unique gamma. {footer}"),
            (4, f"{footer}"),           # all boilerplate
            (5, "entirely unique text"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_dropped"])
        for r in strip_boilerplate(docs, min_docs=3).collect()
    }
    assert got[1] == ("unique alpha content. more alpha", 3, 1)
    assert got[2] == ("unique beta content", 2, 1)
    assert got[3] == ("unique gamma", 2, 1)
    assert got[4] == ("", 1, 1)
    assert got[5] == ("entirely unique text", 1, 0)


def test_strip_boilerplate_threshold_respected(spark):
    from jassv2_spark.operators.weburls import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "twice seen. own line one"), (2, "twice seen. own line two")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["clean_text"]
           for r in strip_boilerplate(docs, min_docs=3).collect()}
    # df=2 < min_docs=3 -> nothing stripped
    assert got == {1: "twice seen. own line one", 2: "twice seen. own line two"}
