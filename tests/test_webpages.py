"""Input-contract web-pages path: (url, warc_ts, html, text, lang) with
byte-identical extraction per url, and the html-built index matching the
text-built index rank-for-rank."""

from pyspark.sql import functions as F

from jassv2_spark.fixtures import synthetic_corpus
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.sources.webpages import (
    build_web_index,
    synthesize_webpages,
    verify_extraction,
)


def _docs(spark, n=120):
    rows = [(i, r["text"]) for i, r in enumerate(synthetic_corpus(n))]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contract_shape_and_extraction_invariant(spark):
    web = synthesize_webpages(_docs(spark))
    assert web.columns == ["url", "warc_ts", "html", "text", "lang"]
    types = dict(web.dtypes)
    assert types["html"] == "binary" and types["warc_ts"] == "timestamp"
    assert verify_extraction(web) == 0  # byte-identical per url


def test_web_index_matches_text_index(spark):
    docs = _docs(spark)
    web = synthesize_webpages(docs)
    idx_web = build_web_index(web)
    idx_txt = build_index(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id")
    q = spark.createDataFrame(
        [("q1", "w0001 w0007"), ("q2", "w0000"), ("q3", "w0003 w0003 w0012")],
        ["query_id", "query"],
    )
    a = sorted(
        (r["query_id"], r["rank"], r["key"], r["rsv"])
        for r in search(idx_web, q, k=10).collect()
    )
    # urls are zero-padded doc_ids → map text-index doc_ids to the same keys
    b = sorted(
        (r["query_id"], r["rank"], f"https://example.org/web/{r['doc_id']:08d}", r["rsv"])
        for r in search(idx_txt, q, k=10, with_keys=False).collect()
    )
    assert a == b
    idx_web.unpersist()
    idx_txt.unpersist()
