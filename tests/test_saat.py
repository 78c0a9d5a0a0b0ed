"""SaaT fast path must be bitwise-identical to the declarative path."""

import pytest

from jassv2_spark.fixtures import TEN_DOC_QUERIES, synthetic_corpus, synthetic_queries, ten_documents
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.saat import package_index, saat_search
from jassv2_spark.operators.search import search


def _collect(df):
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["rsv"]) for r in df.collect())


@pytest.fixture(scope="module")
def syn(spark):
    rows = synthetic_corpus(250)
    docs = spark.createDataFrame([(r["url"], r["html"].decode()) for r in rows], ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    pkg = package_index(idx)
    yield idx, pkg
    idx.unpersist()


@pytest.mark.parametrize("rho", [1.0, 0.3])
def test_saat_equals_declarative(spark, syn, rho):
    idx, pkg = syn
    queries = synthetic_queries(30) + TEN_DOC_QUERIES
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    a = _collect(search(idx, qdf, k=10, rho=rho, with_keys=False))
    b = _collect(saat_search(idx, qdf, k=10, rho=rho, package=pkg))
    assert a == b


def test_saat_ten_docs_budget(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs = spark.createDataFrame(rows, ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    qdf = spark.createDataFrame(TEN_DOC_QUERIES, ["query_id", "query"])
    for budget in [5, 15]:
        a = _collect(search(idx, qdf, k=10, postings_budget=budget, with_keys=False))
        b = _collect(saat_search(idx, qdf, k=10, postings_budget=budget))
        assert a == b, budget
    idx.unpersist()
