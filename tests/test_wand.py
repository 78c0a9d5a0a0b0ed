"""Block-max WAND pruning must never change results (rank-safety) while
actually pruning segments on skewed corpora."""

import pytest

from jassv2_spark.fixtures import TEN_DOC_QUERIES, synthetic_corpus, synthetic_queries
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.operators.wand import pruning_stats, search_wand


def _collect(df):
    return sorted((r["query_id"], r["rank"], r["doc_id"], r["rsv"]) for r in df.collect())


@pytest.fixture(scope="module")
def idx(spark):
    rows = synthetic_corpus(250)
    docs = spark.createDataFrame([(r["url"], r["html"].decode()) for r in rows], ["url", "html"])
    ix = build_index(docs, text_col="html", key_col="url")
    yield ix
    ix.unpersist()


@pytest.mark.parametrize("rho,k,prefix", [(1.0, 10, 8), (1.0, 3, 2), (0.3, 10, 4)])
def test_wand_identical_to_exhaustive(spark, idx, rho, k, prefix):
    queries = synthetic_queries(25) + TEN_DOC_QUERIES
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    a = _collect(search(idx, qdf, k=k, rho=rho, with_keys=False))
    b = _collect(search_wand(idx, qdf, k=k, rho=rho, prefix=prefix))
    assert a == b


def test_wand_actually_prunes(spark, idx):
    qdf = spark.createDataFrame(synthetic_queries(25), ["query_id", "query"])
    st = pruning_stats(idx, qdf, k=3, prefix=2).collect()
    assert all(r["segments_kept"] <= r["segments_total"] for r in st)
    # on a Zipf-ish corpus with small k, at least one query must shed work
    assert any(r["segments_kept"] < r["segments_total"] for r in st)


def test_oracle_rsv_mode(spark, idx):
    from pyspark.sql import functions as F

    from jassv2_spark.operators.wand import search_with_rsv_oracle

    queries = synthetic_queries(15)
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    exact = search(idx, qdf, k=10, with_keys=False)
    # oracle = the true kth rsv per query (the reference's intended input)
    kth = exact.where(F.col("rank") == 10).select(
        "query_id", F.col("rsv").alias("rsv_at_k")
    )
    got = search_with_rsv_oracle(idx, qdf, kth, k=10)
    assert _collect(got) == _collect(exact)
    # null/absent oracle → exhaustive behavior
    empty = spark.createDataFrame([], "query_id string, rsv_at_k long")
    got2 = search_with_rsv_oracle(idx, qdf, empty, k=10)
    assert _collect(got2) == _collect(exact)


@pytest.mark.parametrize("rho,k,prefix", [(1.0, 10, 8), (1.0, 3, 2), (0.3, 10, 4)])
def test_maxscore_identical_to_exhaustive(spark, idx, rho, k, prefix):
    from jassv2_spark.operators.wand import search_maxscore

    queries = synthetic_queries(25) + TEN_DOC_QUERIES
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    a = _collect(search(idx, qdf, k=k, rho=rho, with_keys=False))
    b = _collect(search_maxscore(idx, qdf, k=k, rho=rho, prefix=prefix))
    assert a == b


def test_maxscore_actually_splits(spark, idx):
    from jassv2_spark.operators.wand import maxscore_stats

    qdf = spark.createDataFrame(synthetic_queries(25), ["query_id", "query"])
    st = maxscore_stats(idx, qdf, k=3, prefix=2).collect()
    assert all(1 <= r["terms_essential"] <= r["terms_total"] for r in st)
    assert all(r["postings_candidate_pass"] <= r["postings_total"] for r in st)
    # with small k on a Zipf-ish corpus some multi-term query must demote
    # at least one term to non-essential
    assert any(r["terms_essential"] < r["terms_total"] for r in st)
