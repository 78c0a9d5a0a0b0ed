"""Authority-blended ranking: BM25 rsv × PageRank prior."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.search import search
from jassv2_spark.operators.webgraph import PR_PRIOR_DIV, search_authority


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [(1, "apple apple apple"), (2, "apple"), (3, "pear")],
        ["doc_id", "text"],
    )
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def _pr(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "pr"])


def test_blend_is_exact_integer_product(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    base = {r["doc_id"]: r["rsv"]
            for r in search(idx, q, k=5, with_keys=False).collect()}
    pr = _pr(spark, [(1, 3 * PR_PRIOR_DIV), (2, 50 * PR_PRIOR_DIV), (3, 10**12)])
    got = {r["doc_id"]: r for r in search_authority(
        idx, q, pr, k=5, with_keys=False).collect()}
    assert got[1]["blend"] == base[1] * 3
    assert got[2]["blend"] == base[2] * 50
    assert got[1]["rsv"] == base[1]  # rsv itself untouched


def test_prior_flips_rank(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    base = {r["doc_id"]: r["rsv"]
            for r in search(idx, q, k=5, with_keys=False).collect()}
    assert base[1] > base[2]  # tf=3 beats tf=1 on text alone
    # give doc 2 enough authority to overturn the text gap
    boost = (base[1] // base[2] + 2) * PR_PRIOR_DIV
    pr = _pr(spark, [(1, PR_PRIOR_DIV), (2, boost), (3, PR_PRIOR_DIV)])
    got = sorted(search_authority(idx, q, pr, k=5, with_keys=False).collect(),
                 key=lambda r: r["rank"])
    assert got[0]["doc_id"] == 2


def test_docs_missing_from_pr_are_dropped(spark, idx):
    # inner-join semantics: a doc with no pr row has no prior -> excluded
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    pr = _pr(spark, [(2, PR_PRIOR_DIV)])
    ids = {r["doc_id"] for r in search_authority(
        idx, q, pr, k=5, with_keys=False).collect()}
    assert ids == {2}
