"""Engine facade: result-side extension methods delegate correctly."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark import Engine
from jassv2_spark.operators.build import BuildConf, build_index


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame(
        [(1, "spark join table", "en"), (2, "spark query window", "de"),
         (3, "join table table", "en"), (4, "window scan", "de")],
        ["doc_id", "text", "lang"],
    )
    e = Engine(build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    ))
    e._docs = docs
    return e


def test_facade_methods_run(spark, eng):
    q = spark.createDataFrame([("q1", "spark joinn")], ["query_id", "query"])
    assert eng.search_fuzzy(q, k=3).count() > 0
    allowed = eng._docs.where(F.col("lang") == "en")
    assert eng.search_filtered(
        spark.createDataFrame([("q1", "spark")], ["query_id", "query"]), allowed, k=3
    ).count() == 1
    qn = spark.createDataFrame([("q1", "table -join")], ["query_id", "query"])
    assert eng.search_negated(qn, k=5).count() == 0  # all 'table' docs have 'join'
    assert eng.more_like_this([1], k=2).count() > 0
    qs = spark.createDataFrame([("q1", "spark")], ["query_id", "query"])
    assert eng.facet_counts(qs, eng._docs, "lang").count() == 2
    assert eng.significant_terms(qs, m=5).count() > 0
    assert eng.ltr_features(qs, k=3).count() > 0
    assert eng.qpp_features(qs).count() == 1
    inc = spark.createDataFrame([(99, "spark text")], ["doc_id", "text"])
    assert eng.percolate(qs, inc).count() == 1
