"""QPP pre-retrieval features: hand-checked idf/SCQ micros, OOV, scope."""

import math

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.qpp import qpp_features

DOCS = [
    (1, "spark join table"),
    (2, "spark query"),
    (3, "join table table"),
    (4, "window window"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def _idf_micros(n, df):
    return math.floor(1e6 * math.log(n / df))


def _scq_micros(n, df, ctf):
    return math.floor(1e6 * ((1.0 + math.log(float(ctf))) * math.log(1.0 + n / df)))


def test_qpp_hand_checked(spark, idx):
    q = spark.createDataFrame(
        [("q1", "spark table zzz"), ("q2", "window")], ["query_id", "query"]
    )
    rows = {r["query_id"]: r for r in qpp_features(idx, q).collect()}
    r1 = rows["q1"]
    # spark: df=2 ctf=2; table: df=2 ctf=3; zzz OOV
    assert r1["n_terms"] == 3 and r1["n_vocab"] == 2
    idf = [_idf_micros(4.0, 2), _idf_micros(4.0, 2)]
    assert r1["sum_idf_micros"] == sum(idf) and r1["max_idf_micros"] == max(idf)
    scq = [_scq_micros(4.0, 2, 2), _scq_micros(4.0, 2, 3)]
    assert r1["sum_scq_micros"] == sum(scq) and r1["max_scq_micros"] == max(scq)
    # union docs for {spark, table}: {1, 2, 3} → 3/4
    assert r1["scope_ppm"] == math.floor(1e6 * 3.0 / 4.0)
    r2 = rows["q2"]
    assert r2["n_vocab"] == 1 and r2["scope_ppm"] == 250000


def test_qpp_all_oov_zeroes(spark, idx):
    q = spark.createDataFrame([("q1", "zzz yyy")], ["query_id", "query"])
    r = qpp_features(idx, q).collect()[0]
    assert r["n_terms"] == 2 and r["n_vocab"] == 0
    assert r["sum_idf_micros"] == 0 and r["scope_ppm"] == 0
