"""Percolation: routing scores, full-match contract, streaming batches."""

import math

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.percolate import percolate

BASE = [
    (1, "spark join table"),
    (2, "spark query"),
    (3, "join table table"),
    (4, "window window"),
]
REGISTERED = [
    ("alert1", "spark join"),
    ("alert2", "window"),
    ("alert3", "table zzz"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(BASE, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


@pytest.fixture(scope="module")
def reg(spark):
    return spark.createDataFrame(REGISTERED, ["query_id", "query"])


def test_percolate_scores_hand_checked(spark, idx, reg):
    incoming = spark.createDataFrame(
        [(100, "spark spark join"), (101, "window table")], ["doc_id", "text"]
    )
    got = {(r["doc_id"], r["query_id"]): r
           for r in percolate(idx, reg, incoming, m=5).collect()}
    idf = lambda df: math.floor(1e6 * math.log(4.0 / df))
    # doc 100 × alert1: spark tf=2 (df=2) + join tf=1 (df=2)
    r = got[(100, "alert1")]
    assert r["score_micros"] == 2 * idf(2) + 1 * idf(2)
    assert r["n_matched"] == 2 and r["n_terms"] == 2
    # doc 101 × alert2: window tf=1 df=1
    assert got[(101, "alert2")]["score_micros"] == idf(1)
    # doc 101 × alert3: only 'table' matches; 'zzz' OOV still in n_terms
    r3 = got[(101, "alert3")]
    assert r3["n_matched"] == 1 and r3["n_terms"] == 2
    # doc 100 never matches alert2
    assert (100, "alert2") not in got


def test_full_only_requires_every_term(spark, idx, reg):
    incoming = spark.createDataFrame(
        [(100, "spark join extras"), (101, "spark only")], ["doc_id", "text"]
    )
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(idx, reg, incoming, full_only=True).collect()}
    assert (100, "alert1") in got
    assert (101, "alert1") not in got  # missing 'join'
    # alert3 has an OOV term → can never fully match
    assert all(q != "alert3" for _, q in got)


def test_percolate_streaming_foreachbatch(spark, idx, reg, tmp_path):
    """Stateless percolation applied per micro-batch via foreachBatch."""
    src = str(tmp_path / "in")
    out: list = []
    incoming = spark.createDataFrame(
        [(200, "spark join"), (201, "window")], ["doc_id", "text"]
    )
    incoming.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _id: out.extend(percolate(idx, reg, df, m=3).collect())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    routed = {(r["doc_id"], r["query_id"]) for r in out}
    assert (200, "alert1") in routed and (201, "alert2") in routed
