"""Recency-decayed ranking: dyadic half-life semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.freshness import search_fresh
from jassv2_spark.operators.search import search


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple"),  # strong but old
            (2, "apple"),             # weak but fresh
            (3, "pear"),
        ],
        ["doc_id", "text"],
    )
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def _ts(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s))
         for i, s in rows],
        ["doc_id", "ts"],
    )


def test_decay_halves_per_half_life(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    # doc 2 is the newest (age 0); doc 1 is 2 half-lives older
    ts = _ts(spark, [(1, 0), (2, 200), (3, 200)])
    got = {r["doc_id"]: r for r in search_fresh(
        idx, q, ts, half_life_s=100, k=5, with_keys=False).collect()}
    base = {r["doc_id"]: r["rsv"]
            for r in search(idx, q, k=5, with_keys=False).collect()}
    assert got[1]["rsv"] == base[1]  # rsv itself unchanged
    assert got[1]["fresh_micros"] == (1_000_000 * base[1]) // 4  # 2 half-lives
    assert got[2]["fresh_micros"] == 1_000_000 * base[2]  # age 0: no decay
    # strong-but-old doc 1: rsv(1) > rsv(2) but rsv(1)/4 vs rsv(2) decides rank
    want_first = 1 if base[1] // 4 > base[2] else 2
    ranks = {r["doc_id"]: r["rank"] for r in got.values()}
    assert ranks[want_first] == 1


def test_fresh_rank_flips_vs_plain_search(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    plain = search(idx, q, k=5, with_keys=False).collect()
    top_plain = min(plain, key=lambda r: r["rank"])["doc_id"]
    assert top_plain == 1  # tf=3 wins without decay
    ts = _ts(spark, [(1, 0), (2, 10_000), (3, 10_000)])
    fresh = search_fresh(idx, q, ts, half_life_s=100, k=5,
                         with_keys=False).collect()
    top_fresh = min(fresh, key=lambda r: r["rank"])["doc_id"]
    assert top_fresh == 2  # 100 half-lives kill doc 1


def test_shift_clamped_at_40(spark, idx):
    q = spark.createDataFrame([("q1", "apple")], ["query_id", "query"])
    ts = _ts(spark, [(1, 0), (2, 10**9), (3, 10**9)])  # ~31 years older
    got = {r["doc_id"]: r["fresh_micros"] for r in search_fresh(
        idx, q, ts, half_life_s=1, k=5, with_keys=False).collect()}
    assert got[1] == 0  # decayed to zero micros, no overflow
