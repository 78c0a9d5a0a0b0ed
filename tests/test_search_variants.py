"""Common-term dropping and term-sharded serving semantics."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.search import (
    search,
    search_common_dropped,
    search_term_sharded,
)


@pytest.fixture(scope="module")
def cidx(spark):
    # 'the' df 5/6 (common at 50% cutoff); 'rare' df 1/6
    docs = spark.createDataFrame(
        [
            (1, "the spark join"),
            (2, "the table scan"),
            (3, "the merge sort"),
            (4, "the window agg"),
            (5, "the query rare"),
            (6, "vector stream"),
        ],
        ["doc_id", "text"],
    )
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def test_common_term_drops_when_keeper_exists(spark, cidx):
    q = spark.createDataFrame([("q1", "the rare")], ["query_id", "query"])
    only_rare = spark.createDataFrame([("q1", "rare")], ["query_id", "query"])
    got = sorted(map(tuple, search_common_dropped(
        cidx, q, k=6, cutoff_ppm=500_000, with_keys=False
    ).collect()))
    want = sorted(map(tuple, search(cidx, only_rare, k=6, with_keys=False).collect()))
    assert got == want and len(got) == 1


def test_all_common_query_keeps_terms(spark, cidx):
    q = spark.createDataFrame([("q1", "the")], ["query_id", "query"])
    got = sorted(map(tuple, search_common_dropped(
        cidx, q, k=6, cutoff_ppm=500_000, with_keys=False
    ).collect()))
    want = sorted(map(tuple, search(cidx, q, k=6, with_keys=False).collect()))
    assert got == want and len(got) == 5  # still serves the common term


def test_oov_does_not_count_as_keeper(spark, cidx):
    # 'zzz' is OOV: the query is effectively all-common → 'the' kept
    q = spark.createDataFrame([("q1", "the zzz")], ["query_id", "query"])
    got = search_common_dropped(
        cidx, q, k=6, cutoff_ppm=500_000, with_keys=False
    )
    assert got.count() == 5


def test_term_sharded_equals_plain_search(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    q = spark.createDataFrame(
        [("q1", "spark join table"), ("q2", "hash hash scan"), ("q3", "the data")],
        ["query_id", "query"],
    )
    for s in (1, 3, 8):
        got = sorted(map(tuple, search_term_sharded(
            idx, q, k=10, n_shards=s, with_keys=False
        ).collect()))
        want = sorted(map(tuple, search(idx, q, k=10, with_keys=False).collect()))
        assert got == want, s
