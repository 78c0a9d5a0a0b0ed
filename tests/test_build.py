"""Index-build goldens: the reference 10-document collection.

Assertions transcribed from `source/index_manager_sequential.h:446-485`
(exact inverted index), `source/quantize.h:255-278` (rsv bounds 0/2), and
`source/ranking_function_atire_bm25.h:154-166` (rsv*1000 == 1635).
"""

import math

import pytest
from pyspark.sql import functions as F

from jassv2_spark.fixtures import TEN_DOC_POSTINGS, ten_documents
from jassv2_spark.operators.build import BuildConf, build_index


@pytest.fixture(scope="module")
def ten_index(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs = spark.createDataFrame(rows, ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    yield idx
    idx.unpersist()


def test_doc_ids_dense_in_order(ten_index):
    got = {r["key"]: r["doc_id"] for r in ten_index.doc_map.collect()}
    assert got == {f"https://example.org/ten/{i:08d}": i for i in range(1, 11)}


def test_inverted_index_golden(ten_index):
    rows = ten_index.postings.collect()
    got = {}
    for r in rows:
        got.setdefault(r["term"], []).append((r["doc_id"], r["tf"]))
    got = {t: sorted(v) for t, v in got.items()}
    assert got == TEN_DOC_POSTINGS


def test_doc_lengths(ten_index):
    # doc i holds i body words + 1 DOCNO numeric token
    got = {r["doc_id"]: r["dl"] for r in ten_index.doc_lengths.collect()}
    assert got == {i: i + 1 for i in range(1, 11)}
    assert ten_index.n_docs == 10
    assert ten_index.collection_length == sum(i + 1 for i in range(1, 11))
    assert ten_index.mean_doc_length == ten_index.collection_length / 10


def test_quantize_bounds_golden(ten_index):
    # source/quantize.h:266-275: int(smallest)==0 and int(largest)==2
    assert int(ten_index.min_rsv) == 0
    assert int(ten_index.max_rsv) == 2


def test_impacts_in_range_and_extremes(ten_index):
    rows = ten_index.impacts.collect()
    vals = [r["impact"] for r in rows]
    assert min(vals) >= 1 and max(vals) <= 1024
    assert 1024 in vals  # the max-scoring posting hits the top bucket
    assert 1 in vals  # the min-scoring posting hits the bottom bucket


def test_bm25_formula_spot_value():
    # ranking_function_atire_bm25.h:154-166 — df=2, N=5, lengths {30..70},
    # tf=12, doc 1 (length 40), mean = 250/4.
    k1, b = 0.9, 0.4
    mean = 250 / 4
    idf = math.log(5 / 2)
    lc = k1 * ((1 - b) + b * 40 / mean)
    rsv = idf * ((12 * (k1 + 1)) / (12 + lc))
    assert int(rsv * 1000) == 1635


def test_segments_match_impacts(ten_index):
    seg = ten_index.segments.collect()
    # explode shards and compare against the impacts table
    exploded = set()
    for r in seg:
        assert r["doc_ids"] == sorted(r["doc_ids"])
        assert r["part_freq"] == len(r["doc_ids"])
        assert r["min_doc"] == r["doc_ids"][0]
        for d in r["doc_ids"]:
            exploded.add((r["term"], r["impact"], d))
    want = {(r["term"], r["impact"], r["doc_id"]) for r in ten_index.impacts.collect()}
    assert exploded == want


def test_seg_stats_and_term_stats(ten_index):
    stats = {(r["term"], r["impact"]): r["seg_freq"] for r in ten_index.seg_stats.collect()}
    assert sum(stats.values()) == sum(len(v) for v in TEN_DOC_POSTINGS.values())
    ts = {r["term"]: (r["df"], r["max_impact"]) for r in ten_index.term_stats.collect()}
    assert ts["ten"][0] == 10
    assert ts["one"][0] == 1
    # "one" appears once in the longest doc → low tf, low idf? high idf (df=1)
    assert set(ts) == set(TEN_DOC_POSTINGS)


def test_build_deterministic_across_parallelism(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs1 = spark.createDataFrame(rows, ["url", "html"]).repartition(1)
    docs4 = spark.createDataFrame(rows, ["url", "html"]).repartition(4)
    i1 = build_index(docs1, text_col="html", key_col="url", cache=False)
    i4 = build_index(docs4, text_col="html", key_col="url", cache=False)
    a = sorted((r["term"], r["impact"], r["doc_id"]) for r in i1.impacts.collect())
    b = sorted((r["term"], r["impact"], r["doc_id"]) for r in i4.impacts.collect())
    assert a == b
    assert (i1.min_rsv, i1.max_rsv) == (i4.min_rsv, i4.max_rsv)
    # the SEGMENT LAYOUT is also identical row-for-row: shard boundaries
    # depend only on (doc_id, df, n_docs), never on the partitioning
    s1 = sorted(
        (r["term"], r["impact"], r["min_doc"], r["part_freq"], tuple(r["doc_ids"]))
        for r in i1.segments.collect()
    )
    s4 = sorted(
        (r["term"], r["impact"], r["min_doc"], r["part_freq"], tuple(r["doc_ids"]))
        for r in i4.segments.collect()
    )
    assert s1 == s4


def test_hot_term_segment_shards_bounded(spark):
    """Zipf-head skew stress (BASELINE.md skew row): a stopword appearing in
    EVERY document must be split into bounded doc-range shards (no single
    giant group ever reaches one task), while tail terms stay single-shard
    (no segment-row inflation). Bound comes from build_segments' df-adaptive
    width: max(shard_size, n_docs*shard_size/df)."""
    from pyspark.sql import functions as F

    from jassv2_spark.operators.build import BuildConf, build_index

    n, shard = 2000, 64
    docs = spark.createDataFrame(
        [(i, f"the common w{i % 50:04d}") for i in range(1, n + 1)], ["doc_id", "text"]
    )
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(shard_size=shard, tokenizer="ascii"),
    )
    hot = idx.segments.where(F.col("term") == "the").collect()
    assert sum(r["part_freq"] for r in hot) == n
    assert len(hot) >= n // shard  # the Zipf head really is split
    assert max(r["part_freq"] for r in hot) <= shard  # every shard bounded
    tail = idx.segments.where(F.col("term") == "0007").collect()  # "w0007" → "w"+"0007"
    assert len(tail) == 1 and tail[0]["part_freq"] == n // 50  # tail: one shard
    idx.unpersist()
