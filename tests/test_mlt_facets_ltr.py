"""More-like-this, faceted counts, and LTR feature extraction semantics."""

import math

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.facets import facet_counts
from jassv2_spark.operators.ltr import ltr_features
from jassv2_spark.operators.mlt import mlt_query_terms, more_like_this
from jassv2_spark.operators.search import search

DOCS = [
    (1, "spark join table", "en", "a"),
    (2, "spark join table", "en", "b"),  # exact twin of doc 1
    (3, "join query table table cable", "en", "a"),
    (4, "cable coin coin", "de", "b"),
    (5, "query window window window", "de", "a"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])


def test_mlt_term_selection_is_topm_tfidf(spark, idx):
    got = mlt_query_terms(idx, [3], m=2).collect()
    # doc 3 terms: join(df3) query(df2) table(df3,tf2) cable(df2)
    # weights: table 2*ln(5/3), query 1*ln(5/2), cable 1*ln(5/2), join 1*ln(5/3)
    w_table = 2.0 * math.log(5 / 3)
    w_query = math.log(5 / 2)
    assert w_table > w_query  # sanity on the fixture
    terms = {r["term"] for r in got}
    assert terms == {"table", "cable"} or terms == {"table", "query"}
    # tie query==cable broken by term ASC → cable wins rank 2
    assert terms == {"table", "cable"}
    assert all(r["q_tf"] == 1 and r["query_id"] == "m3" for r in got)


def test_mlt_excludes_seed_and_finds_twin(spark, idx):
    got = more_like_this(idx, [1], k=3, with_keys=False).collect()
    ids = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert 1 not in ids  # seed never in its own results
    assert ids[0] == 2  # the exact twin ranks first


def test_facet_counts_match_brute_force(spark, idx, docs_df):
    q = spark.createDataFrame([("q1", "spark cable")], ["query_id", "query"])
    got = {
        (r["facet"]): (r["n_hits"], r["facet_rank"])
        for r in facet_counts(idx, q, docs_df, "lang").collect()
    }
    # matching docs: spark→{1,2}, cable→{3,4} ⇒ en={1,2,3}, de={4}
    assert got == {"en": (3, 1), "de": (1, 2)}
    by_src = {
        r["facet"]: r["n_hits"]
        for r in facet_counts(idx, q, docs_df, "source").collect()
    }
    assert by_src == {"a": 2, "b": 2}


def test_facet_rsv_mass_equals_hit_rsvs(spark, idx, docs_df):
    q = spark.createDataFrame([("q1", "spark cable")], ["query_id", "query"])
    hits = search(idx, q, k=100, with_keys=False).collect()
    want = sum(r["rsv"] for r in hits)
    got = sum(
        r["sum_rsv"] for r in facet_counts(idx, q, docs_df, "lang").collect()
    )
    assert got == want


def test_ltr_features_hand_checked(spark, idx):
    q = spark.createDataFrame([("q1", "table table coin zzz")], ["query_id", "query"])
    rows = {r["doc_id"]: r for r in ltr_features(idx, q, k=5).collect()}
    # candidates: docs with table (1,2,3) or coin (4)
    assert set(rows) == {1, 2, 3, 4}
    r3 = rows[3]
    assert r3["n_terms"] == 3  # table, coin, zzz (OOV counted)
    assert r3["n_matched"] == 1  # only 'table'
    assert r3["sum_tf"] == 2 and r3["max_tf"] == 2
    assert r3["sum_qtf_tf"] == 4  # q_tf(table)=2 × tf=2
    assert r3["dl"] == 5
    assert r3["idf_micros_sum"] == math.floor(1e6 * math.log(5 / 3))
    r4 = rows[4]
    assert r4["n_matched"] == 1 and r4["sum_qtf_tf"] == 2  # coin tf=2, q_tf=1
    assert r4["min_df"] == 1  # df(coin)=1


def test_ltr_rank_matches_search(spark, idx):
    q = spark.createDataFrame([("q1", "join table")], ["query_id", "query"])
    feats = {(r["doc_id"]): (r["rsv"], r["rank"]) for r in ltr_features(idx, q, k=3).collect()}
    serve = {(r["doc_id"]): (r["rsv"], r["rank"]) for r in search(idx, q, k=3, with_keys=False).collect()}
    assert feats == serve


def test_doc_keyterms_topm_per_doc(spark, idx):
    from jassv2_spark.operators.mlt import doc_keyterms

    got = doc_keyterms(idx, m=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["term_rank"])
    # doc 1 "spark join table": spark ln(5/2) > join == table ln(5/3),
    # tie broken term ASC -> join is rank 2
    assert [r["term"] for r in by_doc[1]] == ["spark", "join"]
    # doc 4 "cable coin coin": coin 2*ln(5/1) beats cable ln(5/2)
    assert [r["term"] for r in by_doc[4]] == ["coin", "cable"]
    # exact-integer witness: weight_micros = tf * floor(1e6 * ln(N/df))
    r4 = by_doc[4][0]
    assert r4["weight_micros"] == 2 * math.floor(1_000_000 * math.log(5 / 1))
    assert all(len(rows) == 2 for rows in by_doc.values())


def test_range_facets_bucket_semantics(spark, idx):
    from jassv2_spark.operators.facets import facet_counts, range_facet_counts

    queries = spark.createDataFrame([("q1", "table query")], ["query_id", "query"])
    dls = idx.doc_lengths.select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )
    got = range_facet_counts(idx, queries, dls, "dl", [3, 5]).collect()
    # every label well-formed, and counts equal a manual facet_counts over
    # the same CASE-bucketed column
    import pyspark.sql.functions as SF
    manual = dls.select(
        "doc_id",
        SF.when(SF.col("dl") < 3, "lt_3")
        .when(SF.col("dl") < 5, "3_5")
        .otherwise("ge_5")
        .alias("bucket"),
    )
    want = facet_counts(idx, queries, manual, "bucket").collect()
    key = lambda r: (r["query_id"], r["facet"], r["n_hits"], r["sum_rsv"],
                     r["max_rsv"], r["facet_rank"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert all(r["facet"] in {"lt_3", "3_5", "ge_5"} for r in got)
