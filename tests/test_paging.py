"""search_after cursor pagination: pages tile the full ranking exactly,
page-local ranks are 1..k, exhausted queries yield empty pages, and the
Engine facade routes through the same chain."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.fixtures import synthetic_corpus, synthetic_queries
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search, search_after


@pytest.fixture(scope="module")
def idx(spark):
    rows = synthetic_corpus(300)
    docs = spark.createDataFrame(
        [(r["url"], r["html"].decode()) for r in rows], ["url", "html"]
    )
    ix = build_index(docs, text_col="html", key_col="url")
    yield ix
    ix.unpersist()


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(synthetic_queries(6), ["query_id", "query"])


def _cursor_from(page):
    """(query_id, after_rsv, after_doc) = last row of the page."""
    w = F.max("rank").alias("last")
    last = page.groupBy("query_id").agg(w)
    return (
        page.join(last, "query_id")
        .where(F.col("rank") == F.col("last"))
        .select(
            "query_id",
            F.col("rsv").alias("after_rsv"),
            F.col("doc_id").alias("after_doc"),
        )
    )


def test_pages_tile_full_ranking(spark, idx, queries):
    k = 7
    full = search(idx, queries, k=3 * k, with_keys=False).collect()
    want = {}
    for r in sorted(full, key=lambda r: (r["query_id"], r["rank"])):
        want.setdefault(r["query_id"], []).append((r["doc_id"], r["rsv"]))

    p1 = search(idx, queries, k=k, with_keys=False)
    p2 = search_after(idx, queries, _cursor_from(p1), k=k, with_keys=False)
    p3 = search_after(idx, queries, _cursor_from(p2), k=k, with_keys=False)
    got = {}
    for pg in (p1, p2, p3):
        rows = pg.collect()
        ranks = {}
        for r in rows:
            ranks.setdefault(r["query_id"], []).append(r["rank"])
        for q, rs in ranks.items():
            assert sorted(rs) == list(range(1, len(rs) + 1)), "page-local ranks"
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            got.setdefault(r["query_id"], []).append((r["doc_id"], r["rsv"]))
    assert got == want


def test_exhausted_query_gets_empty_page(spark, idx):
    q = spark.createDataFrame([("qz", "zzznotaterm")], ["query_id", "query"])
    p1 = search(idx, q, k=5, with_keys=False)
    assert p1.count() == 0  # OOV: no hits at all, no cursor to build
    # a query whose full result set fits page one: cursor at the true end
    q2 = spark.createDataFrame(synthetic_queries(2), ["query_id", "query"])
    big = search(idx, q2, k=10_000, with_keys=False)
    p2 = search_after(idx, q2, _cursor_from(big), k=5, with_keys=False)
    assert p2.count() == 0


def test_engine_facade(spark, idx, queries):
    from jassv2_spark.engine import Engine

    eng = Engine(idx)
    p1 = eng.search(queries)
    p2 = eng.search_after(queries, _cursor_from(p1.drop("key")))
    rows = p2.collect()
    assert rows and all(r["rank"] >= 1 for r in rows)
    # no overlap with page one
    seen1 = {(r["query_id"], r["doc_id"]) for r in p1.collect()}
    assert all((r["query_id"], r["doc_id"]) not in seen1 for r in rows)
