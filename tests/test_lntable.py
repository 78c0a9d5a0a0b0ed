"""ln-table domain cap: past the cap the build falls back to in-engine ln
and still completes with near-identical results (round-2 verdict watch
item #3 — unbounded driver-side ln tables at 10^12-doc df domains)."""

import pytest

from jassv2_spark.fixtures import TEN_DOC_QUERIES, synthetic_corpus
from jassv2_spark.functions import lntable
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search


def _topk(spark, idx, k=10):
    qdf = spark.createDataFrame(TEN_DOC_QUERIES, ["query_id", "query"])
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], r["rsv"])
        for r in search(idx, qdf, k=k, with_keys=False).collect()
    }


def test_capped_distinct_probe_limits_collect(spark):
    df = spark.range(0, 1000).selectExpr("id % 7 as v")
    assert sorted(lntable.capped_distinct(df, "v", max_distinct=7)) == list(range(7))
    assert lntable.capped_distinct(df, "v", max_distinct=6) is None


def test_build_falls_back_past_cap_and_stays_rank_stable(spark, monkeypatch, caplog):
    rows = synthetic_corpus(200)
    docs = spark.createDataFrame(
        [(r["url"], r["html"].decode()) for r in rows], ["url", "html"]
    )
    idx_table = build_index(docs, text_col="html", key_col="url")
    want = _topk(spark, idx_table)

    monkeypatch.setattr(lntable, "DEFAULT_MAX_DISTINCT", 1)
    with caplog.at_level("WARNING", logger="jassv2_spark.lntable"):
        idx_fallback = build_index(docs, text_col="html", key_col="url")
        got = _topk(spark, idx_fallback)
    assert any("falling back" in r.message for r in caplog.records)

    # in-engine ln differs from the driver table by ≤1 ulp, which can move
    # a quantized impact by at most one bucket at a trunc boundary — ranks
    # and docids must agree, rsv within the 1-bucket tolerance per term
    assert set(want) == set(got)
    for key, (doc, rsv) in want.items():
        doc2, rsv2 = got[key]
        assert doc == doc2, key
        assert abs(rsv - rsv2) <= 8, (key, rsv, rsv2)
    idx_table.unpersist()
    idx_fallback.unpersist()
