"""Checkpoint/resume + lineage tests (north_rule resumability)."""

import json
import os

import pytest

from jassv2_spark.fixtures import synthetic_corpus, synthetic_queries
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.plans.persist import (
    STAGES,
    build_index_persisted,
    build_metrics,
    lineage,
    load_index_tables,
    stage_done,
)


@pytest.fixture()
def docs(spark):
    rows = synthetic_corpus(150)
    return spark.createDataFrame([(r["url"], r["text"]) for r in rows], ["url", "text"])


def _results(idx, spark, queries):
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["rsv"])
        for r in search(idx, qdf, k=10, with_keys=False).collect()
    )


def test_persisted_build_equals_in_memory(spark, docs, tmp_path):
    out = str(tmp_path / "idx")
    idx_p = build_index_persisted(docs, out, text_col="text", key_col="url")
    idx_m = build_index(docs, text_col="text", key_col="url", cache=False)
    queries = synthetic_queries(8)
    assert _results(idx_p, spark, queries) == _results(idx_m, spark, queries)
    assert idx_p.n_docs == idx_m.n_docs
    assert (idx_p.min_rsv, idx_p.max_rsv) == (idx_m.min_rsv, idx_m.max_rsv)


@pytest.mark.parametrize("fail_stage", ["counts", "stats", "impacts", "segments"])
def test_resume_after_injected_failure(spark, docs, tmp_path, fail_stage):
    out = str(tmp_path / f"idx_{fail_stage}")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_persisted(docs, out, text_col="text", key_col="url", fail_after=fail_stage)
    # stages up to and including fail_stage are checkpointed
    assert stage_done(out, fail_stage)
    later = STAGES[STAGES.index(fail_stage) + 1 :]
    assert not any(stage_done(out, s) for s in later)

    # resume: completed stages must NOT be rewritten
    before = {
        s: os.path.getmtime(os.path.join(out, "_checkpoints", f"{s}.json"))
        for s in STAGES
        if stage_done(out, s)
    }
    idx = build_index_persisted(docs, out, text_col="text", key_col="url")
    after = build_metrics(out)
    for s, mtime in before.items():
        assert os.path.getmtime(os.path.join(out, "_checkpoints", f"{s}.json")) == mtime, s
    assert all(after[s]["complete"] for s in STAGES)

    # and the resumed index answers queries identically to a clean build
    idx_m = build_index(docs, text_col="text", key_col="url", cache=False)
    queries = synthetic_queries(5)
    assert _results(idx, spark, queries) == _results(idx_m, spark, queries)


def test_lineage_rows_cover_stage(spark, docs, tmp_path):
    out = str(tmp_path / "idx_lineage")
    build_index_persisted(docs, out, text_col="text", key_col="url")
    counts_rows = spark.read.parquet(os.path.join(out, "counts")).count()
    lin = lineage(spark, out, "counts")
    assert lin.groupBy().sum("rows").collect()[0][0] == counts_rows
    m = build_metrics(out)
    assert m["counts"]["rows"] == counts_rows
    assert all(m[s]["wall_sec"] >= 0 for s in m)


def test_load_index_tables_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "idx_load")
    build_index_persisted(docs, out, text_col="text", key_col="url")
    idx = load_index_tables(spark, out)
    queries = synthetic_queries(5)
    idx_m = build_index(docs, text_col="text", key_col="url", cache=False)
    assert _results(idx, spark, queries) == _results(idx_m, spark, queries)
    # term-bucket partition pruning is available on disk
    assert "term_bucket" in idx.segments.columns

    # ...and the serve plan actually uses it: the segment FileScan carries a
    # term_bucket partition filter, so a query reads only its terms' buckets
    # (the Spark replacement for the reference's CIvocab binary search,
    # `source/deserialised_jass_v1.h:311-334`)
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    plan = search(idx, qdf, k=3, with_keys=False)._jdf.queryExecution().executedPlan().toString()
    import re

    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("term_bucket" in f and "IN" in f for f in filters), filters


def test_compressed_segment_store_roundtrip(spark, tmp_path):
    import pytest

    from jassv2_spark.fixtures import synthetic_corpus, synthetic_queries
    from jassv2_spark.operators.build import build_index
    from jassv2_spark.operators.search import search
    from jassv2_spark.plans.persist import load_index_tables, save_index_tables

    rows = synthetic_corpus(120)
    docs = spark.createDataFrame([(r["url"], r["html"].decode()) for r in rows], ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    qdf = spark.createDataFrame(synthetic_queries(10), ["query_id", "query"])
    want = sorted(map(tuple, search(idx, qdf, k=10, with_keys=False).collect()))

    for codec in ("vbyte", "qmx", "gamma"):
        out = str(tmp_path / f"ix_{codec}")
        save_index_tables(idx, out, codec=codec)
        loaded = load_index_tables(spark, out)
        assert "doc_ids" in loaded.segments.columns
        got = sorted(map(tuple, search(loaded, qdf, k=10, with_keys=False).collect()))
        assert got == want, codec
    idx.unpersist()
