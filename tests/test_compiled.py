"""Compiled index (serialise_ci analogue): the emitted standalone module
must reproduce the engine's top-k exactly, importing nothing but stdlib."""

import importlib.util
import sys

from jassv2_spark.fixtures import TEN_DOC_QUERIES, ten_documents
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.plans.compiled import compile_index


def test_compiled_index_matches_engine(spark, tmp_path):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs = spark.createDataFrame(rows, ["url", "html"])
    idx = build_index(docs, text_col="html", key_col="url")
    mod_path = compile_index(idx, str(tmp_path / "ci_index.py"))

    spec = importlib.util.spec_from_file_location("ci_index", mod_path)
    ci = importlib.util.module_from_spec(spec)
    assert "pyspark" not in open(mod_path).read()  # standalone: stdlib only
    spec.loader.exec_module(ci)

    qdf = spark.createDataFrame(TEN_DOC_QUERIES, ["query_id", "query"])
    want = {}
    for r in search(idx, qdf, k=10).collect():
        want.setdefault(r["query_id"], []).append((r["rank"], r["key"], r["rsv"]))
    for qid, qtext in TEN_DOC_QUERIES:
        got = [(i + 1, key, rsv) for i, (key, rsv) in enumerate(ci.search(qtext, k=10))]
        assert got == sorted(want.get(qid, [])), (qid, qtext)
    # ρ budget semantics survive compilation (stop-before-overflow)
    full = ci.search("one two three four five six seven eight nine ten", k=10)
    part = ci.search("one two three four five six seven eight nine ten", k=10, rho=0.3)
    assert part and len(part) <= len(full)
    idx.unpersist()


def test_compiled_index_size_guard(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    idx = build_index(
        spark.createDataFrame(rows, ["url", "html"]), text_col="html", key_col="url"
    )
    import pytest

    with pytest.raises(ValueError, match="small-index"):
        compile_index(idx, "/tmp/never.py", max_postings=3)
    idx.unpersist()
