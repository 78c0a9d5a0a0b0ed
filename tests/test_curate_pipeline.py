"""End-to-end curation pipeline: funnel accounting, corpus/report
consistency, and gate configurability (oracle parity for both entries is
covered by test_entry_parity)."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.curation import curate_corpus, curate_flags, curate_funnel

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_funnel_accounting_chains(spark, docs):
    rows = {r.stage: r for r in curate_funnel(docs).collect()}
    assert set(rows) == {"lang", "quality", "near_dup"}
    n0 = docs.count()
    assert rows["lang"].n_in == n0
    for prev, nxt in (("lang", "quality"), ("quality", "near_dup")):
        assert rows[prev].n_out == rows[nxt].n_in
    for r in rows.values():
        assert r.n_out == r.n_in - r.n_dropped
        assert r.n_dropped >= 0


def test_corpus_matches_funnel_tail(spark, docs):
    survivors = curate_corpus(docs)
    final = {r.stage: r.n_out for r in curate_funnel(docs).collect()}["near_dup"]
    assert survivors.count() == final
    # survivors keep the full input schema
    assert survivors.columns == docs.columns
    # every survivor passes both map-only gates
    flags = curate_flags(docs)
    bad = survivors.join(
        flags.where(~(F.col("lang_ok") & F.col("quality_ok"))), "doc_id"
    )
    assert bad.count() == 0


def test_gate_thresholds_configurable(spark, docs):
    strict = curate_flags(docs, min_words=90).where("quality_ok").count()
    loose = curate_flags(docs, min_words=1, min_stop_hits=0).where("quality_ok").count()
    assert strict < loose
    assert loose == docs.count()  # fully relaxed gate keeps everything


def test_language_gate_filters(spark):
    mixed = spark.createDataFrame(
        [(1, "the quick brown fox jumps with data and the table of values . " * 5),
         (2, "это русский текст " * 20)],
        ["doc_id", "text"],
    )
    flags = {r.doc_id: r.lang_ok for r in curate_flags(mixed).collect()}
    assert flags[1] is True
    assert flags[2] is False
