"""CIFF interchange: varint wire format, round-trip, ciff_to_JASS parity
(`tools/ciff_to_JASS.cpp`)."""

import pytest

from jassv2_spark.fixtures import ten_documents
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.sources.ciff import (
    _read_varint,
    _write_varint,
    build_index_from_ciff,
    read_ciff,
    write_ciff,
)


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1]:
        out = bytearray()
        _write_varint(out, v)
        got, pos = _read_varint(bytes(out), 0)
        assert got == v and pos == len(out)


@pytest.fixture(scope="module")
def ten_index(spark):
    rows = [(r["url"], r["html"].decode()) for r in ten_documents()]
    docs = spark.createDataFrame(rows, ["url", "html"])
    return build_index(docs, text_col="html", key_col="url", cache=False)


def test_ciff_roundtrip_tables(spark, ten_index, tmp_path):
    path = str(tmp_path / "ten.ciff")
    stats = write_ciff(ten_index, path)
    header, postings, doc_records = read_ciff(spark, path)

    assert header["num_docs"] == 10 == stats["num_docs"]
    assert header["num_postings_lists"] == stats["num_postings_lists"]
    assert header["total_terms_in_collection"] == ten_index.collection_length
    assert header["average_doclength"] == pytest.approx(ten_index.mean_doc_length)

    orig = sorted(
        (r["term"], r["doc_id"], r["tf"]) for r in ten_index.postings.collect()
    )
    back = sorted((r["term"], r["doc_id"], r["tf"]) for r in postings.collect())
    assert orig == back

    dl = {r["doc_id"]: r["doclength"] for r in doc_records.collect()}
    for r in ten_index.doc_lengths.collect():
        assert dl[r["doc_id"]] == r["dl"]


def test_ciff_import_builds_rank_identical_index(spark, ten_index, tmp_path):
    path = str(tmp_path / "ten.ciff")
    write_ciff(ten_index, path)
    imported = build_index_from_ciff(spark, path)

    q = spark.createDataFrame(
        [("q1", "ten one"), ("q2", "three"), ("q3", "two six ten")],
        ["query_id", "query"],
    )
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["rsv"])
        for r in search(ten_index, q, k=5, with_keys=False).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["rsv"])
        for r in search(imported, q, k=5, with_keys=False).collect()
    )
    assert a == b
    assert imported.n_docs == ten_index.n_docs
    assert imported.collection_length == ten_index.collection_length
    # same quantization bounds → same impacts
    assert (imported.min_rsv, imported.max_rsv) == (ten_index.min_rsv, ten_index.max_rsv)


def test_ciff_passthrough_prequantized(spark, tmp_path):
    """-passthrough: CIFF tf values become impacts directly
    (ciff_to_JASS.cpp:41-60)."""
    rows = [("d1", "alpha", 7), ("d1", "beta", 3), ("d2", "alpha", 5)]
    pre = spark.createDataFrame(rows, ["key", "term", "impact"])
    from jassv2_spark.operators.build import build_prequantized_index

    base = build_prequantized_index(pre, key_col="key")
    path = str(tmp_path / "pre.ciff")
    write_ciff(base, path)
    imported = build_index_from_ciff(spark, path, passthrough=True)

    segs = sorted(
        (r["term"], r["impact"], tuple(r["doc_ids"]))
        for r in imported.segments.collect()
    )
    base_segs = sorted(
        (r["term"], r["impact"], tuple(r["doc_ids"]))
        for r in base.segments.collect()
    )
    assert segs == base_segs
