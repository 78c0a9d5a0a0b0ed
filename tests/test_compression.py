"""Codec round-trip property tests (mirrors tools/test_integer_compress.cpp
strategy: crafted boundaries + random sequences). Pure numpy — no Spark."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jassv2_spark.functions.compression import (
    QMX_BLOCK,
    compress_doc_ids,
    decompress_doc_ids,
    delta_decode,
    delta_encode,
    qmx_decode,
    qmx_encode,
    vbyte_decode,
    vbyte_encode,
)

CRAFTED = [
    [0],
    [1],
    [127],
    [128],
    [16383],
    [16384],
    [2**31 - 1],
    [2**32 - 1],
    list(range(1, 34)),
    [1] * QMX_BLOCK,
    [2**40, 2**48 - 1],
    list(range(1, QMX_BLOCK + 2)),
]


@pytest.mark.parametrize("seq", CRAFTED)
def test_vbyte_roundtrip_crafted(seq):
    a = np.asarray(seq, dtype=np.uint64)
    assert (vbyte_decode(vbyte_encode(a), len(a)) == a).all()


@pytest.mark.parametrize("seq", CRAFTED)
def test_qmx_roundtrip_crafted(seq):
    a = np.asarray(seq, dtype=np.uint64)
    assert (qmx_decode(qmx_encode(a)) == a).all()


@pytest.mark.parametrize("n", [1, 2, 31, 32, 33, 1000, 65536])
def test_docids_roundtrip_fixture_sizes(n):
    rng = np.random.default_rng(42)
    ids = np.sort(rng.choice(np.arange(1, 10_000_000, dtype=np.uint64), size=n, replace=False))
    for codec in ("vbyte", "qmx", "gamma"):
        got = decompress_doc_ids(compress_doc_ids(ids, codec), codec, n=n)
        assert (got == ids).all(), codec


@given(st.lists(st.integers(min_value=0, max_value=2**48 - 1), min_size=1, max_size=400))
@settings(max_examples=60, deadline=None)
def test_vbyte_roundtrip_property(xs):
    a = np.asarray(xs, dtype=np.uint64)
    assert (vbyte_decode(vbyte_encode(a), len(a)) == a).all()


@given(st.lists(st.integers(min_value=0, max_value=2**48 - 1), min_size=1, max_size=400))
@settings(max_examples=60, deadline=None)
def test_qmx_roundtrip_property(xs):
    a = np.asarray(xs, dtype=np.uint64)
    assert (qmx_decode(qmx_encode(a)) == a).all()


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=60, deadline=None)
def test_delta_docids_property(xs):
    ids = np.sort(np.asarray(xs, dtype=np.uint64))
    assert (delta_decode(delta_encode(ids)) == ids).all()
    for codec in ("vbyte", "qmx", "gamma"):
        got = decompress_doc_ids(compress_doc_ids(ids, codec), codec, n=len(ids))
        assert (got == ids).all(), codec


def test_vbyte_compression_ratio_on_small_gaps():
    ids = np.arange(1, 100_001, dtype=np.uint64)  # gaps of 1 → 1 byte each
    blob = compress_doc_ids(ids, "vbyte")
    assert len(blob) == 100_000  # 8x smaller than raw int64


@pytest.mark.parametrize("seq", [[0], [1], [0, 0, 0], [1, 2, 3, 4], [2**32 - 1, 2**40], list(range(300))])
def test_gamma_roundtrip_crafted(seq):
    from jassv2_spark.functions.compression import gamma_decode, gamma_encode

    a = np.asarray(seq, dtype=np.uint64)
    assert (gamma_decode(gamma_encode(a), len(a)) == a).all()


@given(st.lists(st.integers(min_value=0, max_value=2**50), max_size=200))
def test_gamma_roundtrip_property(xs):
    from jassv2_spark.functions.compression import gamma_decode, gamma_encode

    a = np.asarray(xs, dtype=np.uint64)
    assert (gamma_decode(gamma_encode(a), len(a)) == a).all()


def test_gamma_small_gaps_beat_vbyte():
    """Gamma's raison d'être: a gap of 1 (stored as v+1=2) costs 3 bits vs
    vbyte's 8 — dense postings compress far tighter."""
    from jassv2_spark.functions.compression import compress_doc_ids

    ids = np.arange(1, 5001, dtype=np.uint64)  # all-1 gaps
    assert len(compress_doc_ids(ids, "gamma")) < len(compress_doc_ids(ids, "vbyte")) / 2
