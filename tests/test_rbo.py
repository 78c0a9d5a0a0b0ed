"""Rank-biased overlap: float-reference parity, identity/disjoint poles,
and the visibility convention shared with run_overlap."""

import math
from fractions import Fraction

from jassv2_spark.operators.evaluate import rbo_overlap


def _py_rbo_micros(ra, rb, k=10, p=Fraction(9, 10)):
    """Exact-rational truncated normalized RBO -> floor micros."""
    total = Fraction(0)
    for d in range(1, k + 1):
        xd = len(set(ra[:d]) & set(rb[:d]))
        total += (1 - p) * p ** (d - 1) * Fraction(xd, d)
    norm = total / (1 - p**k)
    return math.floor(norm * 10**6)


def _run(spark, qruns_a, qruns_b, k=10):
    rows_a = [(q, d, i + 1) for q, docs in qruns_a.items() for i, d in enumerate(docs)]
    rows_b = [(q, d, i + 1) for q, docs in qruns_b.items() for i, d in enumerate(docs)]
    a = spark.createDataFrame(rows_a, ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame(rows_b, ["query_id", "doc_id", "rank"])
    return {r["query_id"]: (r["n_common"], r["rbo_micros"])
            for r in rbo_overlap(a, b, k=k).collect()}


def test_rbo_identical_is_exactly_one(spark):
    run = {"q1": [5, 3, 8, 1, 9, 2, 7, 4, 6, 10]}
    assert _run(spark, run, run) == {"q1": (10, 1_000_000)}


def test_rbo_disjoint_is_zero(spark):
    got = _run(spark, {"q1": [1, 2, 3]}, {"q1": [4, 5, 6]})
    assert got == {"q1": (0, 0)}


def test_rbo_matches_exact_rational_reference(spark):
    a = {"q1": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
         "q2": [1, 2, 3],
         "q4": [7, 8]}
    b = {"q1": [2, 1, 3, 4, 5, 6, 7, 8, 9, 11],
         "q2": [3, 2, 1],
         "q3": [1]}
    got = _run(spark, a, b)
    for q in ("q1", "q2"):
        assert got[q][1] == _py_rbo_micros(a[q], b[q]), q
    # top-weightedness: swapping ranks 1/2 hurts more than a tail swap
    c = {"q1": [1, 2, 3, 4, 5, 6, 7, 8, 10, 9]}
    tail = _run(spark, {"q1": a["q1"]}, c)["q1"][1]
    assert got["q1"][1] < tail < 1_000_000
    # visibility: queries in either run emit a row, absent-common -> 0
    assert got["q4"] == (0, 0) and got["q3"] == (0, 0)


def test_rbo_depth_guard_raises(spark):
    import pytest
    a = spark.createDataFrame([("q1", 1, 1)], ["query_id", "doc_id", "rank"])
    with pytest.raises(ValueError):
        rbo_overlap(a, a, k=25)
