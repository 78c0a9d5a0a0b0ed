"""run_overlap: agreement counts, one-sided queries, overlap_pct."""

import pytest

from jassv2_spark.operators.evaluate import run_overlap


@pytest.fixture(scope="module")
def runs(spark):
    a = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([10, 20, 30], 1)]
        + [("q2", d, r) for r, d in enumerate([5, 6], 1)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([30, 40, 10], 1)]
        + [("q3", 7, 1)],
        ["query_id", "doc_id", "rank"],
    )
    return a, b


def test_overlap_counts(spark, runs):
    a, b = runs
    rows = {r["query_id"]: r for r in run_overlap(a, b, k=10).collect()}
    r1 = rows["q1"]
    assert (r1["n_a"], r1["n_b"], r1["n_common"]) == (3, 3, 2)  # {10,30}
    assert r1["overlap_pct"] == 66  # floor(100*2/3)
    r2 = rows["q2"]  # only in run a
    assert (r2["n_a"], r2["n_b"], r2["n_common"], r2["overlap_pct"]) == (2, 0, 0, 0)
    r3 = rows["q3"]  # only in run b
    assert (r3["n_a"], r3["n_b"], r3["n_common"]) == (0, 1, 0)


def test_overlap_respects_k(spark, runs):
    a, b = runs
    rows = {r["query_id"]: r for r in run_overlap(a, b, k=1).collect()}
    # at k=1: a(q1)={10}, b(q1)={30} → no overlap
    assert rows["q1"]["n_common"] == 0 and rows["q1"]["n_a"] == 1


def test_identical_runs_full_overlap(spark, runs):
    a, _ = runs
    rows = run_overlap(a, a, k=10).collect()
    assert all(r["n_common"] == r["n_a"] == r["n_b"] for r in rows)
    assert all(r["overlap_pct"] == 100 for r in rows)
