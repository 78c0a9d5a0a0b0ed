"""Run-level evaluation tooling: pooling, Kendall tau, paired test."""

import math

from jassv2_spark.operators.evaluate import (
    kendall_tau,
    paired_run_test,
    pool_runs,
    rsv_mass,
)


def _run(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rsv", "rank"])


def test_pool_runs_union_and_best_rank(spark):
    a = _run(spark, [("q1", 1, 30, 1), ("q1", 2, 20, 2), ("q1", 3, 10, 3)])
    b = _run(spark, [("q1", 2, 18, 1), ("q1", 4, 9, 2), ("q1", 9, 1, 9)])
    got = {r["doc_id"]: r for r in pool_runs([a, b], depth=2).collect()}
    # depth=2 keeps a:{1,2} b:{2,4}; doc 3 (rank 3) and doc 9 (rank 9) cut
    assert set(got) == {1, 2, 4}
    assert got[2]["n_runs"] == 2 and got[2]["best_rank"] == 1
    assert got[1]["n_runs"] == 1 and got[1]["best_rank"] == 1
    assert got[4]["n_runs"] == 1 and got[4]["best_rank"] == 2


def test_kendall_tau_hand_checked(spark):
    # common docs {1,2,3}; a orders 1,2,3 — b orders 3,1,2
    a = _run(spark, [("q1", 1, 30, 1), ("q1", 2, 20, 2), ("q1", 3, 10, 3)])
    b = _run(spark, [("q1", 3, 30, 1), ("q1", 1, 20, 2), ("q1", 2, 10, 3)])
    (r,) = kendall_tau(a, b, k=10).collect()
    # pairs: (1,2) concordant, (1,3) discordant, (2,3) discordant
    assert (r["concordant"], r["discordant"]) == (1, 2)
    assert r["tau_micros"] == math.floor(1e6 * (2.0 * 1 - 3) / 3.0)
    # identical rankings -> tau exactly 1
    (r2,) = kendall_tau(a, a, k=10).collect()
    assert r2["tau_micros"] == 1_000_000 and r2["discordant"] == 0


def test_kendall_tau_skips_single_common_doc(spark):
    a = _run(spark, [("q1", 1, 30, 1), ("q1", 2, 20, 2)])
    b = _run(spark, [("q1", 1, 30, 1), ("q1", 9, 20, 2)])
    assert kendall_tau(a, b, k=10).count() == 0  # one common doc, no pairs


def test_paired_run_test_moments_and_t(spark):
    a = _run(
        spark,
        [("q1", 1, 10, 1), ("q2", 1, 20, 1), ("q3", 1, 15, 1)],
    )
    b = _run(
        spark,
        [("q1", 1, 8, 1), ("q2", 1, 20, 1), ("q3", 1, 10, 1)],
    )
    (r,) = paired_run_test(rsv_mass(a, k=10), rsv_mass(b, k=10)).collect()
    # deltas: 2, 0, 5
    assert (r["n"], r["wins_a"], r["wins_b"], r["ties"]) == (3, 2, 0, 1)
    assert (r["sum_delta"], r["sum_delta2"]) == (7, 29)
    want = math.floor(
        1e6 * ((7.0 / 3.0) / math.sqrt((29.0 - 7.0 * 7.0 / 3.0) / 2.0 / 3.0))
    )
    assert r["t_micros"] == want


def test_paired_run_test_zero_variance_is_null(spark):
    a = _run(spark, [("q1", 1, 10, 1), ("q2", 1, 20, 1)])
    (r,) = paired_run_test(rsv_mass(a), rsv_mass(a)).collect()
    assert r["ties"] == 2 and r["t_micros"] is None
