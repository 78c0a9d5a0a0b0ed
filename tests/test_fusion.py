"""RRF fusion semantics: exact integer contributions, union-of-runs
scoring, depth cut, overflow fallback (oracle parity for the hybrid entry
is covered by test_entry_parity)."""

from jassv2_spark.operators.fusion import rrf_fuse, rrf_scale


def _run(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "rank"])


def test_two_run_agreement_wins(spark):
    a = _run(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    b = _run(spark, [("q", 2, 1), ("q", 9, 2), ("q", 1, 3)])
    got = rrf_fuse([a, b], k=4).collect()
    by_rank = {r.rank: r for r in got}
    scale = rrf_scale(60, 10)
    # doc 2: ranks (2, 1); doc 1: ranks (1, 3) -> doc 2 wins
    assert by_rank[1].doc_id == 2
    assert by_rank[1].rrf == scale // 62 + scale // 61
    assert by_rank[1].n_runs == 2
    assert by_rank[2].doc_id == 1
    assert by_rank[2].rrf == scale // 61 + scale // 63
    # doc 9 appears in one run only
    assert {r.doc_id for r in got} == {1, 2, 3, 9}
    assert by_rank[4].n_runs == 1


def test_depth_cut_and_tiebreak(spark):
    a = _run(spark, [("q", 1, 1), ("q", 5, 11)])  # rank 11 > depth: ignored
    b = _run(spark, [("q", 2, 1)])
    got = rrf_fuse([a, b], k=10, depth=10).collect()
    assert {r.doc_id for r in got} == {1, 2}
    # equal rrf, equal n_runs -> higher doc_id first (engine heap convention)
    ranks = {r.doc_id: r.rank for r in got}
    assert ranks[2] == 1 and ranks[1] == 2


def test_overflow_falls_back_to_float(spark):
    assert rrf_scale(60, 10) is not None
    assert rrf_scale(60, 40) is None
    assert rrf_scale(1, 64) is None
    a = _run(spark, [("q", 1, 1), ("q", 2, 2)])
    got = rrf_fuse([a], k=2, kappa=1, depth=64).collect()
    assert abs({r.doc_id: r.rrf for r in got}[1] - 0.5) < 1e-12


def test_combsum_python_parity(spark):
    from jassv2_spark.operators.fusion import combsum_fuse

    run_a = [("q1", 1, 30, 1), ("q1", 2, 20, 2), ("q1", 3, 10, 3)]
    run_b = [("q1", 2, 0.9, 1), ("q1", 4, 0.5, 2), ("q1", 3, 0.1, 3)]
    cols = ["query_id", "doc_id", "score", "rank"]
    a = spark.createDataFrame(run_a, cols)
    b = spark.createDataFrame(run_b, cols)
    got = {
        (r["query_id"], r["doc_id"]): (r["combsum"], r["n_runs"], r["combmnz"], r["rank"])
        for r in combsum_fuse([a, b], k=10, depth=10).collect()
    }

    import math

    def norm(s, mn, mx):
        return int(math.floor(1e6 * (s - mn) / (mx - mn))) if mx > mn else 1000000

    exp = {}
    for q, d, s, _ in run_a:
        exp[(q, d)] = exp.get((q, d), 0) + norm(float(s), 10.0, 30.0)
    for q, d, s, _ in run_b:
        exp[(q, d)] = exp.get((q, d), 0) + norm(float(s), 0.1, 0.9)
    # doc 2 in both runs -> n_runs 2, MNZ doubles
    assert got[("q1", 2)] == (exp[("q1", 2)], 2, 2 * exp[("q1", 2)], 1)
    assert got[("q1", 1)][0] == 1000000 and got[("q1", 1)][1] == 1
    assert got[("q1", 3)][0] == exp[("q1", 3)]
    ranks = {d: got[("q1", d)][3] for d in (1, 2, 3, 4)}
    assert sorted(ranks.values()) == [1, 2, 3, 4]


def test_combsum_all_equal_scores_pin_to_scale(spark):
    from jassv2_spark.operators.fusion import combsum_fuse

    a = spark.createDataFrame(
        [("q1", 1, 5, 1), ("q1", 2, 5, 2)], ["query_id", "doc_id", "score", "rank"]
    )
    got = {r["doc_id"]: r["combsum"] for r in combsum_fuse([a], k=5, depth=5).collect()}
    assert got == {1: 1000000, 2: 1000000}
