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
