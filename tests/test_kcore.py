"""k-core peeling and degree assortativity: exact parity with python
re-simulations plus textbook structural cases (clique core survives,
tree fully peels, star is maximally disassortative)."""

from jassv2_spark.operators.webgraph import assortativity, k_core


def _py_kcore(n_nodes, edges, k, rounds):
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    alive = set(range(1, n_nodes + 1))
    for _ in range(rounds):
        deg = {}
        for s, d in sym:
            if s in alive and d in alive:
                deg[s] = deg.get(s, 0) + 1
        alive = {v for v, c in deg.items() if c >= k}
    deg = {}
    for s, d in sym:
        if s in alive and d in alive:
            deg[s] = deg.get(s, 0) + 1
    return {v: deg.get(v, 0) for v in alive}


def _run(spark, n_nodes, edges, k=2, rounds=8):
    nodes = spark.createDataFrame([(i,) for i in range(1, n_nodes + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["doc_id"]: r["core_degree"]
        for r in k_core(nodes, e, k=k, rounds=rounds).collect()
    }


def test_kcore_clique_survives_tree_peels(spark):
    # 4-clique (1..4) plus a pendant path 4-5-6: the path peels off at
    # k=2 (leaf first, then its parent), the clique is the 3-core.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    assert _run(spark, 6, edges, k=2) == {1: 3, 2: 3, 3: 3, 4: 3}
    assert _run(spark, 6, edges, k=3) == {1: 3, 2: 3, 3: 3, 4: 3}
    assert _run(spark, 6, edges, k=4) == {}


def test_kcore_star_and_isolated_peel_immediately(spark):
    edges = [(1, i) for i in range(2, 7)]
    assert _run(spark, 8, edges, k=2) == {}  # star has no 2-core; 7,8 isolated


def test_kcore_preconvergence_round_parity(spark):
    # Long pendant chain into a triangle: each peel removes one chain
    # node, so small round counts are genuinely pre-convergence and
    # must still match the exact re-simulation.
    edges = [(1, 2), (2, 3), (3, 1)] + [(i, i + 1) for i in range(3, 10)]
    for rounds in (1, 2, 3, 10):
        assert _run(spark, 10, edges, k=2, rounds=rounds) == _py_kcore(
            10, edges, 2, rounds
        )


def _py_assort(edges):
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    m = len(sym)
    s_j = sum(deg[s] for s, _ in sym)
    s_jk = sum(deg[s] * deg[d] for s, d in sym)
    s_jj = sum(deg[s] * deg[s] for s, _ in sym)
    num, den = m * s_jk - s_j * s_j, m * s_jj - s_j * s_j
    import math

    return (m, s_j, s_jk, s_jj, 0 if den == 0 else math.floor(1e6 * num / den))


def test_assortativity_star_is_minus_one(spark):
    e = spark.createDataFrame([(1, i) for i in range(2, 8)], ["src", "dst"])
    row = assortativity(e).collect()[0]
    assert row["assortativity_micros"] == -1000000


def test_assortativity_regular_graph_degenerate(spark):
    # Cycle: every degree equal -> den == 0 -> defined as 0.
    e = spark.createDataFrame(
        [(i, i % 6 + 1) for i in range(1, 7)], ["src", "dst"]
    )
    assert assortativity(e).collect()[0]["assortativity_micros"] == 0


def test_assortativity_python_parity(spark):
    edges = [((i * 7 + 3) % 20 + 1, (i * 13 + 5) % 20 + 1) for i in range(40)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    row = assortativity(e).collect()[0]
    assert (
        row["m_edges"],
        row["s_j"],
        row["s_jk"],
        row["s_jj"],
        row["assortativity_micros"],
    ) == _py_assort(edges)
