"""HyperBall: exact register-level re-simulation (md5 HLL + max-merge
BFS) and a ball-growth structure check."""

import hashlib

from jassv2_spark.operators.webgraph import hyperball

M, RHO_MAX = 64, 27


def _h32(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)


def _registers(ids):
    reg = [0] * M
    for v in ids:
        h = _h32(v)
        b, w = h % M, h >> 6
        rho = RHO_MAX if w == 0 else RHO_MAX - w.bit_length()
        reg[b] = max(reg[b], rho)
    return reg


def _py_hyperball(n_nodes, edges, radius):
    out = {v: set() for v in range(n_nodes)}
    for s, d in set(edges):
        if s != d:
            out[s].add(d)
    balls = {v: {v} for v in range(n_nodes)}
    for _ in range(radius):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in out[v]), set())
            if out[v]
            else balls[v]
            for v in range(n_nodes)
        }
    return {v: sum(1 << (RHO_MAX - r) for r in _registers(b)) for v, b in balls.items()}


def _run(spark, n_nodes, edges, radius):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["doc_id"]: r["sum_inv"]
        for r in hyperball(nodes, e, radius=radius).collect()
    }


def test_hyperball_matches_exact_ball_registers(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 2), (4, 0), (2, 0)]
    assert _run(spark, 5, edges, radius=2) == _py_hyperball(5, edges, 2)


def test_hyperball_radius_zero_is_singleton(spark):
    got = _run(spark, 3, [(0, 1), (1, 2)], radius=0)
    assert got == _py_hyperball(3, [(0, 1), (1, 2)], 0)


def test_ball_grows_along_a_chain(spark):
    # 0 -> 1 -> 2 -> 3: with radius 3 node 0 sees everything, node 3 itself
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, 4, edges, radius=3)
    want = _py_hyperball(4, edges, 3)
    assert got == want
    # sum_inv strictly decreases as the ball grows (more registers set)
    assert got[0] < got[3]


def test_hyperball_profile_matches_per_radius(spark):
    from jassv2_spark.operators.webgraph import hyperball_profile

    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    nodes = spark.createDataFrame([(i,) for i in range(4)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["doc_id"], r["r"]): r["sum_inv"]
        for r in hyperball_profile(nodes, e, radius=2).collect()
    }
    for rad in range(3):
        want = _py_hyperball(4, edges, rad)
        for v, s in want.items():
            assert got[(v, rad)] == s, (v, rad)
