"""Harmonic centrality from the HyperBall profile: python re-simulation
parity and structural ordering."""

import math

from jassv2_spark.operators.webgraph import harmonic_centrality


def _py_harmonic(n_nodes, edges, radius=3):
    """Exact re-simulation: md5-HLL registers per ball, same est floor,
    same lcm fixed point."""
    import hashlib

    M, RHO = 64, 27

    def alpha(m):
        return 0.7213 / (1.0 + 1.079 / m)

    c6 = alpha(M) * float(M * M * (1 << RHO)) * 1e6
    edges = sorted(set((s, d) for s, d in edges if s != d))
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)

    def regs_of(ball):
        reg = [0] * M
        for v in ball:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
            b, rest = h % M, h // M
            rho = RHO if rest == 0 else RHO - rest.bit_length()
            reg[b] = max(reg[b], rho)
        return reg

    def est_m(ball):
        s = sum(1 << (RHO - m) for m in regs_of(ball))
        return math.floor(c6 / s)

    L = math.lcm(*range(1, radius + 1))
    res = {}
    for v in range(1, n_nodes + 1):
        ball = {v}
        prev = est_m(ball)
        total = 0
        for r in range(1, radius + 1):
            ball |= {d for u in ball for d in out.get(u, ())}
            cur = est_m(ball)
            total += (cur - prev) * (L // r)
            prev = cur
        res[v] = total // L
    return res


def _run(spark, n, edges, radius=3):
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {r["doc_id"]: r["harmonic_micros"]
            for r in harmonic_centrality(nodes, e, radius=radius).collect()}


def test_harmonic_matches_resimulation(spark):
    edges = [(1, 2), (2, 3), (3, 4), (1, 3), (4, 5), (5, 1)]
    assert _run(spark, 5, edges) == _py_harmonic(5, edges)


def test_harmonic_center_beats_leaf(spark):
    # star out-edges: hub 1 reaches everyone at r=1; leaves reach no one.
    got = _run(spark, 5, [(1, 2), (1, 3), (1, 4), (1, 5)])
    assert got[1] > got[2] and got[2] == got[3] == got[4] == got[5]


def test_harmonic_isolated_zero(spark):
    got = _run(spark, 3, [(1, 2)])
    assert got[3] == 0  # nothing reachable -> all deltas zero
