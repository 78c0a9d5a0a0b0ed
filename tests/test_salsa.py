"""SALSA (Lempel & Moran): exact re-simulation of the degree-normalized
integer half-step + fixed-IEEE max-norm semantics, plus the TKC
structural property the algorithm exists to provide."""

import math

from jassv2_spark.operators.webgraph import HITS_SCALE, salsa


def _py_salsa(n_nodes, edges, iters=10, scale=HITS_SCALE):
    """Reference semantics: int sums of v // degree; norm = floor(v/max*scale)."""
    edges = sorted(set((s, d) for s, d in edges if s != d))
    outd = {}
    ind = {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    hub = {v: scale for v in range(1, n_nodes + 1)}
    auth = {v: 0 for v in hub}

    def _norm(raw):
        mx = max(raw.values()) if raw else 0
        return {
            v: int(math.floor(raw.get(v, 0) / mx * float(scale))) if mx > 0 else 0
            for v in hub
        }

    for _ in range(iters):
        raw = {}
        for s, d in edges:
            raw[d] = raw.get(d, 0) + hub[s] // outd[s]
        auth = _norm(raw)
        raw = {}
        for s, d in edges:
            raw[s] = raw.get(s, 0) + auth[d] // ind[d]
        hub = _norm(raw)
    return hub, auth


def _run(spark, n_nodes, edges, iters=10):
    nodes = spark.createDataFrame([(i,) for i in range(1, n_nodes + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {r["doc_id"]: (r["hub"], r["auth"])
            for r in salsa(nodes, e, iterations=iters).collect()}


def test_salsa_matches_reference_simulation(spark):
    edges = [(1, 3), (2, 3), (3, 4), (4, 1), (2, 4), (5, 3)]
    got = _run(spark, 5, edges)
    hub, auth = _py_salsa(5, edges)
    assert got == {v: (hub[v], auth[v]) for v in hub}


def test_salsa_degree_normalization_beats_tkc(spark):
    # Tightly-knit community {1,2}->{3,4} (4 edges) vs a single popular
    # page: 5,6,7 all point at 8. Under HITS the TKC dominates; under
    # SALSA authority follows in-degree of the bipartite walk, so node 8
    # (in-degree 3, each contributor dedicating full hub mass) must be
    # the top authority.
    edges = [(1, 3), (1, 4), (2, 3), (2, 4), (5, 8), (6, 8), (7, 8)]
    got = _run(spark, 8, edges)
    hub, auth = _py_salsa(8, edges)
    assert got == {v: (hub[v], auth[v]) for v in hub}
    assert got[8][1] == HITS_SCALE
    assert got[8][1] > got[3][1] and got[8][1] > got[4][1]


def test_salsa_empty_graph(spark):
    got = _run(spark, 3, [(1, 1)])  # only a self-loop, which is dropped
    assert all(v == (0, 0) for v in got.values())
