"""HITS hubs/authorities: exact re-simulation of the integer-sum +
fixed-IEEE-normalization semantics, plus structural sanity checks."""

import math

from jassv2_spark.operators.webgraph import HITS_SCALE, hits


def _py_hits(n_nodes, edges, iters=10, scale=HITS_SCALE):
    """Reference semantics: exact int sums; norm = floor(v/max*scale)."""
    edges = sorted(set((s, d) for s, d in edges if s != d))
    hub = {v: scale for v in range(1, n_nodes + 1)}
    auth = {v: 0 for v in hub}
    for _ in range(iters):
        raw = {v: 0 for v in hub}
        for s, d in edges:
            raw[d] += hub[s]
        mx = max(raw.values())
        auth = {v: int(math.floor(raw[v] / mx * float(scale))) if mx > 0 else 0
                for v in hub}
        raw = {v: 0 for v in hub}
        for s, d in edges:
            raw[s] += auth[d]
        mx = max(raw.values())
        hub = {v: int(math.floor(raw[v] / mx * float(scale))) if mx > 0 else 0
               for v in hub}
    return hub, auth


def _run(spark, n_nodes, edges, iters=10):
    nodes = spark.createDataFrame([(i,) for i in range(1, n_nodes + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {r["doc_id"]: (r["hub"], r["auth"])
            for r in hits(nodes, e, iterations=iters).collect()}


def test_hits_matches_reference_simulation(spark):
    edges = [(1, 3), (2, 3), (3, 4), (4, 1), (2, 4), (5, 3)]
    got = _run(spark, 5, edges)
    hub, auth = _py_hits(5, edges)
    assert got == {v: (hub[v], auth[v]) for v in hub}


def test_hits_structure(spark):
    # 1 and 2 both point at 3 and 4; 3, 4 point nowhere.
    got = _run(spark, 4, [(1, 3), (1, 4), (2, 3), (2, 4)])
    # perfect hubs: 1, 2 (equal, maximal); perfect authorities: 3, 4
    assert got[1][0] == got[2][0] == HITS_SCALE
    assert got[3][1] == got[4][1] == HITS_SCALE
    assert got[3][0] == got[4][0] == 0   # no out-links -> zero hub
    assert got[1][1] == got[2][1] == 0   # no in-links  -> zero auth


def test_hits_empty_graph(spark):
    got = _run(spark, 3, [(1, 1)])  # only a self-loop, which is dropped
    assert all(v == (0, 0) for v in got.values())
