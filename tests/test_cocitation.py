"""Co-citation / bibliographic coupling: brute-force re-count plus the
hot-node cap semantics."""

from collections import Counter
from itertools import combinations

from jassv2_spark.operators.webgraph import cocitation_pairs, coupling_pairs

EDGES = [(1, 3), (1, 4), (2, 3), (2, 4), (2, 5), (5, 3), (5, 4), (4, 4)]


def _brute(edges, *, transpose=False, cap=64, min_count=1):
    e = sorted(set((s, d) for s, d in edges if s != d))
    if transpose:
        e = [(d, s) for s, d in e]
    out = {}
    for s, d in e:
        out.setdefault(s, []).append(d)
    c = Counter()
    for s, ds in out.items():
        if len(ds) > cap:
            continue
        for a, b in combinations(sorted(ds), 2):
            c[(a, b)] += 1
    return {(a, b, n) for (a, b), n in c.items() if n >= min_count}


def _collect(df):
    return {tuple(r) for r in df.collect()}


def test_cocitation_counts(spark):
    links = spark.createDataFrame(EDGES, ["src", "dst"])
    assert _collect(cocitation_pairs(links)) == _brute(EDGES)


def test_coupling_counts(spark):
    links = spark.createDataFrame(EDGES, ["src", "dst"])
    assert _collect(coupling_pairs(links)) == _brute(EDGES, transpose=True)


def test_cocitation_min_count_and_cap(spark):
    links = spark.createDataFrame(EDGES, ["src", "dst"])
    assert _collect(cocitation_pairs(links, min_count=3)) == _brute(
        EDGES, min_count=3
    )
    # cap=2 drops source 2 (out-degree 3) entirely
    assert _collect(cocitation_pairs(links, max_outd=2)) == _brute(EDGES, cap=2)
