"""Connected components: exact union-find ground truth, pre-convergence
round-parity with the python re-simulation, and structural checks."""

from jassv2_spark.operators.webgraph import connected_components


def _true_cc(n_nodes, edges):
    """Ground truth via union-find; component id = min member id."""
    parent = {v: v for v in range(1, n_nodes + 1)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        if s != d:
            a, b = find(s), find(d)
            if a != b:
                parent[max(a, b)] = min(a, b)
    return {v: find(v) for v in parent}


def _py_rounds(n_nodes, edges, rounds):
    """Re-simulate the operator's exact per-round semantics."""
    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    lab = {v: v for v in range(1, n_nodes + 1)}
    for _ in range(rounds):
        m = dict(lab)
        for u, v in sym:
            m[u] = min(m[u], lab[v])
        lab = {v: min(m[v], m[m[v]]) for v in m}
    return lab


def _run(spark, n_nodes, edges, rounds=10):
    nodes = spark.createDataFrame([(i,) for i in range(1, n_nodes + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return {r["doc_id"]: r["component"]
            for r in connected_components(nodes, e, rounds=rounds).collect()}


def test_components_two_islands_and_singleton(spark):
    edges = [(1, 2), (2, 3), (4, 5), (5, 4), (6, 6)]
    got = _run(spark, 6, edges)
    assert got == _true_cc(6, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_components_chain_converges_by_pointer_jumping(spark):
    # A 40-node path needs radius 39; plain hash-min would need 39
    # rounds, pointer jumping covers it in 6 (2^6 - 1 ≥ 39).
    edges = [(i, i + 1) for i in range(1, 40)]
    got = _run(spark, 40, edges, rounds=6)
    assert set(got.values()) == {1}
    assert got == _true_cc(40, edges)


def test_components_preconvergence_round_parity(spark):
    # At rounds=1 the chain is NOT converged; the distributed result
    # must still equal the exact per-round re-simulation bit-for-bit.
    edges = [(i, i + 1) for i in range(1, 20)]
    got = _run(spark, 20, edges, rounds=1)
    assert got == _py_rounds(20, edges, 1)
    assert len(set(got.values())) > 1  # genuinely pre-convergence


def test_components_direction_ignored(spark):
    got = _run(spark, 4, [(2, 1), (3, 2), (4, 3)], rounds=4)
    assert set(got.values()) == {1}


def test_host_graph_weights_and_self_drop(spark):
    from jassv2_spark.operators.webgraph import host_graph

    links = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 2), (4, 3), (1, 4), (2, 1)],
        ["src", "dst"],
    )
    hosts = spark.createDataFrame(
        [(1, "a"), (4, "a"), (2, "b"), (3, "b")], ["doc_id", "host"]
    )
    out = {(r["src_host"], r["dst_host"]): r for r in host_graph(links, hosts).collect()}
    # a→b: edges 1→2, 1→3, 4→2, 4→3 = 4 links from 2 distinct pages
    assert out[("a", "b")]["n_links"] == 4
    assert out[("a", "b")]["n_src_pages"] == 2
    # b→a: 2→1 only
    assert out[("b", "a")]["n_links"] == 1
    # intra-host 1→4 dropped
    assert ("a", "a") not in out


def test_host_graph_keep_self(spark):
    from jassv2_spark.operators.webgraph import host_graph

    links = spark.createDataFrame([(1, 4)], ["src", "dst"])
    hosts = spark.createDataFrame([(1, "a"), (4, "a")], ["doc_id", "host"])
    assert host_graph(links, hosts, keep_self=True).count() == 1


def test_weighted_pagerank_reduces_to_unweighted_on_unit_weights(spark):
    from pyspark.sql import functions as F

    from jassv2_spark.operators.webgraph import pagerank, pagerank_weighted

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    plain = {r["doc_id"]: r["pr"] for r in pagerank(
        nodes, edges, iterations=4
    ).collect()}
    weighted = {r["node"]: r["pr"] for r in pagerank_weighted(
        nodes.select(F.col("doc_id").alias("node")),
        edges.withColumn("weight", F.lit(1)),
        iterations=4,
    ).collect()}
    assert plain == weighted


def test_weighted_pagerank_weight_shifts_mass(spark):
    from jassv2_spark.operators.webgraph import pagerank_weighted

    # 1 links to 2 (weight 9) and 3 (weight 1): 2 must outrank 3
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["node"])
    edges = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        ["src", "dst", "weight"],
    )
    pr = {r["node"]: r["pr"] for r in pagerank_weighted(
        nodes, edges, iterations=6
    ).collect()}
    assert pr["b"] > pr["c"]
