"""Degree-distribution profile and reciprocity/dangling stats."""

from jassv2_spark.operators.webgraph import degree_profile, reciprocity_stats


def _frames(spark, n, edges):
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return nodes, e


def test_degree_profile_buckets(spark):
    # out-degrees: 1 -> 3 links (bucket 1), 2 -> 1 link (bucket 0),
    # 3,4 -> none (bucket -1). in-degrees: 2,3,4 get 1; 3 gets 2 total.
    nodes, e = _frames(spark, 4, [(1, 2), (1, 3), (1, 4), (2, 3)])
    got = {(r["direction"], r["bucket"]): r["n_nodes"]
           for r in degree_profile(nodes, e).collect()}
    assert got == {
        ("out", 1): 1, ("out", 0): 1, ("out", -1): 2,
        ("in", 0): 2,   # nodes 2 and 4: in-degree 1
        ("in", 1): 1,   # node 3: in-degree 2
        ("in", -1): 1,  # node 1: no in-links
    }


def test_degree_profile_dedups_and_drops_self_loops(spark):
    nodes, e = _frames(spark, 2, [(1, 2), (1, 2), (1, 1)])
    got = {(r["direction"], r["bucket"]): r["n_nodes"]
           for r in degree_profile(nodes, e).collect()}
    assert got[("out", 0)] == 1 and got[("out", -1)] == 1


def test_reciprocity_counts(spark):
    # 1<->2 mutual (2 reciprocal directed edges), 1->3 one-way;
    # 3 has no out-links -> dangling.
    nodes, e = _frames(spark, 3, [(1, 2), (2, 1), (1, 3)])
    row = reciprocity_stats(nodes, e).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_reciprocal"],
            row["n_dangling"]) == (3, 3, 2, 1)
    assert row["reciprocity_ppm"] == (10**6 * 2) // 3


def test_reciprocity_empty_edges(spark):
    nodes, e = _frames(spark, 2, [(1, 1)])  # self loop only -> dropped
    row = reciprocity_stats(nodes, e).collect()[0]
    assert (row["n_edges"], row["n_reciprocal"], row["reciprocity_ppm"],
            row["n_dangling"]) == (0, 0, 0, 2)
