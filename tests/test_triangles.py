"""Triangle census via degree-ordered orientation: hand goldens on known
graphs, direction/duplicate insensitivity, hub-safety of the formula."""

from jassv2_spark.operators.webgraph import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return triangle_stats(df).collect()[0]


def test_single_triangle(spark):
    r = _stats(spark, [(1, 2), (2, 3), (3, 1)])
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)
    assert r["n_wedges"] == 3          # each vertex has d=2 -> 3 * 1
    assert r["transitivity_ppm"] == 1000000  # 3*1/3


def test_k4_all_triangles(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    r = _stats(spark, edges)
    assert r["n_triangles"] == 4       # C(4,3)
    assert r["n_edges"] == 6
    assert r["n_wedges"] == 4 * 3      # d=3 each: 4 * 3
    assert r["transitivity_ppm"] == 1000000


def test_direction_duplicates_selfloops_ignored(spark):
    # same triangle expressed with reversed/duplicate edges and a self-loop
    r = _stats(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)])
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_star_has_no_triangles(spark):
    # hub with 5 leaves: many wedges, zero triangles
    r = _stats(spark, [(0, i) for i in range(1, 6)])
    assert r["n_triangles"] == 0
    assert r["n_wedges"] == 10         # hub d=5 -> 5*4/2
    assert r["transitivity_ppm"] == 0


def test_triangle_plus_tail(spark):
    # triangle 1-2-3 with a pendant 4 attached to 3
    r = _stats(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert r["n_triangles"] == 1
    # wedges: deg = [2,2,3,1] -> 1 + 1 + 3 + 0 = 5; transitivity 3/5
    assert r["n_wedges"] == 5
    assert r["transitivity_ppm"] == 600000
