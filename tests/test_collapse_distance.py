"""Host collapse (SERP site-dedup) and seed link-distance."""

from jassv2_spark.operators.webgraph import seed_distance
from jassv2_spark.operators.weburls import collapse_hits


def test_collapse_caps_hosts_and_backfills(spark):
    hits = spark.createDataFrame(
        [("q1", d, r) for d, r in
         [(1, 100), (2, 90), (3, 80), (4, 70), (5, 60), (6, 50)]],
        ["query_id", "doc_id", "rsv"],
    )
    hosts = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        ["doc_id", "host"],
    )
    out = {r["rank"]: (r["doc_id"], r["host"])
           for r in collapse_hits(hits, hosts, per_host=2, k=4).collect()}
    # doc 3 (host a, 3rd best of a) is dropped; doc 5 back-fills.
    assert out == {1: (1, "a"), 2: (2, "a"), 3: (4, "b"), 4: (5, "b")}


def test_collapse_tiebreak_higher_docid_first(spark):
    hits = spark.createDataFrame(
        [("q1", 1, 50), ("q1", 2, 50), ("q1", 3, 50)],
        ["query_id", "doc_id", "rsv"],
    )
    hosts = spark.createDataFrame([(i, "h") for i in (1, 2, 3)], ["doc_id", "host"])
    out = {r["rank"]: r["doc_id"]
           for r in collapse_hits(hits, hosts, per_host=2, k=10).collect()}
    assert out == {1: 3, 2: 2}  # equal rsv -> higher doc_id ranks first; cap 2


def _dist(spark, n, edges, seeds, hops=6):
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(x,) for x in seeds], ["doc_id"])
    return {r["doc_id"]: r["dist"]
            for r in seed_distance(nodes, e, s, max_hops=hops).collect()}


def test_seed_distance_bfs_levels(spark):
    # 1 -> 2 -> 3 -> 4; 5 isolated; seed {1}.
    got = _dist(spark, 5, [(1, 2), (2, 3), (3, 4)], [1])
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: -1}


def test_seed_distance_directed_and_multisource(spark):
    # Edges point INTO seed 1 only: nothing reachable except seeds.
    got = _dist(spark, 4, [(2, 1), (3, 1)], [1, 4])
    assert got == {1: 0, 2: -1, 3: -1, 4: 0}


def test_seed_distance_hop_cap(spark):
    got = _dist(spark, 5, [(1, 2), (2, 3), (3, 4), (4, 5)], [1], hops=2)
    assert got == {1: 0, 2: 1, 3: 2, 4: -1, 5: -1}


def test_url_features_shapes(spark):
    from jassv2_spark.operators.weburls import url_features

    urls = [
        ("https://example.org/web/00000123",),
        ("http://user@sub.site.com:8080/a/b/c?x=1&y=2&z=3#frag",),
        ("https://plain.io",),
        ("https://d.com/p1//p2/?",),
    ]
    rows = {r["url"]: r for r in url_features(
        spark.createDataFrame(urls, ["url"])).collect()}
    r1 = rows["https://example.org/web/00000123"]
    assert (r1["host"], r1["path_depth"], r1["n_params"], r1["is_https"]) == (
        "example.org", 2, 0, True)
    assert r1["digit_ppm"] == (1_000_000 * 8) // len(urls[0][0])
    r2 = rows["http://user@sub.site.com:8080/a/b/c?x=1&y=2&z=3#frag"]
    assert (r2["host"], r2["path_depth"], r2["n_params"], r2["is_https"]) == (
        "sub.site.com", 3, 3, False)
    r3 = rows["https://plain.io"]
    assert (r3["host"], r3["path_depth"], r3["n_params"], r3["digit_ppm"]) == (
        "plain.io", 0, 0, 0)
    r4 = rows["https://d.com/p1//p2/?"]
    assert (r4["path_depth"], r4["n_params"]) == (2, 0)  # empty segs/query drop
