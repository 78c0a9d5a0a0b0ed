"""TrustRank: exact integer re-simulation + trust-attenuation structure."""

from collections import Counter, defaultdict

from jassv2_spark.operators.webgraph import PR_SCALE, trustrank


def _py_trust(n_nodes, edges, seeds, iters=10, scale=PR_SCALE):
    base = 15 * scale // 100
    outd = Counter(s for s, d in edges)
    nodes = range(n_nodes)
    r = {v: base if v in seeds else 0 for v in nodes}
    for _ in range(iters):
        m = defaultdict(int)
        for s, d in edges:
            m[d] += r[s] // outd[s]
        r = {v: (base if v in seeds else 0) + 85 * m[v] // 100 for v in nodes}
    return r


def _run(spark, n_nodes, edges, seeds, iters=10):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(i,) for i in seeds], ["doc_id"])
    return {
        r["doc_id"]: r["trust"]
        for r in trustrank(nodes, e, s, iterations=iters).collect()
    }


def test_trustrank_matches_reference_simulation(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 2), (2, 4)]
    got = _run(spark, 5, edges, seeds={0})
    assert got == _py_trust(5, edges, {0})


def test_trust_attenuates_with_distance(spark):
    # chain 0 -> 1 -> 2 -> 3, seed at 0: trust strictly decays along it
    got = _run(spark, 4, [(0, 1), (1, 2), (2, 3)], seeds={0}, iters=8)
    assert got[0] > got[1] > got[2] > got[3] > 0


def test_unreachable_from_seeds_gets_zero(spark):
    got = _run(spark, 4, [(0, 1), (2, 3)], seeds={0}, iters=5)
    assert got[3] == 0 and got[2] == 0 and got[1] > 0


def test_spam_mass_flags_farm_not_core(spark):
    """A link farm pumping rank into node 5 with no path from the seed
    gets relative mass ~1e6 (all its rank is unexplained); pages fed by
    the seed stay low."""
    import math

    from jassv2_spark.operators.webgraph import pagerank, spam_mass

    # good cluster: 0 -> 1 -> 2 -> 0 (seed 0); farm: 3,4 -> 5, 5 -> 3
    edges = [(0, 1), (1, 2), (2, 0), (3, 5), (4, 5), (5, 3)]
    n = 6
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    s = spark.createDataFrame([(0,)], ["doc_id"])
    pr = pagerank(nodes, e, iterations=10)
    tr = trustrank(nodes, e, s, iterations=10)
    got = {r["doc_id"]: r for r in spam_mass(pr, tr).collect()}
    assert len(got) == n
    # farm nodes: zero trust -> rel mass exactly 1e6, flagged
    for v in (3, 4, 5):
        assert got[v]["trust"] == 0
        assert got[v]["rel_mass_micros"] == 1_000_000
        assert got[v]["spam_suspect"]
    # seeded cycle: trust share ~ rank share -> low/negative mass, unflagged
    for v in (0, 1, 2):
        assert not got[v]["spam_suspect"]

    # micros replicate the one fixed IEEE chain
    p_tot = sum(r["pr"] for r in got.values())
    t_tot = sum(r["trust"] for r in got.values())
    for v, r in got.items():
        want = math.floor(
            1e6 * (1.0 - (float(r["trust"]) * float(p_tot)) / (float(r["pr"]) * float(t_tot)))
        )
        assert r["rel_mass_micros"] == want, v
