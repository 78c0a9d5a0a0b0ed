"""ANF curve (corpus neighbourhood function) and effective-diameter readout."""

from jassv2_spark.operators.webgraph import anf_curve, effective_diameter_micros


def _run(spark, n, edges, radius=3):
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    return anf_curve(nodes, e, radius=radius).collect()


def test_anf_curve_monotone_and_normalized(spark):
    # 1 -> 2 -> 3 -> 4 chain: balls strictly grow with r.
    rows = _run(spark, 4, [(1, 2), (2, 3), (3, 4)], radius=3)
    byr = {r["r"]: (r["n_micros"], r["frac_ppm"]) for r in rows}
    assert sorted(byr) == [0, 1, 2, 3]
    assert byr[0][0] < byr[1][0] < byr[2][0] < byr[3][0]
    assert byr[3][1] == 1_000_000  # last radius is its own denominator
    assert all(byr[r][1] <= 1_000_000 for r in byr)


def test_anf_curve_disconnected_flat(spark):
    # no edges: N(r) constant, frac 1.0 everywhere.
    rows = _run(spark, 5, [(1, 1)], radius=2)
    fracs = {r["r"]: r["frac_ppm"] for r in rows}
    assert fracs == {0: 1_000_000, 1: 1_000_000, 2: 1_000_000}


def test_effective_diameter_interpolation():
    curve = [
        {"r": 0, "frac_ppm": 200_000},
        {"r": 1, "frac_ppm": 600_000},
        {"r": 2, "frac_ppm": 1_000_000},
    ]
    # crosses 0.9 between r=1 and r=2: 1 + (0.9-0.6)/(1.0-0.6) = 1.75
    assert effective_diameter_micros(curve) == 1_750_000
    # threshold already met at r=0
    assert effective_diameter_micros(curve, q_ppm=100_000) == 0
    # never crossed below cap
    assert effective_diameter_micros(curve[:2]) == 1_000_000
