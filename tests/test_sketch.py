"""HyperLogLog sketch: registers vs a pure-Python oracle, the merge law,
estimator accuracy, duplicate idempotence."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.sketch import (
    HLL_M,
    hll_distinct,
    hll_estimate,
    hll_registers,
    merge_registers,
)


def _py_registers(values):
    regs = [0] * HLL_M
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, w = h % HLL_M, h >> 6
        rho = 27 - w.bit_length() if w else 27
        regs[b] = max(regs[b], rho)
    return regs


@pytest.fixture(scope="module")
def vals(spark):
    rows = [(("g1" if i % 3 else "g2"), f"value-{i}") for i in range(2000)]
    return spark.createDataFrame(rows, ["g", "v"])


def test_registers_match_python(spark, vals):
    got = {
        (r["g"], r["bucket"]): r["m_rho"]
        for r in hll_registers(vals, ["g"], "v").collect()
    }
    rows = [(g, v) for g, v in [(r["g"], r["v"]) for r in vals.collect()]]
    for g in ("g1", "g2"):
        want = _py_registers([v for gg, v in rows if gg == g])
        for b in range(HLL_M):
            assert got[(g, b)] == want[b], (g, b)


def test_merge_law_equals_union(spark, vals):
    lo = vals.where(F.col("v") < "value-1")  # lexicographic split
    hi = vals.where(~(F.col("v") < "value-1"))
    merged = merge_registers(
        hll_registers(lo, ["g"], "v"), hll_registers(hi, ["g"], "v"), group_cols=["g"]
    )
    whole = hll_registers(vals, ["g"], "v")
    canon = lambda df: sorted(map(tuple, df.select("g", "bucket", "m_rho").collect()))
    assert canon(merged) == canon(whole)
    e1 = sorted(map(tuple, hll_estimate(merged, ["g"]).collect()))
    e2 = sorted(map(tuple, hll_estimate(whole, ["g"]).collect()))
    assert e1 == e2


def test_duplicates_are_free(spark, vals):
    doubled = vals.unionByName(vals)
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(hll_distinct(doubled, ["g"], "v")) == canon(hll_distinct(vals, ["g"], "v"))


def test_estimate_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([("g", f"item-{i}") for i in range(n)], ["g", "v"])
    est = hll_distinct(df, ["g"], "v").collect()[0]["est"]
    assert abs(est - n) / n < 0.35  # raw HLL, m=64 → ~13% stddev


# ----------------------------------------------------------------- count-min


def _py_cms(values, depth=4, width=512):
    grid = {}
    for v in values:
        for j in range(depth):
            h = int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:8], 16)
            grid[(j, h % width)] = grid.get((j, h % width), 0) + 1
    return grid


def test_cms_grid_matches_python(spark, vals):
    from jassv2_spark.operators.sketch import cms_grid

    got = {
        (r["g"], r["row"], r["bucket"]): r["cnt"]
        for r in cms_grid(vals, ["g"], "v").collect()
    }
    rows = [(r["g"], r["v"]) for r in vals.collect()]
    for g in ("g1", "g2"):
        want = _py_cms([v for gg, v in rows if gg == g])
        assert {(g, j, b): c for (j, b), c in want.items()} == {
            k: v for k, v in got.items() if k[0] == g
        }


def test_cms_point_query_never_underestimates(spark):
    from jassv2_spark.operators.sketch import cms_grid, cms_point_query

    # heavy skew: value-0 appears 500x, the rest once
    rows = [("g", "value-0")] * 500 + [("g", f"value-{i}") for i in range(1, 300)]
    df = spark.createDataFrame(rows, ["g", "v"])
    grid = cms_grid(df, ["g"], "v")
    probes = spark.createDataFrame(
        [("g", "value-0"), ("g", "value-7"), ("g", "never-seen")], ["g", "v"]
    )
    est = {r["v"]: r["est"] for r in cms_point_query(grid, probes, ["g"], "v").collect()}
    assert est["value-0"] >= 500
    assert est["value-7"] >= 1
    assert est["never-seen"] >= 0
    # depth-4/width-512 on 800 items: overestimates stay tiny
    assert est["value-0"] <= 500 + 10 and est["value-7"] <= 11


def test_cms_merge_equals_whole(spark, vals):
    from jassv2_spark.operators.sketch import cms_grid, cms_merge

    lo = vals.where(F.col("v") < "value-1")
    hi = vals.where(~(F.col("v") < "value-1"))
    merged = cms_merge(
        cms_grid(lo, ["g"], "v"), cms_grid(hi, ["g"], "v"), group_cols=["g"]
    )
    canon = lambda df: sorted(map(tuple, df.select("g", "row", "bucket", "cnt").collect()))
    assert canon(merged) == canon(cms_grid(vals, ["g"], "v"))


# --------------------------------------------------------------------- Bloom


def _py_bloom_words(values, m=4096, k=5):
    words = {}
    for v in values:
        for i in range(k):
            bit = int(hashlib.md5(f"{i};{v}".encode()).hexdigest()[:8], 16) % m
            words[bit // 63] = words.get(bit // 63, 0) | (1 << (bit % 63))
    return words


def test_bloom_words_match_python(spark):
    from jassv2_spark.operators.sketch import bloom_words

    vs = [f"url-{i}" for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vs], ["v"])
    got = {r["word_idx"]: r["word"] for r in bloom_words(df, "v").collect()}
    assert got == _py_bloom_words(vs)


def test_bloom_no_false_negatives_and_merge(spark):
    from jassv2_spark.operators.sketch import bloom_merge, bloom_probe, bloom_words

    vs = [f"url-{i}" for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vs], ["v"])
    lo, hi = df.where(F.col("v") < "url-3"), df.where(~(F.col("v") < "url-3"))
    words = bloom_merge(bloom_words(lo, "v"), bloom_words(hi, "v"))
    canon = lambda d: sorted(map(tuple, d.collect()))
    assert canon(words) == canon(bloom_words(df, "v"))
    probes = spark.createDataFrame(
        [(v,) for v in vs[:50]] + [(f"absent-{i}",) for i in range(50)], ["v"]
    )
    got = {r["v"]: r["maybe_present"] for r in bloom_probe(words, probes, "v").collect()}
    assert all(got[v] for v in vs[:50])  # no false negatives, ever
    # m=4096/k=5/n=400 → fp rate ~2.6e-3; 50 absent probes: expect ~all false
    assert sum(got[f"absent-{i}"] for i in range(50)) <= 2


# ----------------------------------------------------------------- KMV

def _py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_kmv_matches_python_reference(spark):
    from jassv2_spark.operators.sketch import kmv_sketch

    vals = [f"v{i}" for i in range(200)]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    k = 16
    got = kmv_sketch(df, ["g"], "v", k=k).collect()[0]
    hs = sorted({_py_h32(v) for v in vals})[:k]
    assert got["n_kept"] == k
    assert got["kth_hash"] == hs[-1]
    assert got["est_distinct"] == (k - 1) * (1 << 32) // (hs[-1] + 1)


def test_kmv_exact_below_k(spark):
    from jassv2_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame([("g", f"v{i % 5}") for i in range(50)], ["g", "v"])
    got = kmv_sketch(df, ["g"], "v", k=16).collect()[0]
    assert got["n_kept"] == 5 and got["kth_hash"] is None
    assert got["est_distinct"] == 5  # exact below k; duplicates free


def test_kmv_union_closure(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the KMV closure
    law that makes per-shard sketches composable."""
    from jassv2_spark.operators.sketch import kmv_hashes, kmv_merge

    a = spark.createDataFrame([("g", f"a{i}") for i in range(120)], ["g", "v"])
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(60, 180)] + [("g", f"b{i}") for i in range(40)],
        ["g", "v"],
    )
    k = 16
    merged = kmv_merge(
        kmv_hashes(a, ["g"], "v", k), kmv_hashes(b, ["g"], "v", k), group_cols=["g"], k=k
    )
    whole = kmv_hashes(a.unionByName(b), ["g"], "v", k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_kmv_estimate_accuracy(spark):
    from jassv2_spark.operators.sketch import kmv_sketch

    n = 5000
    df = spark.createDataFrame([("g", f"item-{i}") for i in range(n)], ["g", "v"])
    est = kmv_sketch(df, ["g"], "v", k=64).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 0.35  # k=64 → ~12% std error; generous bound


def test_kmv_intersect_exact_below_k(spark):
    from jassv2_spark.operators.sketch import kmv_hashes, kmv_intersect

    a = spark.createDataFrame([("g", f"v{i}") for i in range(8)], ["g", "v"])
    b = spark.createDataFrame([("g", f"v{i}") for i in range(4, 12)], ["g", "v"])
    k = 64  # union (12) < k → everything exact
    out = kmv_intersect(
        kmv_hashes(a, ["g"], "v", k), kmv_hashes(b, ["g"], "v", k),
        group_cols=["g"], k=k,
    ).collect()[0]
    assert out["kth_union"] is None
    assert out["est_union"] == 12
    assert out["n_both"] == 4          # v4..v7
    assert out["est_intersection"] == 4  # below k the estimate is exact


def test_kmv_intersect_estimates_overlap(spark):
    from jassv2_spark.operators.sketch import kmv_hashes, kmv_intersect

    n, overlap, k = 4000, 2000, 128
    a = spark.createDataFrame([("g", f"a{i}") for i in range(n)], ["g", "v"])
    b = spark.createDataFrame(
        [("g", f"a{i}") for i in range(n - overlap, n)]
        + [("g", f"b{i}") for i in range(n - overlap)],
        ["g", "v"],
    )
    out = kmv_intersect(
        kmv_hashes(a, ["g"], "v", k), kmv_hashes(b, ["g"], "v", k),
        group_cols=["g"], k=k,
    ).collect()[0]
    # true union 6000, true intersection 2000; k=128 → ~9% rse on union,
    # wider on the intersection ratio; generous bounds
    assert abs(out["est_union"] - 6000) / 6000 < 0.4
    assert 500 < out["est_intersection"] < 5000
    # theta formula at full cut: n_both * est_union div k
    assert out["est_intersection"] == out["n_both"] * out["est_union"] // k
