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
