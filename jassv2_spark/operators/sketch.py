"""HyperLogLog distinct-count sketch, engine-portable and mergeable.

A 100 TB curation pipeline constantly needs cheap cardinalities —
distinct terms per language, distinct urls per host, vocabulary growth
across shards — where exact count(DISTINCT) would shuffle the full key
stream. Spark's built-in `approx_count_distinct` is an HLL++ whose
register layout is private to the JVM; this module implements the plain
HyperLogLog of Flajolet et al. (AofA 2007) from public knowledge with a
FULLY SPECIFIED hash→register mapping, so

  * any engine (DuckDB, Python, SQL) reproduces the registers bit-for-bit,
  * sketches are MERGEABLE (register-wise max) across shards/engines, and
  * the estimator is one float multiply + divide in a fixed order —
    bitwise-identical everywhere.

Register mapping (m = 64 buckets):
  h32    = first 8 hex chars of md5(value), as a 32-bit integer
  bucket = h32 mod 64                       (6 bits)
  w      = h32 div 64                       (26-bit window)
  rho    = 27 - bit_length(w)               (∈ [1, 27]; w = 0 → 27)
  M_j    = max rho over values in bucket j  (0 for an empty bucket)

Estimator kept exact-integer until the last step: each register
contributes inv_j = 2^(27 - M_j) (an INTEGER — the common-denominator
form of 2^-M_j), so sum_inv = Σ_j inv_j is an exact int64 and
  E = alpha_m · m² · 2^27 / sum_inv
is a single literal-times-division on doubles. No small/large-range
corrections are applied (raw estimator; documented bias below ~2.5·m
cardinality) — corrections need ln(), which is not portable in-engine.

max() is idempotent ⇒ no pre-distinct needed; the plan is a map pass +
one (group, bucket) partial-agg shuffle of ≤ 64·n_groups rows — the
whole point at scale. Scale note: `registers` IS the shard artifact;
persist per-shard registers and `merge_registers` them for cross-run
unions (the classic sketch-union pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 64            # registers (bucket bits = 6)
_WBITS = 26           # 32 - 6 bit window hashed into rho
_RHO_MAX = _WBITS + 1


def hll_alpha(m: int = HLL_M) -> float:
    """Flajolet's alpha_m bias constant (m ≥ 64 branch)."""
    return 0.7213 / (1.0 + 1.079 / m)


def _h32(col):
    # 32-bit md5 prefix — the repo's standard portable hash (same recipe
    # as the dedup/split operators; DuckDB: CAST('0x'||substr(md5(x),1,8)
    # AS UBIGINT)).
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group..., bucket, m_rho): the 64 HLL registers per group, empty
    buckets included (m_rho = 0). One partial-agg shuffle."""
    h = _h32(F.col(value_col).cast("string"))
    hashed = df.select(
        *group_cols,
        (h % HLL_M).alias("bucket"),
        F.shiftright(h, 6).cast("long").alias("w"),  # h div m, exact
    )
    rho = F.when(F.col("w") == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(F.col("w")))
    )
    per = hashed.select(*group_cols, "bucket", rho.alias("rho")).groupBy(
        *group_cols, "bucket"
    ).agg(F.max("rho").alias("m_rho"))
    groups = df.select(*group_cols).distinct()
    full = groups.select(
        *group_cols, F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("bucket")
    )
    return full.join(per, [*group_cols, "bucket"], "left").select(
        *group_cols, "bucket", F.coalesce(F.col("m_rho"), F.lit(0)).cast("long").alias("m_rho")
    )


def merge_registers(*register_dfs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sketch union: register-wise max across shards — the HLL merge law
    (max of maxes). Inputs must share the (group, bucket, m_rho) shape."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "bucket").agg(F.max("m_rho").alias("m_rho"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., sum_inv, est): the raw HLL estimate per group.
    sum_inv is the exact-integer Σ 2^(27 - M_j); est = C / sum_inv with
    C = alpha·m²·2^27 folded into ONE driver-computed literal so both
    engines perform the identical single IEEE division."""
    # shiftleft's bit count must be a column here → SQL expr form
    inv = F.expr(f"shiftleft(cast(1 as bigint), cast({_RHO_MAX} - m_rho as int))")
    s = registers.groupBy(*group_cols).agg(F.sum(inv).alias("sum_inv"))
    c = hll_alpha(HLL_M) * float(HLL_M * HLL_M * (1 << _RHO_MAX))
    return s.select(
        *group_cols,
        F.col("sum_inv").cast("long").alias("sum_inv"),
        (F.lit(c) / F.col("sum_inv").cast("double")).alias("est"),
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """One-call convenience: registers → estimate."""
    return hll_estimate(hll_registers(df, group_cols, value_col), group_cols)
