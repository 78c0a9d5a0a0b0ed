"""Mergeable sketches (HyperLogLog, count-min, Bloom), engine-portable.

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


# --------------------------------------------------------------- count-min
#
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
# depth×width counter grid; row j counts occurrences under hash_j, a point
# query reads min_j grid[j][h_j(x)] — an overestimate, never an under-
# estimate. The 100 TB use: term/url frequency tables whose exact form is
# vocabulary-sized, kept instead as a fixed 4×width grid that is MERGEABLE
# across shards by cell-wise sum (linear sketch).
#
# Hash family, fully specified so any engine reproduces the grid:
#   h_j(x) = (32-bit md5 prefix of  j || ':' || x)  mod  width
# Building the grid is one explode(depth) map pass + a (group, row, bucket)
# partial-agg count — at most depth·width rows per group reach the shuffle.

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_grid(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(group..., row, bucket, cnt): the populated count-min cells per
    group (absent cells are zero). One partial-agg shuffle."""
    rows = df.select(
        *group_cols,
        F.col(value_col).cast("string").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    h = _h32(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_v")))
    return (
        rows.select(*group_cols, "row", (h % width).alias("bucket"))
        .groupBy(*group_cols, "row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*grids: DataFrame, group_cols: list[str]) -> DataFrame:
    """Sketch union: cell-wise sum across shards (count-min is linear)."""
    out = grids[0]
    for other in grids[1:]:
        out = out.unionByName(other)
    return out.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_point_query(
    grid: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(group..., <value_col>, est): min-over-rows point estimate for each
    probe value. The probe side is tiny → broadcast into the grid."""
    p = probes.select(
        *[c for c in group_cols if c in probes.columns],
        F.col(value_col).cast("string").alias(value_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    h = _h32(F.concat(F.col("row").cast("string"), F.lit(":"), F.col(value_col)))
    p = p.withColumn("bucket", h % width)
    # LEFT join from the probe side: an absent cell means count 0 for that
    # hash row, so the min naturally returns 0 — a probe never seen by the
    # sketch estimates 0 instead of disappearing. The grid is the bounded
    # sketch artifact (≤ depth·width·n_groups rows) → broadcast it.
    keys = [*[c for c in group_cols if c in p.columns], "row", "bucket"]
    joined = p.join(F.broadcast(grid), keys, "left")
    return (
        joined.groupBy(*[c for c in group_cols if c in p.columns], value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(
            *[c for c in group_cols if c in p.columns],
            value_col,
            F.col("est").cast("long").alias("est"),
        )
    )


# ------------------------------------------------------------------- Bloom
#
# Bloom filter (Bloom, CACM 1970) as k bit positions in an m-bit array,
# stored as 63-bit int64 words (the sign bit stays clear so `1 << b` is
# portable — DuckDB raises on a 64-bit overflow shift) built with a
# bitwise-OR aggregate — the
# shuffle carries at most (words-touched) rows, and filters from different
# shards merge by word-wise OR. The 100 TB use: membership prefilter for
# decontamination / URL-seen tests where the exact key set is corpus-sized.
#
#   bit_i(x) = (32-bit md5 prefix of  i || ';' || x)  mod  m,  i ∈ [0, k)

BLOOM_BITS = 4096
BLOOM_HASHES = 5
_WORD = 63  # usable bits per int64 word (sign bit never set)


def bloom_words(
    df: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(word_idx, word): the populated int64 words of the filter (absent
    words are zero). One (word_idx)-keyed partial-agg shuffle of ≤ m/63
    result rows."""
    rows = df.select(
        F.col(value_col).cast("string").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i"),
    )
    bit = (
        _h32(F.concat(F.col("i").cast("string"), F.lit(";"), F.col("_v"))) % m_bits
    )
    return (
        rows.select(bit.alias("bit"))
        .select(
            (F.col("bit") / _WORD).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), cast(bit % {_WORD} as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Filter union: word-wise OR across shards."""
    out = filters[0]
    for other in filters[1:]:
        out = out.unionByName(other)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_probe(
    words: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(<value_col>, maybe_present): true iff all k bits are set — no
    false negatives, bounded false positives. Probe side broadcast."""
    p = probes.select(
        F.col(value_col).cast("string").alias(value_col),
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("i"),
    )
    bit = (
        _h32(F.concat(F.col("i").cast("string"), F.lit(";"), F.col(value_col))) % m_bits
    )
    p = p.select(
        value_col,
        (bit / _WORD).cast("long").alias("word_idx"),
        (bit % _WORD).cast("int").alias("bit_in_word"),
    )
    # the filter itself is the bounded artifact (≤ m/63 words) → broadcast
    # it under the probe-side left join
    j = p.join(F.broadcast(words), "word_idx", "left")
    hit = (
        F.expr("(coalesce(word, 0) & shiftleft(cast(1 as bigint), bit_in_word)) != 0")
    )
    return (
        j.select(value_col, hit.alias("hit"))
        .groupBy(value_col)
        .agg((F.sum(F.col("hit").cast("int")) == k_hashes).alias("maybe_present"))
    )


# --------------------------------------------------------------------- KMV
# k-minimum-values distinct sketch (Bar-Yossef et al. 2002; the unbiased
# estimator form of Beyer et al., SIGMOD 2007): keep the k smallest
# distinct 32-bit hash values per group; with U = (kth smallest + 1) /
# 2^32 as the uniform-order-statistic estimate, D ≈ (k - 1) / U — here
# kept EXACT-INTEGER as (k - 1) · 2^32 div (kth + 1) (the +1 maps the
# hash range onto (0, 1] so a zero hash cannot divide by zero; both
# engines state the identical formula). Groups with fewer than k
# distinct hashes report their exact distinct-hash count instead (the
# sketch IS exact below k). Unlike HLL the sketch also supports set
# EXPRESSIONS (union = merge the hash lists and re-cut to k; the
# estimator is closed under it — kmv_merge below), which is why both
# live in this module.

KMV_K = 32
_KMV_SALTS = 64  # first-level cut fan-out (see kmv_hashes plan note)


def kmv_hashes(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """(group..., h, rn): the k smallest distinct hashes per group,
    rn = 1-based rank. Plan: the distinct-hash set is cut TWICE — first
    a (group, h mod 64)-keyed window keeps k per salt lane (64·k rows
    per group max, each lane's frame sorted independently — no single
    per-group sort of the full distinct set ever runs), then the final
    (group)-keyed window ranks ≤ 64·k rows. Both windows sort bounded
    frames; the one corpus-sized exchange is the distinct()."""
    from pyspark.sql import Window

    h = _h32(F.col(value_col).cast("string"))
    per = df.select(*group_cols, h.alias("h")).distinct()
    lane = Window.partitionBy(*group_cols, F.col("h") % _KMV_SALTS).orderBy("h")
    cut = (
        per.withColumn("__ln", F.row_number().over(lane))
        .where(F.col("__ln") <= k)
        .drop("__ln")
    )
    final = Window.partitionBy(*group_cols).orderBy("h")
    return (
        cut.withColumn("rn", F.row_number().over(final).cast("long"))
        .where(F.col("rn") <= k)
    )


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = KMV_K
) -> DataFrame:
    """(group..., n_kept, kth_hash, est_distinct): the KMV summary per
    group. est_distinct = (k-1)·2^32 div (kth_hash+1) when the group
    holds k hashes, else the exact kept count; kth_hash is NULL below k."""
    kept = kmv_hashes(df, group_cols, value_col, k)
    two32 = 1 << 32
    return kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).cast("long").alias("kth_hash"),
    ).select(
        *group_cols,
        "n_kept",
        "kth_hash",
        F.when(
            F.col("kth_hash").isNotNull(),
            F.expr(f"cast({(k - 1) * two32} as bigint) div (kth_hash + 1)"),
        )
        .otherwise(F.col("n_kept"))
        .cast("long")
        .alias("est_distinct"),
    )


def kmv_merge(
    *hash_dfs: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Sketch union: pool the per-shard hash lists, re-distinct, re-cut
    to the k smallest — identical to sketching the unioned input (the
    KMV closure property; pytest asserts the equality)."""
    pooled = hash_dfs[0].select(*group_cols, "h")
    for other in hash_dfs[1:]:
        pooled = pooled.unionByName(other.select(*group_cols, "h"))
    from pyspark.sql import Window

    final = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pooled.distinct()
        .withColumn("rn", F.row_number().over(final).cast("long"))
        .where(F.col("rn") <= k)
    )


def kmv_intersect(
    a_hashes: DataFrame,
    b_hashes: DataFrame,
    *,
    group_cols: list[str],
    k: int = KMV_K,
) -> DataFrame:
    """(group..., kth_union, est_union, n_both, est_intersection): set-
    INTERSECTION cardinality from two KMV sketches — the theta-sketch
    estimator (Dasgupta et al., the DataSketches lineage): cut the
    union of the two hash lists to its k smallest (= sketch of A∪B),
    estimate |A∪B| as usual, and inside that cut count the hashes
    present in BOTH inputs — n_both/k estimates the Jaccard, so

        est_intersection = n_both · est_union div |cut|   (exact ints;
        |cut| = min(k, |A∪B|) — dividing by the CUT size, not k, makes
        the below-k case collapse to the exact intersection count)

    This is what plain HLL cannot do without inclusion–exclusion error
    amplification, and the reason the KMV family earns its place next
    to it. Inputs are `kmv_hashes` outputs (per-shard artifacts);
    below-k unions are exact (est_union = count, kth NULL).

    Scale shape: the two k-row-per-group lists join/union by group —
    sketch-sized work, no corpus access at all."""
    ua = a_hashes.select(*group_cols, "h")
    ub = b_hashes.select(*group_cols, "h")
    both = ua.join(ub, [*group_cols, "h"]).select(
        *group_cols, "h", F.lit(True).alias("__both")
    )
    pooled = ua.unionByName(ub).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    cut = (
        pooled.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .join(both.select(*group_cols, "h", "__both"), [*group_cols, "h"], "left")
    )
    two32 = 1 << 32
    agg = cut.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).cast("long").alias("kth_union"),
        F.coalesce(F.sum(F.when(F.col("__both"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_both"),
    )
    est_union = (
        F.when(
            F.col("kth_union").isNotNull(),
            F.expr(f"cast({(k - 1) * two32} as bigint) div (kth_union + 1)"),
        )
        .otherwise(F.col("__n"))
        .cast("long")
    )
    return agg.select(
        *group_cols, "kth_union", est_union.alias("est_union"), "n_both", "__n"
    ).select(
        *group_cols,
        "kth_union",
        "est_union",
        "n_both",
        F.expr("n_both * est_union div __n").cast("long").alias("est_intersection"),
    )
