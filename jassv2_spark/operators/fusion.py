"""Reciprocal-rank fusion (RRF): hybrid retrieval over heterogeneous runs.

Cormack, Clarke & Buettcher, SIGIR 2009: fused(d) = Σ_runs 1/(κ + rank_r(d)),
the standard way to combine a lexical (BM25 inverted-index) run with a
dense (embedding ANN) run — the hybrid-search pattern modern pipelines put
in front of both of this repo's serving families.

Exactness: the reciprocal sum is computed in EXACT integer arithmetic —
each contribution is scale // (κ + rank) with
scale = lcm(κ+1 .. κ+depth), so the per-(query, doc) aggregate is
associative and bitwise-reproducible at any parallelism and in any engine
(same trick as operators/evaluate.py's fixed-point metrics). For κ=60 and
depth ≤ 12 the scale fits int64 (lcm(61..72) ≈ 1e16); deeper fusions
fall back to float
(documented, loud in the return dtype).

Scale shape: each run arrives already top-k'd (tiny: n_queries × depth
rows); the fuse is a union + one (query, doc)-keyed partial-agg shuffle +
a per-query top-k window — negligible next to the runs themselves.

The reference engine is single-run (JASS_anytime emits one TREC run); rank
fusion is the training/serving-pipeline layer above it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_scale(kappa: int, depth: int) -> int | None:
    """lcm(κ+1 .. κ+depth), or None when it would overflow int64 (callers
    then fall back to float reciprocal sums)."""
    scale = math.lcm(*range(kappa + 1, kappa + depth + 1))
    return scale if scale * depth < 2**62 else None


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 10,
    kappa: int = 60,
    depth: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_id, doc_id, rrf, n_runs, rank): fuse ranked runs by RRF.

    Each input needs (query_col, doc_col, rank_col); rows with
    rank > depth are ignored (runs may be deeper than the fusion depth).
    `rrf` is the exact integer Σ scale//(κ+rank) when scale fits int64,
    else the float Σ 1/(κ+rank). Ties break by (rrf DESC, n_runs DESC,
    doc_id DESC) — doc-id-descending to match the engine's top-k heap
    convention.
    """
    scale = rrf_scale(kappa, depth)
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            F.col(rank_col).alias("rank"),
        ).where(F.col("rank") <= F.lit(int(depth)))
        for r in runs
    ]
    allruns = parts[0]
    for p in parts[1:]:
        allruns = allruns.unionByName(p)
    if scale is not None:
        # integer div: scale is divisible by every (κ+rank), so this is the
        # exact reciprocal scaled by lcm — no float ever enters the sum
        contrib = F.expr(f"cast({int(scale)} as bigint) div ({int(kappa)} + cast(rank as bigint))")
    else:
        contrib = F.lit(1.0) / (F.lit(float(kappa)) + F.col("rank").cast("double"))
    fused = (
        allruns.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("rrf"), F.count(F.lit(1)).cast("long").alias("n_runs"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("n_runs").desc(), F.col("doc_id").desc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "doc_id", "rrf", "n_runs", "rank")
    )


def combsum_fuse(
    runs: list[DataFrame],
    k: int = 10,
    depth: int = 10,
    norm_scale: int = 1_000_000,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_id, doc_id, combsum, n_runs, combmnz, rank): score-based
    fusion, CombSUM and CombMNZ (Fox & Shaw TREC-2 1994) — the other
    classic hybrid-retrieval combiner, preferred over RRF when run
    scores are calibrated enough to carry magnitude information.

    Each run's scores are min-max normalized PER QUERY to integer
    [0, norm_scale] via ONE fixed IEEE chain
    floor(norm_scale·(s−min)/(max−min)) (all-equal runs pin to
    norm_scale), after which everything is exact int64: CombSUM is the
    plain sum of normalized scores, CombMNZ multiplies by the number of
    runs that retrieved the document. Ties break (combmnz DESC,
    combsum DESC, doc_id DESC), doc-id-descending matching the engine's
    heap convention.

    Scale shape: runs arrive top-k'd (n_queries × depth rows); per run
    two window aggregates over run-sized frames, then one
    (query, doc)-keyed partial-agg shuffle + per-query top-k window.
    """
    parts = []
    for r in runs:
        w = Window.partitionBy("query_id")
        p = (
            r.select(
                F.col(query_col).alias("query_id"),
                F.col(doc_col).alias("doc_id"),
                F.col(score_col).cast("double").alias("s"),
                F.col(rank_col).alias("rank"),
            )
            .where(F.col("rank") <= F.lit(int(depth)))
            .select(
                "query_id",
                "doc_id",
                "s",
                F.min("s").over(w).alias("mn"),
                F.max("s").over(w).alias("mx"),
            )
            .select(
                "query_id",
                "doc_id",
                F.when(
                    F.col("mx") > F.col("mn"),
                    F.floor(
                        F.lit(float(norm_scale))
                        * (F.col("s") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                    ),
                )
                .otherwise(F.lit(int(norm_scale)))
                .cast("long")
                .alias("nrm"),
            )
        )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy("query_id", "doc_id")
        .agg(
            F.sum("nrm").cast("long").alias("combsum"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .withColumn("combmnz", (F.col("combsum") * F.col("n_runs")).cast("long"))
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("combmnz").desc(), F.col("combsum").desc(), F.col("doc_id").desc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= F.lit(int(k)))
        .select("query_id", "doc_id", "combsum", "n_runs", "combmnz", "rank")
    )
