"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force cosine top-k — the exact baseline. Pure JVM
  column expressions (transform/zip_with/aggregate): no Python in the loop,
  broadcast of the (small) query side, single pass over the corpus.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH signatures
  bucket the corpus; candidates = vectors sharing a bucket with the query;
  exact cosine re-rank within candidates only. Recall/cost tunable via
  (n_planes, n_tables). At 10^12 rows the bucket join replaces the cross
  join; planes are a tiny broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 4,
) -> DataFrame:
    """(qid, vec_id, cos, rank): exact cosine top-k of every corpus vector
    against each query vector (queries broadcast; corpus scanned once)."""
    e = embeddings.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("ve"))
    q = e.where(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("qid"), F.col("ve").alias("qe")
    )
    pairs = e.crossJoin(F.broadcast(q))
    cos = _dot("qe", "ve") / (F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ve", "ve")))
    scored = pairs.select("qid", "vec_id", cos.alias("cos"))
    if round_dp is not None:
        scored = scored.withColumn("cos", F.round("cos", round_dp))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(k))
        .select("qid", "vec_id", "cos", "rank")
    )


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table_idx, bucket): random-hyperplane signatures. The plane
    matrix is derived deterministically from `seed` and broadcast as a SQL
    literal (tiny: n_tables × n_planes × dim doubles)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    e = embeddings.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("ve"))
    rows = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            arr = "array(" + ",".join(repr(float(x)) + "D" for x in planes[t, p]) + ")"
            dot = f"aggregate(zip_with(ve, {arr}, (x, y) -> x * y), cast(0.0 as double), (a, v) -> a + v)"
            bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
        rows.append(F.struct(F.lit(t).alias("table_idx"), F.expr("concat(" + ",".join(bits) + ")").alias("bucket")))
    return e.select("vec_id", F.explode(F.array(*rows)).alias("s")).select(
        "vec_id", F.col("s.table_idx").alias("table_idx"), F.col("s.bucket").alias("bucket")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates from LSH bucket collisions
    (any table), exact re-rank. Same output schema as cosine_topk."""
    dim = len(embeddings.select(vec_col).first()[0])
    sigs = lsh_signatures(embeddings, dim, n_planes, n_tables, seed, id_col, vec_col)
    qsig = sigs.where(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("qid"), "table_idx", "bucket"
    )
    cands = (
        sigs.join(F.broadcast(qsig), ["table_idx", "bucket"])
        .select("qid", "vec_id")
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("ve"))
    q = e.where(F.col("vec_id").isin([int(i) for i in query_ids])).select(
        F.col("vec_id").alias("qid"), F.col("ve").alias("qe")
    )
    pairs = cands.join(e, "vec_id").join(F.broadcast(q), "qid")
    cos = _dot("qe", "ve") / (F.sqrt(_dot("qe", "qe")) * F.sqrt(_dot("ve", "ve")))
    scored = pairs.select("qid", "vec_id", F.round(cos, 4).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(k))
        .select("qid", "vec_id", "cos", "rank")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (doc_a, doc_b, cos) with
    cos ≥ threshold, doc_a < doc_b. Exact all-pairs formulation — the
    correctness baseline; at 10^12 rows the LSH bucket join
    (lsh_bucketed_topk's candidate stage) replaces the self-join and this
    exact cosine re-checks only bucket-collision candidates."""
    e = embeddings.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("ve"))
    a = e.select(F.col("vec_id").alias("doc_a"), F.col("ve").alias("va"))
    b = e.select(F.col("vec_id").alias("doc_b"), F.col("ve").alias("vb"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    cos = _dot("va", "vb") / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb")))
    return (
        pairs.select("doc_a", "doc_b", F.round(cos, round_dp).alias("cos"))
        .where(F.col("cos") >= F.lit(float(threshold)))
    )
