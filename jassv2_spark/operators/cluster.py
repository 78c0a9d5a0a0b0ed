"""Embedding clustering for training-data curation: distributed Lloyd's
k-means plus cluster-balanced sampling.

Why it belongs in this engine: web-scale pretraining pipelines cluster
document embeddings to diversity-sample, near-dup prune, and
topic-balance the mix (e.g. SemDeDup / DoReMi-style curation); the
reference engine stops at postings, but its users run exactly this step
between crawling and training. Shapes follow the `operators/ann.py`
conventions (``vec_id``, ``embedding: array<float>``).

Determinism recipe (same spirit as webgraph.pagerank / hits):

- Each embedding component becomes exact int64 fixed point once:
  ``floor(double(x) · 10^6)`` — float→double widening and one IEEE
  multiply are bit-identical on any engine.
- Distances are EXACT integer sums Σ (x_i − c_i)² — associative, so any
  parallelism/aggregation order gives the same int64 (micros ≲ 10⁷ →
  diff² ≲ 10¹⁴, ×dims ≪ 2⁶³).
- Argmin tie-breaks on the lower cluster id via (dist, cluster) struct
  ordering.
- Centroid update is the floored integer mean ``floor_div(Σx, n)``
  (floor, not truncate, so negative sums agree with DuckDB's ``//``);
  exact in int64 at any scale.
- Seeds are the embeddings of the k smallest vec_ids — no RNG, so an
  oracle can replay the whole trajectory (entry_queries unrolls the
  iterations as CTEs).

Scale shape: centroids live on the driver and ride into the plan as
literals (k·dim int64s — the classic broadcast-Lloyd's layout, cf. Spark
MLlib KMeans); assignment is ONE map-only corpus pass per iteration (no
shuffle, whole-stage codegen), and the update is one (cluster, dim)-keyed
partial agg whose reduced size is k·dim rows regardless of corpus size.
Fixed iteration count ⇒ fixed job count; nothing grows with n except the
two scans per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMEANS_SCALE = 10**6


def _int_vec(vec_col: str, scale: int):
    return F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double) * {float(scale)}) as bigint))"
    )


def _dist_expr(cvec: list[int]) -> str:
    arr = "array(" + ",".join(f"{int(c)}L" for c in cvec) + ")"
    return (
        f"aggregate(zip_with(iv, {arr}, (x, y) -> (x - y) * (x - y)), "
        f"cast(0 as bigint), (a, v) -> a + v)"
    )


def _assign_expr(centroids: dict[int, list[int]]):
    structs = [
        F.struct(
            F.expr(_dist_expr(vec)).alias("d"), F.lit(int(cl)).cast("long").alias("c")
        )
        for cl, vec in sorted(centroids.items())
    ]
    return F.least(*structs).getField("c").alias("cluster")


def kmeans_assign(
    embeddings: DataFrame,
    *,
    k: int = 8,
    iterations: int = 5,
    scale: int = KMEANS_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): Lloyd's k-means assignments after `iterations`
    rounds from the deterministic k-smallest-id seeds (module docstring
    for the exact-integer recipe; clusters keep their seed index even if
    they empty out mid-run)."""
    iv = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), _int_vec(vec_col, scale).alias("iv")
    ).persist()
    seeds = iv.orderBy("vec_id").limit(k).collect()
    centroids = {j: list(row["iv"]) for j, row in enumerate(seeds)}
    for it in range(iterations):
        assigned = iv.select("vec_id", "iv", _assign_expr(centroids))
        if it == iterations - 1:
            return assigned.select("vec_id", "cluster")
        sums = (
            assigned.select("cluster", F.posexplode("iv").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("cx", F.expr("(s - pmod(s, n)) div n"))  # floor div
            .collect()
        )
        centroids = {}
        for row in sums:
            centroids.setdefault(int(row["cluster"]), {})[int(row["dim"])] = int(row["cx"])
        centroids = {
            cl: [dims[i] for i in range(len(dims))] for cl, dims in centroids.items()
        }
    raise AssertionError("unreachable: iterations >= 1")


def cluster_sample(
    assignments: DataFrame,
    *,
    n_per_cluster: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cluster, rk): cluster-balanced sample — the md5-lowest
    `n_per_cluster` members of each cluster. Same engine-portable sampling
    rule as curation.split_assign (md5 of the decimal id), so DuckDB
    reproduces the pick bit-for-bit; one window over per-cluster members.
    """
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assignments.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= F.lit(int(n_per_cluster)))
        .select(id_col, "cluster", "rk")
    )


def cluster_labels(index, assignments: DataFrame, *, m: int = 5) -> DataFrame:
    """(cluster, term, ctf, df, weight_micros, term_rank): per-cluster
    label terms — each embedding cluster's top-m vocabulary by
    cluster-tf·idf (ctf = Σ tf over member docs), the curation-dashboard
    view of what a cluster IS. Same selection/witness recipe as
    mlt.doc_keyterms: order by the unfloored ctf·idf double with term ASC
    ties; emit the exact-integer witness ctf·floor(10⁶·ln(N/df)).

    Scale shape: postings ⋈ assignments is a (doc)-keyed equi-join, the
    (cluster, term) agg partial-aggregates to vocabulary-sized rows per
    cluster, the idf lookup is a broadcast of one row per distinct df,
    and the top-m window partitions by cluster (k partitions, each
    vocabulary-bounded)."""
    import math

    spark = index.spark
    a = assignments.select(
        F.col(assignments.columns[0]).alias("doc_id"), "cluster"
    )
    ct = (
        index.postings.join(a, "doc_id")
        .groupBy("cluster", "term")
        .agg(F.sum("tf").cast("long").alias("ctf"))
        .join(index.term_stats.select("term", "df"), "term")
    )
    # distinct-df ln table, CAPPED (functions/lntable.py): vocabulary-wide
    # df domains grow with N; past the cap use in-engine ln (logged).
    from jassv2_spark.functions.lntable import capped_distinct

    df_vals = capped_distinct(ct, "df")
    n = float(index.n_docs)
    if df_vals is not None:
        rows = [
            (int(d), math.log(n / float(d)),
             int(math.floor(1_000_000 * math.log(n / float(d)))))
            for d in df_vals
        ] or [(0, 0.0, 0)]
        idf_map = F.broadcast(
            spark.createDataFrame(rows, schema="df long, idf double, idf_micros long")
        )

        def _with_idf(frame):
            return frame.join(idf_map, "df")
    else:

        def _with_idf(frame):
            ln_expr = F.log(F.lit(n) / F.col("df").cast("double"))
            return frame.withColumn("idf", ln_expr).withColumn(
                "idf_micros", F.floor(F.lit(1_000_000.0) * ln_expr).cast("long")
            )
    w = Window.partitionBy("cluster").orderBy(
        F.col("weight").desc(), F.col("term").asc()
    )
    return (
        ct.transform(_with_idf)
        .withColumn("weight", F.col("ctf").cast("double") * F.col("idf"))
        .withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= F.lit(int(m)))
        .select(
            "cluster",
            "term",
            "ctf",
            F.col("df").cast("long").alias("df"),
            (F.col("ctf") * F.col("idf_micros")).cast("long").alias("weight_micros"),
            "term_rank",
        )
    )
