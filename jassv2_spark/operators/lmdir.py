"""Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty,
SIGIR'01) — the second ranker behind the reference's pluggable seam.

The reference defines an abstract ranker (`source/ranking_function.h`)
with one concrete scorer (`ranking_function_atire_bm25.h`); its
predecessor lineage (ATIRE) shipped language-model ranking publicly.
This module fills that seam Spark-side:

  score(q, d) = Σ_{t∈q∩V} q_tf(t) · ln(1 + tf(t,d)·clen / (μ·ctf(t)))
                + |q| · ln(μ / (dl(d) + μ))

with |q| = Σ q_tf over IN-VOCABULARY terms (OOV terms drop silently,
matching the engine's vocab-miss behavior, search.py step 2).

Determinism recipe (the repo standard): every ln() is evaluated
DRIVER-SIDE in CPython over a SMALL domain and broadcast as a lookup —

  * term weights: one entry per distinct (query term, tf) pair actually
    present in the postings — bounded by |q_terms| × distinct-tf-values
    (tf repeats enormously at corpus scale; this is thousands of rows,
    never corpus-sized);
  * length weights: one entry per distinct document length — bounded by
    max_dl (≈10⁵ even at web scale), a broadcast-sized table.

Each weight is truncated to fixed-point MICROS (floor(10⁶·ln…), exact
toward -∞ for the negative length part) BEFORE any aggregation, so the
per-query sum is an integer — associative, bitwise-reproducible at any
parallelism, and exactly reproducible by any engine whose ln matches
glibc (CPython's does; so does DuckDB's — the basis of every oracle in
this repo). Plan shape: two token-keyed partial-agg shuffles (counts,
lengths), broadcast query/lookup joins, one (query, doc) hash-agg, a
per-query top-k window — the engine's standard serve skeleton.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.functions.tokenizer import spark_tokens

MU_DEFAULT = 2500.0  # Zhai & Lafferty's reported sweet spot ~[500, 10000]
MICRO = 1_000_000


def lm_dirichlet_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    mu: float = MU_DEFAULT,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "parity",
) -> DataFrame:
    """Top-k per query under Dirichlet-smoothed query likelihood.
    Returns (query_id, doc_id, rsv_micro, rank); rsv_micro is the exact
    integer Σ of per-term micros + |q|·length-micros; ties break to the
    higher doc_id like every other top-k in the engine. Candidates are
    documents matching ≥1 in-vocabulary query term."""
    spark = docs.sparkSession
    mu = float(mu)

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(spark_tokens(text_col, mode=tokenizer)).alias("term"),
    )
    cnt = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
    dlx = cnt.groupBy("doc_id").agg(F.sum("cnt").alias("dl"))
    clen = int(dlx.agg(F.sum("dl")).collect()[0][0] or 0)

    qtoks = queries.select(
        "query_id", F.explode(spark_tokens("query", mode=tokenizer, xml=False)).alias("term")
    )
    qt = qtoks.groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("q_tf"))

    # collection term frequencies for the (tiny) query vocabulary
    ctf_rows = (
        cnt.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("cnt").alias("ctf"))
        .collect()
    )
    ctf = {r["term"]: int(r["ctf"]) for r in ctf_rows}

    # driver-side ln lookup #1: distinct (term, tf) among matched postings
    tf_rows = (
        cnt.join(F.broadcast(qt.select("term").distinct()), "term")
        .select("term", "cnt")
        .distinct()
        .collect()
    )
    w_rows = [
        (
            r["term"],
            int(r["cnt"]),
            math.floor(
                MICRO
                * math.log(1.0 + (float(r["cnt"]) * float(clen)) / (mu * float(ctf[r["term"]])))
            ),
        )
        for r in tf_rows
    ]
    wmap = (
        F.broadcast(spark.createDataFrame(w_rows, "term string, cnt long, w_micro long"))
        if w_rows
        else F.broadcast(spark.createDataFrame([], "term string, cnt long, w_micro long"))
    )

    # driver-side ln lookup #2: distinct document lengths — CAPPED
    # (functions/lntable.py): the dl domain is naturally ≤ max doc length
    # but unbounded in principle; past the cap fall back to in-engine ln
    # (1-ulp variance instead of bitwise parity, logged).
    from jassv2_spark.functions.lntable import capped_distinct

    dl_vals = capped_distinct(dlx, "dl")
    if dl_vals is not None:
        d_rows = [
            (int(v), math.floor(MICRO * math.log(mu / (float(v) + mu))))
            for v in dl_vals
        ]
        dmap = F.broadcast(spark.createDataFrame(d_rows, "dl long, d_micro long"))

        def _with_d_micro(frame):
            return frame.join(dmap, "dl")
    else:

        def _with_d_micro(frame):
            return frame.withColumn(
                "d_micro",
                F.floor(
                    F.lit(float(MICRO))
                    * F.log(F.lit(mu) / (F.col("dl").cast("double") + F.lit(mu)))
                ).cast("long"),
            )

    # |q| over in-vocabulary terms only
    vocab = spark.createDataFrame([(t,) for t in ctf], "term string")
    qv = qt.join(F.broadcast(vocab), "term")
    qlen = qv.groupBy("query_id").agg(F.sum("q_tf").alias("qlen"))

    term_part = (
        cnt.join(F.broadcast(qv), "term")
        .join(wmap, ["term", "cnt"])
        .select("query_id", "doc_id", (F.col("q_tf") * F.col("w_micro")).alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("t_micro"))
    )
    hits = (
        term_part.join(dlx, "doc_id")
        .transform(_with_d_micro)
        .join(F.broadcast(qlen), "query_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("t_micro") + F.col("qlen") * F.col("d_micro"))
            .cast("long")
            .alias("rsv_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv_micro").desc(), F.col("doc_id").desc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rsv_micro", "rank")
    )
