"""Learning-to-rank feature extraction for top-k candidates.

Production rankers re-rank a first-stage candidate list with a learned
model; the training/serving table is one row per (query, candidate doc)
with match features. This operator emits that table from the engine's own
artifacts — the candidates are the ordinary anytime top-k, the features
come from the index's (term, doc, tf) postings and (term, df) vocabulary,
so no second pass over raw text is needed.

Features (ALL exact integers — the repo's cross-engine portability
standard):
  rsv, rank          — the quantized SaaT accumulator and serve rank
  dl                 — document length in tokens
  n_terms            — query length in unique terms (counted pre-vocab-drop,
                       like the serve path's rescale divisor)
  n_matched          — how many distinct query terms the doc contains
  sum_tf / max_tf    — saturated tf mass of the matched terms
  sum_qtf_tf         — Σ q_tf·tf (duplicate query terms weigh double)
  idf_micros_sum     — Σ floor(10⁶·ln(N/df)) over matched terms: a
                       fixed-point idf profile, exactly reproducible by
                       any engine whose ln matches glibc (ln evaluated
                       driver-side per distinct df, build.py:408-417)
  min_df             — rarest matched term's document frequency

Scale shape: the candidate list is queries×k rows — broadcast into the
(term-keyed) postings join; the postings side is pre-filtered by a
broadcast semi-join on the query terms, so only matched-term rows flow.
One (query_id, doc_id) aggregate ends the plan. No shuffle grows with the
corpus beyond the term-pruned postings scan the serve path already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import DEFAULT_K, parse_queries, search

MICRO = 1_000_000


def ltr_features(
    index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    rho: float = 1.0,
    tokenizer: str | None = None,
) -> DataFrame:
    """One row per (query_id, doc_id) in the anytime top-k, with the
    integer feature columns documented in the module docstring."""
    spark = index.spark
    tokenizer = tokenizer or index.conf.tokenizer
    topk = search(
        index, queries, k=k, rho=rho, tokenizer=tokenizer, with_keys=False
    ).select("query_id", "doc_id", "rsv", "rank")

    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )

    # matched postings: query terms × index postings, restricted to the
    # candidate docs (broadcast both tiny sides).
    matched = (
        F.broadcast(q_terms)
        .join(index.postings, "term")
        .join(F.broadcast(topk.select("query_id", "doc_id")), ["query_id", "doc_id"])
        .join(index.term_stats.select("term", "df"), "term")
    )

    # driver-side fixed-point idf per distinct df (repo determinism standard)
    df_vals = [r[0] for r in matched.select("df").distinct().collect()]
    n = float(index.n_docs)
    idf_rows = [
        (int(d), int(math.floor(MICRO * math.log(n / float(d))))) for d in df_vals
    ] or [(0, 0)]
    idf_map = F.broadcast(
        spark.createDataFrame(idf_rows, schema="df long, idf_micros long")
    )

    feats = (
        matched.join(idf_map, "df")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("tf").cast("long").alias("sum_tf"),
            F.max("tf").cast("long").alias("max_tf"),
            F.sum(F.col("q_tf") * F.col("tf")).cast("long").alias("sum_qtf_tf"),
            F.sum("idf_micros").cast("long").alias("idf_micros_sum"),
            F.min("df").cast("long").alias("min_df"),
        )
    )
    return (
        topk.join(feats, ["query_id", "doc_id"])
        .join(F.broadcast(q_meta), "query_id")
        .join(index.doc_lengths, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.col("rsv").cast("long").alias("rsv"),
            F.col("rank").cast("long").alias("rank"),
            F.col("dl").cast("long").alias("dl"),
            F.col("n_terms").cast("long").alias("n_terms"),
            "n_matched",
            "sum_tf",
            "max_tf",
            "sum_qtf_tf",
            "idf_micros_sum",
            "min_df",
        )
    )


def mine_hard_negatives(
    index: Index,
    queries: DataFrame,
    qrels: DataFrame,
    k: int = DEFAULT_K,
    n_neg: int = 5,
    rho: float = 1.0,
    tokenizer: str | None = None,
) -> DataFrame:
    """(query_id, doc_id, rsv, orig_rank, neg_rank): BM25 hard-negative
    mining for dense-retriever training — the DPR recipe (Karpukhin et al.
    EMNLP 2020 §3.2: negatives = top BM25 candidates that are not gold
    positives). The engine's own anytime top-k is the candidate source, so
    mining costs one ordinary serve pass; `qrels(query_id, doc_id)` marks
    the positives to exclude.

    Queries with no positives still yield negatives (their whole top-k is
    negative — DPR keeps those for in-batch training). neg_rank renumbers
    survivors 1..n_neg by original rank, deterministic because the serve
    rank is already a total order.

    Scale shape: candidates are queries×k rows; the positives join is a
    (query_id, doc_id)-keyed LEFT ANTI (broadcast when qrels is small);
    the only window is per-query over ≤ k rows. Nothing grows with the
    corpus beyond the serve pass itself."""
    from pyspark.sql import Window

    topk = search(
        index, queries, k=k, rho=rho, tokenizer=tokenizer, with_keys=False
    ).select("query_id", "doc_id", "rsv", F.col("rank").alias("orig_rank"))
    pos = qrels.select("query_id", "doc_id").distinct()
    neg = topk.join(pos, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy("orig_rank")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neg_rank") <= F.lit(n_neg))
        .select("query_id", "doc_id", "rsv", "orig_rank", "neg_rank")
    )
