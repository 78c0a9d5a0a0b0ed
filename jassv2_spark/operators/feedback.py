"""Pseudo-relevance feedback (RM3-style) query expansion over the engine.

The reference serves each query exactly as typed (`anytime/JASS_anytime_api
.cpp` has no feedback loop); relevance-model expansion (Lavrenko & Croft
2001; the Anserini/Indri "RM3" default fb_docs=10, fb_terms=10) is the
standard recall lever layered on top of such an engine. This implements it
engine-native and fully deterministic:

  pass 1: ordinary anytime top-k (operators/search.py) → the fb_docs
          feedback documents per query, with their integer rsv.
  weight: exp_score(q, t) = Σ_{d ∈ fb(q)} tf(t, d) · rsv(q, d)
          — the relevance-model Σ p(t|d)·p(q|d) shape with the engine's own
          integer quantities (saturated tf, uint8-budgeted rsv), so the
          score is EXACT integer arithmetic: bitwise portable, no float
          normalization to drift between engines.
  select: drop the original query terms, keep the fb_terms best by
          (exp_score DESC, term ASC) — fully deterministic tie-break.
  pass 2: re-run search with qt₂ = original terms (their q_tf) ∪ expansion
          terms (q_tf = 1) through the SAME segment pipeline
          (search_from_terms), n_terms recounted over qt₂ so the uint8
          rescale sees the expanded query.

Scale shape: pass 1 is the ordinary serve path; the feedback join
broadcasts the tiny (queries × fb_docs) hit set into the postings table
keyed on doc_id — a map-side semi-join, no postings shuffle; the expansion
agg is (query, term)-keyed and bounded by fb_docs × doc length. Pass 2 is
again the ordinary serve path with ≤ fb_terms extra terms per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import (
    DEFAULT_K,
    parse_queries,
    search,
    search_from_terms,
)

FB_DOCS_DEFAULT = 10
FB_TERMS_DEFAULT = 10


def rm3_expansion_terms(
    index: Index,
    queries: DataFrame,
    fb_docs: int = FB_DOCS_DEFAULT,
    fb_terms: int = FB_TERMS_DEFAULT,
    rho: float = 1.0,
) -> DataFrame:
    """(query_id, term, exp_score, exp_rank): the fb_terms expansion terms
    per query mined from the top-fb_docs first-pass results. Queries with
    no first-pass hits (all-OOV) yield no rows."""
    first = search(index, queries, k=fb_docs, rho=rho, with_keys=False)
    fb = F.broadcast(first.select("query_id", "doc_id", "rsv"))
    scores = (
        fb.join(index.postings.select("doc_id", "term", "tf"), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("tf") * F.col("rsv")).cast("long").alias("exp_score"))
    )
    q_terms, _ = parse_queries(
        queries, tokenizer=index.conf.tokenizer, stem=getattr(index.conf, "stem", False)
    )
    novel = scores.join(
        F.broadcast(q_terms.select("query_id", "term")), ["query_id", "term"], "left_anti"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exp_score").desc(), F.col("term").asc()
    )
    return (
        novel.withColumn("exp_rank", F.row_number().over(w).cast("long"))
        .where(F.col("exp_rank") <= fb_terms)
        .select("query_id", "term", "exp_score", "exp_rank")
    )


def rm3_search(
    index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    fb_docs: int = FB_DOCS_DEFAULT,
    fb_terms: int = FB_TERMS_DEFAULT,
    rho: float = 1.0,
    with_keys: bool = True,
) -> DataFrame:
    """Two-pass RM3 top-k. Returns (query_id, doc_id[, key], rsv, rank)
    for the expanded query: original terms keep their q_tf, expansion
    terms weigh in at q_tf = 1 (the impact×q_tf multiply then applies
    uniformly, `source/deserialised_jass_v1.h:357`)."""
    exp = rm3_expansion_terms(
        index, queries, fb_docs=fb_docs, fb_terms=fb_terms, rho=rho
    )
    q_terms, _ = parse_queries(
        queries, tokenizer=index.conf.tokenizer, stem=getattr(index.conf, "stem", False)
    )
    qt2 = q_terms.unionByName(
        exp.select("query_id", "term", F.lit(1).cast("long").alias("q_tf"))
    )
    qm2 = qt2.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_terms"))
    return search_from_terms(
        index, qt2, qm2, k=k, rho=rho, with_keys=with_keys
    )
