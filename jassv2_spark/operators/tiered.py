"""Two-tier serving: champion-list first, full index on fallback.

The production pattern behind static pruning (operators/prune.py): serve
every query from the small champion tier; escalate to the full index only
when the champion result looks degraded (Risvik et al., "Multi-tier
architecture for Web search engines", LA-WEB 2003). The escalation rule
here is the classic sufficiency test: a query stays in the champion tier
iff it filled all k slots AND its k-th result's rsv reaches a floor τ —
both computable from the tier-1 result alone.

Plan shape: tier 1 is an ordinary `search` over the pruned index (its
segment table is a small fraction of the full one). The fallback set is
per-QUERY — a driver-side collect of at most n_queries ids (the query
batch is driver-sized by definition; the reference holds the whole batch
in RAM too, `anytime/JASS_anytime.cpp`) — and tier 2 runs the full-index
`search` restricted to those queries only. At a 1000-node deployment this
is exactly the win: the expensive tier sees only the escalated tail.

Determinism: both tiers are the engine's own deterministic search; the
escalation predicate is an integer comparison — so the merged output is
reproducible at any parallelism and expressible in the DuckDB oracle as
the same two chains plus a CASE selector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import DEFAULT_K, search


def search_tiered(
    full_index: Index,
    champion_index: Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    *,
    min_kth_rsv: int = 1,
    tokenizer: str | None = None,
    with_keys: bool = False,
) -> DataFrame:
    """(query_id, doc_id[, key], rsv, rank, tier): per query either the
    champion tier's top-k (tier='champion') or, if the champion result is
    insufficient (fewer than k hits, or k-th rsv < min_kth_rsv), the full
    index's top-k (tier='full'). `champion_index` is typically
    `prune_index(full_index, m)`; any index over the same corpus works."""
    first = search(
        champion_index, queries, k=k, tokenizer=tokenizer, with_keys=with_keys
    ).persist()

    satisfied = [
        r["query_id"]
        for r in first.where(
            (F.col("rank") == F.lit(k)) & (F.col("rsv") >= F.lit(int(min_kth_rsv)))
        )
        .select("query_id")
        .collect()
    ]
    champion = first.where(F.col("query_id").isin(satisfied)).withColumn(
        "tier", F.lit("champion")
    )
    fallback_queries = queries.where(~F.col("query_id").isin(satisfied))
    full = search(
        full_index, fallback_queries, k=k, tokenizer=tokenizer, with_keys=with_keys
    ).withColumn("tier", F.lit("full"))
    return champion.unionByName(full)
