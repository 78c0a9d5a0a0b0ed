"""MMR result diversification: embedding-aware re-rank of the top-k.

Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98): from a
relevance-ranked candidate pool, greedily pick results that balance
relevance against redundancy —

    pick_1 = argmax rel(c)
    pick_i = argmax [ λ·rel(c) − (1−λ)·max_{s∈picked} cos(c, s) ]

with rel(c) = rsv/255 (the uint8-rescaled accumulator normalized to
[0,1]) and cos over the corpus embedding column. Ties break doc_id DESC
(the engine's standard).

Cross-engine exactness (the interesting part): cosine over raw floats is
summation-order-dependent (numpy pairwise ≠ a SQL engine's fold), so
instead each embedding is integer-quantized first —
    v_i = floor(x_i · 1000 + 0.5)
and every dot product is then a sum of INTEGERS: each partial sum is
exactly representable in a float64 (< 2^53), so the result is identical
under ANY summation order on ANY engine. cos = dot/(sqrt(na)·sqrt(nb))
is then built from identical doubles by correctly-rounded IEEE ops —
bitwise reproducible without rounding hacks. The greedy argmax compares
identical doubles, so selections coincide too.

Scale shape: candidates come from the ordinary serve path (pool ≤ ~50
per query); the greedy loop runs per query over a ≤pool×pool similarity
matrix — an `applyInPandas` group task of a few thousand flops,
embarrassingly parallel across queries, Arrow-batched. Embeddings reach
the workers through a (doc_id)-keyed equi-join against the tiny
candidate list (broadcast), never a full-corpus pairwise pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import DEFAULT_K, search

DEFAULT_LAMBDA = 0.7
DEFAULT_POOL = 30
QUANT = 1000.0  # embedding quantization scale (see module docstring)

_OUT_SCHEMA = "query_id string, doc_id long, rsv long, step long"


def _mmr_group(pdf: pd.DataFrame, k: int, lam: float) -> pd.DataFrame:
    import numpy as np

    oml = 1.0 - lam
    docs = pdf["doc_id"].to_numpy()
    rsv = pdf["rsv"].to_numpy()
    rel = rsv.astype("float64") / 255.0
    V = np.floor(
        np.stack(pdf["v"].to_numpy()).astype("float64") * QUANT + 0.5
    )
    G = V @ V.T  # integer-valued float64 — exact (sums of ints < 2^53)
    nrm = np.sqrt(np.diag(G))
    C = G / np.outer(nrm, nrm)

    n = len(docs)
    picked: list[int] = []
    # pick 1: argmax (rel, doc_id) — row order must not matter
    first = max(range(n), key=lambda i: (rel[i], docs[i]))
    picked.append(first)
    free = [i for i in range(n) if i != first]
    while free and len(picked) < k:
        best, best_key = None, None
        for i in free:
            m = max(C[i, j] for j in picked)
            key = (lam * rel[i] - oml * m, docs[i])
            if best is None or key > best_key:
                best, best_key = i, key
        picked.append(best)
        free.remove(best)
    return pd.DataFrame(
        {
            "query_id": pdf["query_id"].iloc[0],
            "doc_id": docs[picked],
            "rsv": rsv[picked],
            "step": range(1, len(picked) + 1),
        }
    )


def mmr_rerank(
    index: Index,
    queries: DataFrame,
    embeddings: DataFrame,
    k: int = DEFAULT_K,
    pool: int = DEFAULT_POOL,
    lam: float = DEFAULT_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tokenizer: str | None = None,
) -> DataFrame:
    """(query_id, doc_id, rsv, step): the MMR-diversified top-k selected
    from the anytime top-`pool` candidates; step is the greedy pick order
    (step 1 = most relevant)."""
    cand = search(
        index, queries, k=pool, tokenizer=tokenizer, with_keys=False
    ).select("query_id", "doc_id", "rsv")
    emb = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    ce = F.broadcast(cand).join(emb, "doc_id").select("query_id", "doc_id", "rsv", "v")
    return ce.groupBy("query_id").applyInPandas(
        lambda pdf: _mmr_group(pdf, k, lam), _OUT_SCHEMA
    )
