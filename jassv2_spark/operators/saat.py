"""Batch SaaT fast path: broadcast index + numpy accumulators per query.

This is the Spark analogue of the reference's actual serving design: a
read-only in-memory index shared by worker threads, each thread pulling
whole queries (`anytime/JASS_anytime_query.h:88-103` work-stealing ≅ Spark
scheduling query partitions), a dense accumulator array per query
(`source/accumulator_2d.h`), and a top-k select. Use when the segment
index fits executor memory (the reference's own regime:
`source/query.h:135` MAX_DOCUMENTS = 155e6, all-RAM); the declarative path
in operators/search.py is the beyond-RAM scale path.

Must emit bitwise-identical results to the declarative path — enforced by
tests/test_saat.py. Semantics (q_tf scaling, uint8 rescale, segment order,
ρ stop-before-overflow, doc_id tie-break) follow
`anytime/JASS_anytime_api.cpp:434-648`; see operators/search.py for the
per-step citations.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from jassv2_spark.functions.tokenizer import tokenize
from jassv2_spark.operators.build import Index
from jassv2_spark.operators.search import MAX_RSV


def package_index(index: Index) -> dict:
    """Collect the segment table into a compact driver-side package:
    term → list of (impact, seg_freq, ascending doc_id np.array).

    This is the analogue of the reference's serial index load
    (`anytime/JASS_anytime_api.cpp:89-134`): done once, amortized over the
    query stream. Arrow-backed toPandas keeps the transfer columnar."""
    pdf = index.segments.select("term", "impact", "doc_ids").toPandas()
    by_term: dict[str, dict[int, list[np.ndarray]]] = {}
    for term, impact, ids in zip(pdf["term"], pdf["impact"], pdf["doc_ids"]):
        by_term.setdefault(term, {}).setdefault(int(impact), []).append(
            np.asarray(ids, dtype=np.int64)
        )
    package: dict[str, list[tuple[int, int, np.ndarray]]] = {}
    max_doc = 0
    for term, imps in by_term.items():
        segs = []
        for impact, shards in sorted(imps.items()):
            ids = np.concatenate(shards) if len(shards) > 1 else shards[0]
            ids.sort()
            if len(ids):
                max_doc = max(max_doc, int(ids[-1]))
            segs.append((impact, len(ids), ids))
        package[term] = segs
    return {"terms": package, "max_doc": max_doc,
            "stem": getattr(index.conf, "stem", False)}


def _search_one(
    pkg: dict, query: str, k: int, rho: float, postings_budget: int | None
) -> tuple[list[tuple[int, int]], int]:
    """One query against the package; returns (ranked [(doc_id, rsv)],
    postings_processed). Mirrors tests/oracle.py / the declarative plan."""
    toks = tokenize(query, xml=False)
    if pkg.get("stem"):
        from jassv2_spark.functions.stem import stem_tokens

        toks = stem_tokens(toks)
    terms = Counter(toks)
    n_terms = len(terms)
    table = pkg["terms"]
    segs: list[tuple[int, int, str, np.ndarray]] = []
    largest = 0
    total_postings = 0
    for term, q_tf in terms.items():
        tsegs = table.get(term)
        if tsegs is None:
            continue
        term_max = 0
        for impact, seg_freq, ids in tsegs:
            simpact = impact * q_tf
            segs.append((simpact, seg_freq, term, ids))
            term_max = max(term_max, simpact)
            total_postings += seg_freq
        largest += term_max
    if not segs:
        return [], 0
    # impact DESC, seg_freq ASC, term ASC (deterministic tertiary)
    segs.sort(key=lambda s: (-s[0], s[1], s[2]))
    scale = largest > MAX_RSV
    if rho < 1.0:
        budget = int(total_postings * rho)
    elif postings_budget is not None:
        budget = int(postings_budget)
    else:
        budget = None

    acc = np.zeros(pkg["max_doc"] + 1, dtype=np.int64)
    processed = 0
    for simpact, seg_freq, _term, ids in segs:
        impact = int(simpact / largest * (MAX_RSV - n_terms) + 1) if scale else simpact
        if budget is not None and processed + seg_freq > budget:
            break  # stop-before-overflow (JASS_anytime_api.cpp:590-592)
        processed += seg_freq
        acc[ids] += impact

    hit_ids = np.nonzero(acc)[0]
    if len(hit_ids) == 0:
        return [], processed
    vals = acc[hit_ids]
    # O(n) top-k on a packed (rsv, doc_id) key: rsv ≤ MAX_RSV·q_tf fits well
    # under 2^15, doc_id under 2^48 — ordering ≡ (rsv DESC, doc_id DESC).
    key = (vals << np.int64(48)) | hit_ids
    if len(key) > k:
        cand = np.argpartition(key, len(key) - k)[len(key) - k :]
    else:
        cand = np.arange(len(key))
    order = cand[np.argsort(key[cand])[::-1]]
    return [(int(hit_ids[i]), int(vals[i])) for i in order], processed


def saat_search(
    index: Index,
    queries: DataFrame,
    k: int = 10,
    rho: float = 1.0,
    postings_budget: int | None = None,
    package: dict | None = None,
) -> DataFrame:
    """Batch search via broadcast package; schema matches the declarative
    path: (query_id, doc_id, rsv, rank)."""
    spark = queries.sparkSession
    pkg = package if package is not None else package_index(index)
    bpkg = spark.sparkContext.broadcast(pkg)

    schema = StructType(
        [
            StructField("query_id", StringType(), False),
            StructField("doc_id", LongType(), False),
            StructField("rsv", LongType(), False),
            StructField("rank", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = bpkg.value
        for pdf in batches:
            out = []
            for qid, qtext in zip(pdf["query_id"], pdf["query"]):
                ranked, _ = _search_one(p, qtext, k, rho, postings_budget)
                for rank, (doc, rsv) in enumerate(ranked, start=1):
                    out.append((qid, doc, rsv, rank))
            yield pd.DataFrame(out, columns=["query_id", "doc_id", "rsv", "rank"])

    nparts = min(
        max(1, queries.sparkSession.sparkContext.defaultParallelism),
        max(1, queries.count()),
    )
    return queries.repartition(nparts).mapInPandas(run, schema=schema)
