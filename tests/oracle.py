"""Slow, obviously-correct pure-Python reference implementation of the JASS
semantics (build + anytime search), used to verify the Spark pipelines.

Implements exactly: tokenize → tf (sat 1024) → doc lengths → ATIRE BM25
(k1=0.9, b=0.4, idf=ln(N/df), mean=Σlen/N) → uniform quantization to
[1,1024] → impact segments → q_tf scaling → uint8 rsv rescale → segment
order (impact desc, seg_freq asc) → ρ prefix → accumulate → top-k with
higher-doc_id-first tie-break. Formula citations in
jassv2_spark/operators/{build,search}.py.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from jassv2_spark.functions.tokenizer import tokenize

MAX_TF = 1024
LEVELS = 1024
MAX_RSV = 255


class PyIndex:
    def __init__(self, docs: list[tuple[int, str]], k1=0.9, b=0.4, xml=True):
        """docs: list of (doc_id, text)."""
        self.k1, self.b = k1, b
        self.doc_ids = [d for d, _ in docs]
        self.n = len(docs)
        tfs: dict[str, Counter] = defaultdict(Counter)
        self.dl: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text, xml=xml)
            self.dl[doc_id] = len(toks)
            for t in toks:
                tfs[t][doc_id] += 1
        self.tf = {
            term: {d: min(c, MAX_TF) for d, c in cnt.items()} for term, cnt in tfs.items()
        }
        self.mean = sum(self.dl.values()) / self.n
        # BM25 scores for every (term, doc)
        self.scores: dict[str, dict[int, float]] = {}
        for term, posting in self.tf.items():
            idf = math.log(self.n / len(posting))
            self.scores[term] = {}
            for d, tf in posting.items():
                lc = self.k1 * ((1.0 - self.b) + self.b * self.dl[d] / self.mean)
                self.scores[term][d] = idf * ((tf * (self.k1 + 1.0)) / (tf + lc))
        allscores = [s for p in self.scores.values() for s in p.values()]
        self.lo, self.hi = min(allscores), max(allscores)
        # quantize
        self.impacts: dict[str, dict[int, int]] = {}
        for term, p in self.scores.items():
            self.impacts[term] = {
                d: (
                    int((s - self.lo) / (self.hi - self.lo) * (LEVELS - 1)) + 1
                    if self.hi > self.lo
                    else 1
                )
                for d, s in p.items()
            }
        # segments: term -> list of (impact, sorted doc list)
        self.segments: dict[str, list[tuple[int, list[int]]]] = {}
        for term, imap in self.impacts.items():
            by_imp: dict[int, list[int]] = defaultdict(list)
            for d, i in imap.items():
                by_imp[i].append(d)
            self.segments[term] = [(i, sorted(ds)) for i, ds in sorted(by_imp.items())]

    def search(self, query: str, k=10, rho=1.0, postings_budget=None):
        """Returns (results [(doc_id, rsv)], postings_processed)."""
        terms = Counter(tokenize(query, xml=False))
        n_terms = len(terms)
        segs = []  # (simpact, seg_freq, term, docs)
        largest = 0
        total_postings = 0
        for term, q_tf in terms.items():
            if term not in self.segments:
                continue
            term_max = 0
            for imp, docs in self.segments[term]:
                simpact = imp * q_tf
                segs.append([simpact, len(docs), term, docs])
                term_max = max(term_max, simpact)
                total_postings += len(docs)
            largest += term_max
        # order: impact desc, seg_freq asc, term asc (deterministic tertiary)
        segs.sort(key=lambda s: (-s[0], s[1], s[2]))
        scale = largest > MAX_RSV
        budget = (
            int(total_postings * rho)
            if rho < 1.0
            else (postings_budget if postings_budget is not None else float("inf"))
        )
        acc: dict[int, int] = defaultdict(int)
        processed = 0
        for simpact, seg_freq, term, docs in segs:
            impact = (
                int(simpact / largest * (MAX_RSV - n_terms) + 1) if scale else simpact
            )
            if processed + seg_freq > budget:
                break
            processed += seg_freq
            for d in docs:
                acc[d] += impact
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], -kv[0]))[:k]
        return ranked, processed
