"""Deterministic fixtures: the reference 10-document collection and the
synthetic Common-Crawl-shaped corpus + query sets (FIXTURES.md).

The 10-document collection is byte-for-byte the reference unittest corpus
(`source/unittest_data.cpp:15`): doc i (1..10) contains the last i words of
"ten nine eight seven six five four three two one", wrapped in TREC markup
whose <DOCNO> digits are themselves indexed (tag *contents* are tokenized).
"""

from __future__ import annotations

import datetime
import math
import random

WORDS = "ten nine eight seven six five four three two one".split()


def ten_documents() -> list[dict]:
    """The reference 10-doc collection in the input-contract shape
    (url, warc_ts, html, text, lang)."""
    rows = []
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    for i in range(1, 11):
        body = " ".join(WORDS[:i])
        docno = " 1 " if i == 1 else str(i)  # doc 1's DOCNO has spaces (unittest_data.cpp:15)
        html = f"<DOC><DOCNO>{docno}</DOCNO>{body}</DOC>"
        rows.append(
            {
                "url": f"https://example.org/ten/{i:08d}",
                "warc_ts": base + datetime.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": body,
                "lang": "en",
            }
        )
    return rows


# Expected inverted index for the 10-doc collection
# (source/index_manager_sequential.h:446-468), term -> [(doc_id, tf)].
TEN_DOC_POSTINGS = {
    "6": [(6, 1)],
    "1": [(1, 1)],
    "4": [(4, 1)],
    "5": [(5, 1)],
    "3": [(3, 1)],
    "8": [(8, 1)],
    "7": [(7, 1)],
    "2": [(2, 1)],
    "9": [(9, 1)],
    "10": [(10, 1)],
    "four": [(7, 1), (8, 1), (9, 1), (10, 1)],
    "eight": [(3, 1), (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
    "five": [(6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
    "seven": [(4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
    "two": [(9, 1), (10, 1)],
    "six": [(5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
    "three": [(8, 1), (9, 1), (10, 1)],
    "one": [(10, 1)],
    "nine": [(2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
    "ten": [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1)],
}

TEN_DOC_QUERIES = [
    ("q1", "one"),
    ("q2", "ten"),
    ("q3", "three seven"),
    ("q4", "ten ten nine"),  # duplicate term → q_tf=2 impact multiply
    ("q5", "zzz"),  # OOV → empty result
    ("q6", "one two three four five six seven eight nine ten"),
]


def synthetic_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    """Zipf web-ish corpus per FIXTURES.md Corpus B (deterministic)."""
    rng = random.Random(seed)
    stems = [f"w{j:04d}" for j in range(2000)] + [str(1000 + j) for j in range(200)]
    weights = [1.0 / (r + 1) ** 1.1 for r in range(len(stems))]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)

    def draw() -> str:
        x = rng.random()
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < x:
                lo = mid + 1
            else:
                hi = mid
        return stems[lo]

    unicode_mix = "abc123 αβγ①②③ aβc1②3 αbγ①2③ ab℃½3 αβγ½③"
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = []
    for i in range(n_docs):
        length = max(5, int(math.exp(rng.gauss(math.log(200), 0.6)) / 4))
        words = [draw() for _ in range(length)]
        body = " ".join(words)
        if i % 100 == 37:
            body += " <b>bold</b> <!--noise--> &amp; " + "tagged"
        if i % 100 == 73:
            body += " " + unicode_mix
        html = f"<DOC><DOCNO>{i}</DOCNO>{body}</DOC>"
        rows.append(
            {
                "url": f"https://example.org/web/{i:08d}",
                "warc_ts": base + datetime.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": body,
                "lang": "und" if i % 100 == 73 else "en",
            }
        )
    return rows


def synthetic_queries(n: int = 100, seed: int = 42) -> list[tuple[str, str]]:
    rng = random.Random(seed + 1)
    stems = [f"w{j:04d}" for j in range(2000)]
    out = []
    for i in range(n):
        nt = rng.randint(1, 5)
        terms = []
        for _ in range(nt):
            r = rng.random()
            if r < 0.3:
                terms.append(stems[rng.randint(0, 20)])  # Zipf head
            else:
                terms.append(stems[rng.randint(0, 1999)])
        out.append((f"q{i:03d}", " ".join(terms)))
    return out
