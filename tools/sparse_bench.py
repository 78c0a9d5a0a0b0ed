"""Sparse-vs-dense SaaT accumulator benchmark in the sparse path's
intended regime (round-4 verdict item #4).

`operators/saat.py` switches from the dense reused int16 accumulator to
the sparse `np.unique`+`bincount` path when the docid space exceeds
DENSE_LIMIT = 2^26 — but every bench corpus sits far below that, so the
10^12-doc path had correctness tests and no performance evidence. This
tool synthesizes packages with the SAME postings workload at
docid spaces just below the crossover (dense), just above it (sparse,
same data shifted), and at 10^8/10^9 ids (sparse only — a dense array
would be 0.2-2 GB per worker there), and times ms/query through the real
`_search_one` kernel.

No Spark needed: the package format is plain files (one shard .npy + one
directory parquet), which is the point of the design — a worker serves
from mmap + a dict.

Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import VOCAB, gen_queries  # noqa: E402
from jassv2_spark.operators.saat import DENSE_LIMIT, _search_one  # noqa: E402

N_QUERIES = int(os.environ.get("SPARSE_BENCH_QUERIES", "2000"))
TOTAL_POSTINGS = int(os.environ.get("SPARSE_BENCH_POSTINGS", "1500000"))
IMPACTS_PER_TERM = 8


def make_package(max_doc: int, seed: int = 7) -> dict:
    """A single-bucket package: every term gets IMPACTS_PER_TERM segments
    of ascending unique docids drawn from [1, max_doc]."""
    rng = np.random.default_rng(seed)
    d = tempfile.mkdtemp(prefix="jass_sparse_bench_")
    token = uuid.uuid4().hex[:10]
    chunks: list[np.ndarray] = []
    meta = []
    offset = 0
    per_term = TOTAL_POSTINGS // len(VOCAB)
    for term in VOCAB:
        for impact in range(1, IMPACTS_PER_TERM + 1):
            n = per_term // IMPACTS_PER_TERM
            ids = np.unique(rng.integers(1, max_doc + 1, size=n, dtype=np.int64))
            chunks.append(ids)
            meta.append((term, impact * 100, len(ids), 0, offset, offset + len(ids)))
            offset += len(ids)
    all_ids = np.concatenate(chunks)
    if int(all_ids.max()) < (1 << 31):
        all_ids = all_ids.astype(np.int32)
    with open(os.path.join(d, f"shard_{token}_00000.npy"), "wb") as f:
        np.save(f, all_ids, allow_pickle=False)
    pq.write_table(
        pa.table(
            {
                "term": [m[0] for m in meta],
                "impact": [m[1] for m in meta],
                "seg_freq": [m[2] for m in meta],
                "shard": [m[3] for m in meta],
                "start": [m[4] for m in meta],
                "end": [m[5] for m in meta],
            }
        ),
        os.path.join(d, f"dir_{token}_00000.parquet"),
    )
    return {
        "dir": d, "token": token, "n_buckets": 1, "buckets": frozenset({0}),
        "n_postings": int(offset), "max_doc": int(max_doc), "stem": False,
    }


def bench_package(pkg: dict, label: str) -> dict:
    queries = gen_queries(N_QUERIES)
    # warm: fault pages in, build dir cache
    for qid, q in queries[:64]:
        _search_one(pkg, q, 10, 1.0, None)
    t0 = time.perf_counter()
    total = 0
    for _qid, q in queries:
        r, processed = _search_one(pkg, q, 10, 1.0, None)
        total += processed
    wall = time.perf_counter() - t0
    avg_planned = total / N_QUERIES
    out = {
        "label": label,
        # the kernel picks per query: dense only when the O(max_doc) hit
        # scan is amortized (max_doc <= 8x planned postings) AND the
        # buffer fits DENSE_LIMIT
        "path": (
            "dense"
            if pkg["max_doc"] < DENSE_LIMIT and pkg["max_doc"] <= 8 * avg_planned
            else "sparse"
        ),
        "max_doc": pkg["max_doc"],
        "n_postings": pkg["n_postings"],
        "n_queries": N_QUERIES,
        "postings_processed": total,
        "sec": round(wall, 3),
        "ms_per_query": round(wall / N_QUERIES * 1000, 3),
        "mpostings_per_sec": round(total / wall / 1e6, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    results = []
    # crossover pair: identical id distribution density, dense vs sparse
    results.append(bench_package(make_package(DENSE_LIMIT - 2), "crossover-dense"))
    results.append(bench_package(make_package(DENSE_LIMIT + 2), "crossover-sparse"))
    # deep sparse regime
    results.append(bench_package(make_package(10**8), "sparse-1e8"))
    results.append(bench_package(make_package(10**9), "sparse-1e9"))
    dense = next(r for r in results if r["label"] == "crossover-dense")
    sparse = next(r for r in results if r["label"] == "crossover-sparse")
    print(json.dumps({
        "summary": "sparse/dense ms-per-query ratio at the crossover",
        "ratio": round(sparse["ms_per_query"] / dense["ms_per_query"], 2),
    }))


if __name__ == "__main__":
    main()
