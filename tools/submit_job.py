"""Cluster entrypoint: build the index and serve a query batch.

Designed for `spark-submit --py-files` (north_rule deployment shape): the
job carries NO repo-path assumptions — the library arrives via the zip on
the executors' and driver's PYTHONPATH, and the master/deploy-mode/memory
all come from the spark-submit command line (the session builder here sets
no master, so it works identically on local[N], YARN, or k8s):

    python tools/package_pyfiles.py
    spark-submit --master local[8] --driver-memory 8g \
        --py-files dist/jassv2_spark.zip \
        tools/submit_job.py --sf-dir /root/testdata/sf0.001 --k 10

Prints one JSON line: docs indexed, queries served, wall seconds per
phase, and a checksum of the result ranks (rank-identity smoke evidence).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=100)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("jassv2-spark-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from jassv2_spark.engine import Engine

    t0 = time.time()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    eng = Engine.build(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id")
    n_docs = eng.get_document_count()
    t_build = time.time() - t0

    # Query terms come from the index's OWN vocabulary (top-df, term-asc
    # tie-break) so the job is corpus-agnostic — fixture stems would be OOV
    # on the English-word testdata corpus.
    import random

    vocab = [
        r["term"]
        for r in eng.index.term_stats.orderBy(F.desc("df"), F.asc("term"))
        .limit(64)
        .collect()
    ]
    rng = random.Random(7)
    q = spark.createDataFrame(
        [
            (f"q{i:03d}", " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 5))))
            for i in range(args.n_queries)
        ],
        ["query_id", "query"],
    )
    t1 = time.time()
    res = eng.search(q, k=args.k).orderBy("query_id", "rank").collect()
    t_search = time.time() - t1

    digest = hashlib.md5(
        "\n".join(f"{r['query_id']} {r['rank']} {r['doc_id']} {r['rsv']}" for r in res).encode()
    ).hexdigest()
    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "n_docs": n_docs,
                "n_queries": args.n_queries,
                "n_result_rows": len(res),
                "build_sec": round(t_build, 3),
                "search_sec": round(t_search, 3),
                "result_md5": digest,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
