"""sf1-class end-to-end soak (round-4 verdict item #5): build → package →
serve at amplify ≥ 512 (≥ 2.56M docs) on local[32], recording docs/s,
peak JVM RSS, the shard-fill histogram, and a sampled gate-style
correctness check at that scale — the declarative DataFrame plan and the
numpy SaaT fast path are fully independent executions of the same
semantics, so their bit-identical agreement on sampled queries is the
at-scale correctness evidence (the same property tests/test_saat.py
proves at small scale).

Usage: SOAK_AMPLIFY=512 python tools/soak.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMPLIFY = int(os.environ.get("SOAK_AMPLIFY", "512"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("SOAK_QUERIES", "4000"))
N_CHECK = int(os.environ.get("SOAK_CHECK_QUERIES", "40"))


def _jvm_peak_rss_gb() -> float:
    """Peak RSS of this process tree's JVM (local mode: the driver JVM is
    the whole engine)."""
    try:
        import glob

        peak = 0
        for status in glob.glob("/proc/[0-9]*/status"):
            try:
                with open(status) as f:
                    txt = f.read()
                if "java" not in txt.split("\n", 1)[0].lower():
                    continue
                for line in txt.splitlines():
                    if line.startswith("VmHWM"):
                        peak = max(peak, int(line.split()[1]))
            except OSError:
                continue
        return round(peak / 1024 / 1024, 2)
    except Exception:
        return -1.0


def main() -> None:
    from pyspark.sql import functions as F

    from bench import gen_queries, materialized_corpus
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.saat import package_index, saat_search
    from jassv2_spark.operators.search import search
    from jassv2_spark.session import get_spark

    spark = get_spark(app_name="jass-soak", cores=CPUS)
    docs = materialized_corpus(spark, SF_DIR, AMPLIFY, CPUS)

    t0 = time.perf_counter()
    idx = build_index(docs, text_col="text", key_col="doc_id",
                      doc_id_col="doc_id", conf=BuildConf(tokenizer="parity"))
    n_segments = int(idx.term_stats.agg(F.sum("n_segments")).collect()[0][0] or 0)
    t_build = time.perf_counter() - t0

    # shard-fill histogram: how close segment shard rows run to the
    # task-memory cap (shard_size doc_ids) — the skew-safety evidence
    fills = idx.segments.select(
        F.floor(F.col("part_freq") / F.lit(idx.conf.shard_size / 10)).alias("decile")
    ).groupBy("decile").count().orderBy("decile").collect()
    fill_hist = {int(r["decile"]): int(r["count"]) for r in fills}
    pf = idx.segments.agg(
        F.max("part_freq").alias("mx"),
        F.expr("percentile_approx(part_freq, 0.5)").alias("p50"),
    ).collect()[0]

    t0 = time.perf_counter()
    pkg = package_index(idx)
    t_package = time.perf_counter() - t0

    qdf = spark.createDataFrame(gen_queries(N_QUERIES), ["query_id", "query"])
    t0 = time.perf_counter()
    saat_search(idx, qdf, k=10, package=pkg).count()
    t_serve = time.perf_counter() - t0

    # sampled correctness: SaaT fast path vs the declarative plan must be
    # bit-identical (rsv, doc_id, rank) on every sampled query
    cq = spark.createDataFrame(gen_queries(N_CHECK, seed=1234), ["query_id", "query"])
    a = {(r["query_id"], r["rank"]): (r["doc_id"], r["rsv"])
         for r in saat_search(idx, cq, k=10, package=pkg).collect()}
    b = {(r["query_id"], r["rank"]): (r["doc_id"], r["rsv"])
         for r in search(idx, cq, k=10, with_keys=False).collect()}
    check_ok = a == b

    out = {
        "soak": "build+package+serve",
        "amplify": AMPLIFY,
        "cpus": CPUS,
        "n_docs": idx.n_docs,
        "n_postings": pkg["n_postings"],
        "n_segments": n_segments,
        "build_sec": round(t_build, 1),
        "docs_per_sec": round(idx.n_docs / t_build, 1),
        "package_sec": round(t_package, 1),
        "serve_sec": round(t_serve, 1),
        "queries_per_sec": round(N_QUERIES / t_serve, 1),
        "peak_jvm_rss_gb": _jvm_peak_rss_gb(),
        "shard_fill_decile_hist": fill_hist,
        "max_part_freq": int(pf["mx"]),
        "p50_part_freq": int(pf["p50"]),
        "shard_cap": idx.conf.shard_size,
        "sampled_check_queries": N_CHECK,
        "sampled_check_identical": check_ok,
    }
    print(json.dumps(out))
    idx.unpersist()
    spark.stop()
    if not check_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
