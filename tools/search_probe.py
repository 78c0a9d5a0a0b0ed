"""Search-phase scaling probe: where do the N→4N losses in saat_search live?

Splits the serving phase's wall time at each parallelism level into
  - in-kernel time (Σ per-query usec from the worker's own clock)
  - everything else (Spark scheduling, Arrow transfer, stragglers, idle)
and, for contrast, runs the SAME kernel over the SAME package in bare
multiprocessing (no Spark at all) at the same levels — the Spark-free
ceiling for this exact workload.

Usage:
  python tools/search_probe.py build        # build+package once (32 cores)
  python tools/search_probe.py spark 1 4    # measure Spark levels
  python tools/search_probe.py bare 1 4     # measure bare-mp levels
The package dict is persisted to /tmp so the measure steps run in fresh
processes without rebuilding.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG_JSON = "/tmp/jass_search_probe_pkg.json"
AMPLIFY = int(os.environ.get("PROBE_AMPLIFY", "128"))
N_QUERIES = int(os.environ.get("PROBE_QUERIES", "12000"))


def _queries(n):
    from bench import gen_queries

    return gen_queries(n)


def build():
    from bench import materialized_corpus
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.saat import package_index
    from jassv2_spark.session import get_spark

    spark = get_spark(app_name="probe-build", cores=32)
    docs = materialized_corpus(spark, "/root/testdata/sf0.1", AMPLIFY, 32)
    idx = build_index(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
                      conf=BuildConf(tokenizer="parity"))
    pkg = package_index(idx)
    out = dict(pkg)
    out["buckets"] = sorted(pkg["buckets"])
    with open(PKG_JSON, "w") as f:
        json.dump(out, f)
    print("packaged:", out["dir"], "postings:", out["n_postings"])
    spark.stop()


def _load_pkg():
    with open(PKG_JSON) as f:
        pkg = json.load(f)
    pkg["buckets"] = frozenset(pkg["buckets"])
    return pkg


def spark_level(cores: int) -> dict:
    from jassv2_spark.operators import saat
    from jassv2_spark.session import get_spark

    spark = get_spark(app_name=f"probe-{cores}", cores=cores)
    pkg = _load_pkg()

    class FakeIdx:  # saat_search only touches .spark via queries + pkg
        pass

    idx = FakeIdx()
    warm = spark.createDataFrame(_queries(512), ["query_id", "query"])
    saat.saat_search(idx, warm, k=10, package=pkg).count()
    qdf = spark.createDataFrame(_queries(N_QUERIES), ["query_id", "query"])
    best = {}
    for _ in range(2):
        t0 = time.perf_counter()
        saat.saat_search(idx, qdf, k=10, package=pkg).count()
        best["wall_search"] = min(best.get("wall_search", 9e9), time.perf_counter() - t0)
        t0 = time.perf_counter()
        stats = saat.saat_search_stats(idx, qdf, k=10, package=pkg)
        from pyspark.sql import functions as F

        usec = stats.agg(F.sum("usec")).collect()[0][0]
        best_w = time.perf_counter() - t0
        if best.get("wall_stats", 9e9) > best_w:
            best["wall_stats"] = best_w
            best["kernel_sec"] = usec / 1e6
    spark.stop()
    return {"cores": cores, **{k: round(v, 3) for k, v in best.items()}}


def _bare_worker(args):
    qs, k = args
    from jassv2_spark.operators.saat import _search_one

    pkg = _load_pkg()
    t0 = time.perf_counter()
    n = 0
    for _qid, qtext in qs:
        r, _ = _search_one(pkg, qtext, k, 1.0, None)
        n += len(r)
    return time.perf_counter() - t0, n


def bare_level(procs: int) -> dict:
    qs = _queries(N_QUERIES)
    chunks = [qs[i::procs] for i in range(procs)]
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_bare_worker, [(c[:64], 10) for c in chunks])  # warm
        t0 = time.perf_counter()
        res = pool.map(_bare_worker, [(c, 10) for c in chunks])
        wall = time.perf_counter() - t0
    return {
        "procs": procs,
        "wall": round(wall, 3),
        "worker_sec": [round(r[0], 3) for r in res],
    }


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "build":
        build()
    elif mode == "spark":
        for c in sys.argv[2:]:
            print(json.dumps(spark_level(int(c))), flush=True)
    elif mode == "bare":
        for c in sys.argv[2:]:
            print(json.dumps(bare_level(int(c))), flush=True)
