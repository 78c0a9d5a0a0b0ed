"""Separate-JVM scaling corroboration: the N→4N pair on a real Spark
STANDALONE cluster on this box (round-4 verdict item #2).

All scaling evidence so far ran in local[N] mode — one JVM whose thread
scheduling could, in principle, flatter or hurt the ratio. This harness
starts a standalone master plus N single-core WORKER JVMs (each hosting
its own single-core executor JVM + its own Python worker), runs the same
build + SaaT-serve workload as bench.py's scaling levels against
spark://…, and reports the same efficiency — so the N→4N claim rests on
genuinely separate executor processes, the shape a multi-node cluster
has.

Per-executor density is constant (1 core, fixed memory) across the two
cluster sizes, mirroring how a real N→4N scale-out adds machines.

Usage:
  python tools/standalone_scaling.py            # lo=1, hi=4 workers
  BENCH_SCALE_AMPLIFY=128 BENCH_SCALE_QUERIES=12000 ...

Prints one JSON line: {"mode": "standalone", "sec_lo": …, "sec_hi": …,
"efficiency": …, "phases_lo": …, "phases_hi": …}.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark

JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
HOST = "127.0.0.1"
AMPLIFY = int(os.environ.get("BENCH_SCALE_AMPLIFY", "128"))
N_QUERIES = int(os.environ.get("BENCH_SCALE_QUERIES", "12000"))
LO = int(os.environ.get("BENCH_SCALE_LO", "1"))
HI = 4 * LO
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind((HOST, 0))
        return s.getsockname()[1]


def _java() -> str:
    jh = os.environ.get("JAVA_HOME")
    return os.path.join(jh, "bin", "java") if jh else "java"


def _shadow_spark_home() -> str:
    """pip-installed pyspark has no RELEASE marker, so a standalone worker
    treats SPARK_HOME as a dev tree and dies with 'Cannot find any build
    directories' when launching executors. A /tmp shadow home symlinking
    the package's jars/bin (+ a RELEASE file) plus SPARK_SCALA_VERSION in
    the worker env fixes executor launch."""
    pkg = os.path.dirname(pyspark.__file__)
    home = "/tmp/jass_spark_home"
    if not os.path.isfile(os.path.join(home, "RELEASE")):
        os.makedirs(home, exist_ok=True)
        for d in ("jars", "bin", "data", "licenses", "conf"):
            src, dst = os.path.join(pkg, d), os.path.join(home, d)
            if os.path.exists(src) and not os.path.exists(dst):
                os.symlink(src, dst)
        with open(os.path.join(home, "RELEASE"), "w") as f:
            f.write("Spark (pip pyspark shadow for standalone workers)\n")
    return home


def _spawn(cls: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["SPARK_HOME"] = _shadow_spark_home()
    env["SPARK_SCALA_VERSION"] = "2.13"
    return subprocess.Popen(
        [_java(), "-Xmx1g", "-cp", JARS, cls, *args],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        preexec_fn=os.setsid, env=env,
    )


def run_level(workers: int, master_url: str) -> dict:
    from bench import amplified_docs, gen_queries, materialized_corpus
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.saat import package_index, saat_search
    from jassv2_spark.session import get_spark

    spark = get_spark(
        app_name=f"standalone-{workers}",
        cores=workers,
        master=master_url,
        extra_conf={
            "spark.executor.cores": "1",
            "spark.executor.memory": os.environ.get("STANDALONE_EXEC_MEM", "5g"),
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.cores.max": str(workers),
        },
    )
    # wait until every worker contributed an executor
    deadline = time.time() + 120
    while spark.sparkContext.defaultParallelism < workers and time.time() < deadline:
        time.sleep(1)
    assert spark.sparkContext.defaultParallelism >= workers, "executors missing"

    conf = BuildConf(tokenizer="parity")
    warm_docs = amplified_docs(spark, "/root/testdata/sf0.001", 1)
    warm_idx = build_index(warm_docs, text_col="text", key_col="doc_id",
                           doc_id_col="doc_id", conf=conf)
    wq = spark.createDataFrame(gen_queries(8), ["query_id", "query"])
    saat_search(warm_idx, wq, k=10).count()
    warm_idx.unpersist()

    docs = materialized_corpus(spark, SF_DIR, AMPLIFY, workers)
    phases: dict[str, float] = {}
    from pyspark.sql import functions as F

    idx = None
    best = float("inf")
    for _ in range(2):
        if idx is not None:
            idx.unpersist()
        t0 = time.perf_counter()
        idx = build_index(docs, text_col="text", key_col="doc_id",
                          doc_id_col="doc_id", conf=conf)
        idx.term_stats.agg(F.sum("n_segments")).collect()
        best = min(best, time.perf_counter() - t0)
    phases["build"] = best

    qdf = spark.createDataFrame(gen_queries(N_QUERIES), ["query_id", "query"])
    t0 = time.perf_counter()
    pkg = package_index(idx)
    warm = spark.createDataFrame(gen_queries(512, seed=99), ["query_id", "query"])
    saat_search(idx, warm, k=10, package=pkg).count()
    phases["package"] = time.perf_counter() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        saat_search(idx, qdf, k=10, package=pkg).count()
        best = min(best, time.perf_counter() - t0)
    phases["search_saat"] = best
    n_docs = idx.n_docs
    idx.unpersist()
    spark.stop()
    return {"workers": workers, "n_docs": n_docs,
            "phases": {k: round(v, 3) for k, v in phases.items()}}


def cluster(workers: int) -> dict:
    """Start master + N worker JVMs, run the level, tear down."""
    port = _free_port()
    url = f"spark://{HOST}:{port}"
    procs = [_spawn("org.apache.spark.deploy.master.Master",
                    "--host", HOST, "--port", str(port),
                    "--webui-port", str(_free_port()))]
    time.sleep(4)
    for _ in range(workers):
        procs.append(_spawn("org.apache.spark.deploy.worker.Worker", url,
                            "--cores", "1",
                            "--memory", os.environ.get("STANDALONE_WORKER_MEM", "6g"),
                            "--webui-port", str(_free_port())))
    time.sleep(4)
    try:
        return run_level(workers, url)
    finally:
        for p in reversed(procs):
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except Exception:
                pass


def main() -> None:
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    lo = cluster(LO)
    hi = cluster(HI)
    par = ("build", "search_saat")
    t_lo = sum(lo["phases"][p] for p in par)
    t_hi = sum(hi["phases"][p] for p in par)
    print(json.dumps({
        "mode": "standalone-separate-jvm",
        "workers_lo": LO, "workers_hi": HI,
        "amplify": AMPLIFY, "n_docs": lo["n_docs"], "n_queries": N_QUERIES,
        "sec_lo": round(t_lo, 3), "sec_hi": round(t_hi, 3),
        "phases_lo": lo["phases"], "phases_hi": hi["phases"],
        "speedup": round(t_lo / t_hi, 3),
        "efficiency": round((t_lo / t_hi) / (HI / LO), 3),
    }))


if __name__ == "__main__":
    main()
