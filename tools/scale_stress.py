"""Build-layout scale stress (round-3 verdict #7): one big build at
local[32] over an amplified corpus whose VOCABULARY is widened ~an order
of magnitude (amplified replicas rewrite their tokens with a
rep-prefixed variant for a slice of replicas), recording docs/s, the
segment-shard fill distribution, and the largest single shuffle group —
the quantity the df-adaptive shard cap bounds (a shard's doc_ids list IS
one task's collect_list group; without the cap a Zipf-head (term,
impact) group would be df-sized).

Prints one JSON line; BASELINE.md records the result.

Env: STRESS_AMPLIFY (default 64), STRESS_VOCAB_REWRITE (default 4 — one
in 4 replicas rewrites its vocab), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("STRESS_AMPLIFY", "64"))
VOCAB_REWRITE = int(os.environ.get("STRESS_VOCAB_REWRITE", "4"))


def main() -> None:
    from pyspark.sql import functions as F

    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.session import get_spark

    spark = get_spark(app_name="jassv2-scale-stress", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    par = spark.sparkContext.defaultParallelism
    reps = spark.range(AMPLIFY).select(F.col("id").alias("rep"))
    amplified = docs.repartition(par).crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * F.lit(n0)).alias("doc_id"),
        # every VOCAB_REWRITE-th replica prefixes each token with a
        # PURE-LETTER rep tag (the parity tokenizer splits alpha/digit
        # runs, so a digit-bearing prefix would fragment and not widen
        # the vocabulary): rep 7 -> "qah" + token, merging with the
        # token's leading alpha run — vocabulary grows
        # ~AMPLIFY/VOCAB_REWRITE-fold while per-doc lengths and the Zipf
        # shape stay put
        F.when(
            (F.col("rep") % VOCAB_REWRITE == 0) & (F.col("rep") > 0),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(
                        F.lit("q"),
                        F.chr(F.lit(97) + (F.col("rep") / 26).cast("int") % 26),
                        F.chr(F.lit(97) + F.col("rep") % 26),
                        x,
                    ),
                ),
                " ",
            ),
        ).otherwise(F.col("text")).alias("text"),
    )

    conf = BuildConf(tokenizer="parity")
    t0 = time.perf_counter()
    idx = build_index(amplified, text_col="text", key_col="doc_id",
                      doc_id_col="doc_id", conf=conf)
    n_segments = idx.segments.count()
    idx.seg_stats.count()
    idx.term_stats.count()
    build_sec = time.perf_counter() - t0

    fill = idx.segments.select("part_freq")
    qs = fill.approxQuantile("part_freq", [0.5, 0.9, 0.99, 1.0], 0.0)
    stats = fill.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("part_freq").alias("postings"),
        F.max("part_freq").alias("max_fill"),
    ).collect()[0]
    vocab = idx.term_stats.count()
    n_docs = idx.n_docs

    out = {
        "probe": "build_scale_stress",
        "sf": SF_DIR,
        "amplify": AMPLIFY,
        "cpus": CPUS,
        "n_docs": n_docs,
        "vocab_terms": vocab,
        "n_postings": int(stats["postings"]),
        "n_segment_rows": n_segments,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "shard_fill": {
            "p50": int(qs[0]), "p90": int(qs[1]), "p99": int(qs[2]),
            "max": int(qs[3]),
        },
        "shard_cap": int(conf.shard_size),
        "max_group_vs_cap": round(stats["max_fill"] / conf.shard_size, 3),
    }
    print(json.dumps(out))
    idx.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
