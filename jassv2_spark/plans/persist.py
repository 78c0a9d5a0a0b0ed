"""Checkpoint-resumable persisted index build with per-partition lineage.

north_rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". The build is a linear chain of stages; EVERY stage
reads only the previous stage's checkpointed parquet, so a build killed at
any point resumes by skipping exactly the stages whose completion markers
exist:

  doc_map      documents → dense doc ids               (<out>/doc_map)
  counts       tokenize → (doc_id, term, cnt)          (<out>/counts)
  doc_lengths  Σcnt per doc                            (<out>/doc_lengths)
  stats        N, collection length, mean dl           (<out>/stats.json)
  impacts      BM25 → global min/max → quantize        (<out>/impacts)
  segments     impact-ordered shard rows, term-bucket-partitioned
  seg_stats / term_stats

Per stage: parquet data, `_checkpoints/<stage>.json` marker (rows, wall
sec), `_lineage/<stage>/` per-partition lineage (partition_id, rows,
min/max key hash). The layout replaces JASS v1's four binary files
(`source/serialise_jass_v1.h:43-68`): `segments/` term-bucket partitioning
+ parquet min/max stats replace the CIvocab.bin binary search
(`source/deserialised_jass_v1.h:311-334`); `doc_map/` replaces
CIdoclist.bin. The reference build itself is single-process with no resume
(`tools/JASS_index.cpp:270-404`) — at 10^12 docs checkpointing is the point.
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jassv2_spark.operators.build import (
    LARGEST_IMPACT,
    MAX_TF,
    SMALLEST_IMPACT,
    BuildConf,
    Index,
    build_segments,
)
from jassv2_spark.functions.tokenizer import spark_tokens
from jassv2_spark.sources.docids import assign_doc_ids

N_TERM_BUCKETS = 64
STAGES = ["doc_map", "counts", "doc_lengths", "stats", "impacts", "segments", "seg_stats", "term_stats"]


def _marker_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_checkpoints", f"{stage}.json")


def stage_done(out_dir: str, stage: str) -> bool:
    p = _marker_path(out_dir, stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return bool(json.load(f).get("complete"))
    except (json.JSONDecodeError, OSError):
        return False


def _mark(out_dir: str, stage: str, rows: int, wall: float, extra: dict | None = None) -> None:
    os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)
    payload = {
        "stage": stage,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "complete": True,
        "finished_at": time.time(),
    }
    payload.update(extra or {})
    with open(_marker_path(out_dir, stage), "w") as f:
        json.dump(payload, f)


def _write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    partition_by: list[str] | None = None,
    lineage_key: str | None = None,
    extra: dict | None = None,
) -> None:
    """Write stage parquet + per-partition lineage + completion marker."""
    spark = df.sparkSession
    path = os.path.join(out_dir, stage)
    t0 = time.perf_counter()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)

    # lineage reflects on-disk truth: re-read what was written
    written = spark.read.parquet(path)
    key = lineage_key or written.columns[0]
    lineage = written.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows"),
        F.min(F.hash(key)).alias("min_key_hash"),
        F.max(F.hash(key)).alias("max_key_hash"),
    )
    lineage.write.mode("overwrite").parquet(os.path.join(out_dir, "_lineage", stage))
    rows = written.count()
    _mark(out_dir, stage, rows, time.perf_counter() - t0, extra)


def build_metrics(out_dir: str) -> dict:
    """All stage markers (rows / wall sec per stage) — the build metrics."""
    cdir = os.path.join(out_dir, "_checkpoints")
    out = {}
    if os.path.isdir(cdir):
        for fn in sorted(os.listdir(cdir)):
            if fn.endswith(".json"):
                with open(os.path.join(cdir, fn)) as f:
                    out[fn[:-5]] = json.load(f)
    return out


def lineage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage", stage))


def build_index_persisted(
    docs: DataFrame,
    out_dir: str,
    *,
    text_col: str = "text",
    key_col: str = "url",
    doc_id_col: str | None = None,
    conf: BuildConf | None = None,
    fail_after: str | None = None,  # test hook: raise after this stage completes
) -> Index:
    """Stage-checkpointed build; kill anywhere, rerun with the same args to
    resume from the last completed stage."""
    conf = conf or BuildConf()
    spark = docs.sparkSession
    nparts = conf.num_partitions or spark.sparkContext.defaultParallelism
    os.makedirs(out_dir, exist_ok=True)

    def _chk(stage: str):
        if fail_after == stage:
            raise RuntimeError(f"injected failure after stage {stage}")

    # -- stage: doc_map (dense ids) ------------------------------------
    if not stage_done(out_dir, "doc_map"):
        if doc_id_col is None:
            with_ids = assign_doc_ids(docs, key_col=key_col, out_col="doc_id", num_partitions=nparts)
        else:
            with_ids = docs.withColumn("doc_id", F.col(doc_id_col).cast("long"))
        doc_map_full = with_ids.select(
            "doc_id", F.col(key_col).cast("string").alias("key"), F.col(text_col).alias("text")
        )
        _write_stage(doc_map_full, out_dir, "doc_map", lineage_key="doc_id")
    _chk("doc_map")
    doc_map_full = spark.read.parquet(os.path.join(out_dir, "doc_map"))

    # -- stage: counts (the tokenizer pass) ------------------------------
    if not stage_done(out_dir, "counts"):
        tokens = doc_map_full.select(
            "doc_id", F.explode(spark_tokens("text", mode=conf.tokenizer, xml=True)).alias("term")
        )
        counts = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt"))
        _write_stage(counts, out_dir, "counts", lineage_key="term")
    _chk("counts")
    counts = spark.read.parquet(os.path.join(out_dir, "counts"))

    # -- stage: doc_lengths ----------------------------------------------
    if not stage_done(out_dir, "doc_lengths"):
        _write_stage(
            counts.groupBy("doc_id").agg(F.sum("cnt").alias("dl")),
            out_dir, "doc_lengths", lineage_key="doc_id",
        )
    _chk("doc_lengths")
    doc_lengths = spark.read.parquet(os.path.join(out_dir, "doc_lengths"))

    # -- stage: collection stats -----------------------------------------
    stats_path = os.path.join(out_dir, "stats.json")
    if not stage_done(out_dir, "stats"):
        t0 = time.perf_counter()
        # one driver action for both scalars (fused round trip — the same
        # fixed-cost discipline as build_index_from_counts' rollup)
        row = (
            doc_map_full.agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(doc_lengths.agg(F.coalesce(F.sum("dl"), F.lit(0)).alias("clen")))
            .collect()[0]
        )
        n_docs, clen = int(row["n"]), int(row["clen"])
        stats = {
            "n_docs": n_docs,
            "collection_length": int(clen),
            # Σlen/(slots-1), slot 0 unused ⇒ Σlen/N
            # (source/ranking_function_atire_bm25.h:65-69)
            "mean_doc_length": float(clen) / float(n_docs) if n_docs else 0.0,
            "k1": conf.k1,
            "b": conf.b,
            "tokenizer": conf.tokenizer,
            "stem": conf.stem,
            "n_term_buckets": N_TERM_BUCKETS,
        }
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        _mark(out_dir, "stats", 1, time.perf_counter() - t0)
    _chk("stats")
    with open(stats_path) as f:
        stats = json.load(f)

    # -- stage: impacts (BM25 + global min/max + quantize) ----------------
    if not stage_done(out_dir, "impacts"):
        t0 = time.perf_counter()
        scored = _scored_from_counts(spark, counts, doc_lengths, stats, conf).persist()
        mm = scored.agg(F.min("score").alias("lo"), F.max("score").alias("hi")).collect()[0]
        lo, hi = float(mm["lo"] or 0.0), float(mm["hi"] or 0.0)
        stats["min_rsv"], stats["max_rsv"] = lo, hi
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        if hi > lo:
            impact = (
                F.floor(
                    (F.col("score") - F.lit(lo)) / F.lit(hi - lo)
                    * F.lit(float(LARGEST_IMPACT - SMALLEST_IMPACT))
                ).cast("int")
                + F.lit(SMALLEST_IMPACT)
            )
        else:
            impact = F.lit(SMALLEST_IMPACT)
        _write_stage(
            scored.select("term", "doc_id", impact.alias("impact")),
            out_dir, "impacts", lineage_key="term",
        )
        scored.unpersist()
    _chk("impacts")
    impacts = spark.read.parquet(os.path.join(out_dir, "impacts"))

    # -- stage: segments (term-bucket-partitioned) ------------------------
    if not stage_done(out_dir, "segments"):
        seg_df = impacts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        segments = build_segments(
            impacts.join(seg_df, "term"), int(stats["n_docs"]), conf.shard_size
        ).withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
        )
        _write_stage(
            segments, out_dir, "segments", partition_by=["term_bucket"], lineage_key="term"
        )
    _chk("segments")
    segments = spark.read.parquet(os.path.join(out_dir, "segments"))

    # -- stages: vocab metadata -------------------------------------------
    if not stage_done(out_dir, "seg_stats"):
        _write_stage(
            segments.groupBy("term", "impact").agg(F.sum("part_freq").alias("seg_freq")),
            out_dir, "seg_stats", lineage_key="term",
        )
    _chk("seg_stats")
    if not stage_done(out_dir, "term_stats"):
        seg_stats = spark.read.parquet(os.path.join(out_dir, "seg_stats"))
        _write_stage(
            seg_stats.groupBy("term").agg(
                F.sum("seg_freq").alias("df"),
                F.max("impact").alias("max_impact"),
                F.count(F.lit(1)).alias("n_segments"),
            ),
            out_dir, "term_stats", lineage_key="term",
        )
    _chk("term_stats")

    return load_index_tables(spark, out_dir, conf=conf)


def _scored_from_counts(
    spark: SparkSession, counts: DataFrame, doc_lengths: DataFrame, stats: dict, conf: BuildConf
) -> DataFrame:
    """ATIRE BM25 from checkpointed counts (same math as operators/build)."""
    n, mean = stats["n_docs"], stats["mean_doc_length"]
    tf = counts.select(
        "doc_id", "term", F.least(F.col("cnt"), F.lit(MAX_TF)).cast("long").alias("tf")
    )
    term_df = counts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    df_vals = [r[0] for r in term_df.select("df").distinct().collect()]
    idf_map = F.broadcast(
        spark.createDataFrame([(int(d), math.log(n / d)) for d in df_vals], "df long, idf double")
    )
    k1, b = float(conf.k1), float(conf.b)
    tf_d = F.col("tf").cast("double")
    lc = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(mean))
    return (
        tf.join(doc_lengths, "doc_id")
        .join(term_df, "term")
        .join(idf_map, "df")
        .withColumn("score", F.col("idf") * ((tf_d * F.lit(k1 + 1.0)) / (tf_d + lc)))
    )


def save_index_tables(index: Index, out_dir: str, codec: str | None = None) -> None:
    """One-shot save of an in-memory Index (checkpoint markers included so
    the result is loadable and further builds skip everything).

    `codec`: None stores `doc_ids` as a raw array<long> (parquet's own
    dictionary/RLE/zstd applies — the default); 'vbyte' or 'qmx' stores
    delta+codec BinaryType, the JASS-v1-style layout
    (`source/serialise_jass_v1.cpp:114-170` d1 + codec encode)."""
    os.makedirs(out_dir, exist_ok=True)
    doc_map_full = index.doc_map.withColumn("text", F.lit(None).cast("string"))
    _write_stage(doc_map_full, out_dir, "doc_map", lineage_key="doc_id")
    _write_stage(index.doc_lengths, out_dir, "doc_lengths", lineage_key="doc_id")
    segments = index.segments
    if codec is not None:
        from jassv2_spark.functions.compression import make_encode_udf

        segments = segments.select(
            "term", "impact", "min_doc", "part_freq",
            make_encode_udf(codec)(F.col("doc_ids")).alias("doc_ids_enc"),
        )
    segments = segments.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
    )
    _write_stage(segments, out_dir, "segments", partition_by=["term_bucket"], lineage_key="term")
    _write_stage(index.seg_stats, out_dir, "seg_stats", lineage_key="term")
    _write_stage(index.term_stats, out_dir, "term_stats", lineage_key="term")
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(
            {
                "n_docs": index.n_docs,
                "collection_length": index.collection_length,
                "mean_doc_length": index.mean_doc_length,
                "min_rsv": index.min_rsv,
                "max_rsv": index.max_rsv,
                "k1": index.conf.k1,
                "b": index.conf.b,
                "tokenizer": index.conf.tokenizer,
                "stem": index.conf.stem,
                "codec": codec,
                # the layout's bucket count is part of the on-disk format:
                # readers must hash query terms with THIS value (ADVICE r1)
                "n_term_buckets": N_TERM_BUCKETS,
            },
            f,
        )


def load_index_tables(spark: SparkSession, out_dir: str, conf: BuildConf | None = None) -> Index:
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    conf = conf or BuildConf(
        k1=stats.get("k1", 0.9),
        b=stats.get("b", 0.4),
        tokenizer=stats.get("tokenizer", "parity"),
        stem=stats.get("stem", False),
    )
    segments = spark.read.parquet(os.path.join(out_dir, "segments"))
    codec = stats.get("codec")
    conf.codec = codec  # surfaced via Engine.get_encoding_scheme_name()
    if codec is not None and "doc_ids_enc" in segments.columns:
        from jassv2_spark.functions.compression import make_decode_udf

        segments = segments.select(
            "term", "impact", "min_doc", "part_freq",
            make_decode_udf(codec)(F.col("doc_ids_enc"), F.col("part_freq")).alias("doc_ids"),
            "term_bucket",
        )
    return Index(
        spark=spark,
        doc_map=spark.read.parquet(os.path.join(out_dir, "doc_map")).select("doc_id", "key"),
        doc_lengths=spark.read.parquet(os.path.join(out_dir, "doc_lengths")),
        postings=None,
        scored=None,
        impacts=None,
        segments=segments,
        seg_stats=spark.read.parquet(os.path.join(out_dir, "seg_stats")),
        term_stats=spark.read.parquet(os.path.join(out_dir, "term_stats")),
        n_docs=stats["n_docs"],
        collection_length=stats["collection_length"],
        mean_doc_length=stats["mean_doc_length"],
        min_rsv=stats.get("min_rsv", 0.0),
        max_rsv=stats.get("max_rsv", 0.0),
        conf=conf,
        # old saves predate the field; they were written with the then-
        # current constant, which has never changed, so fall back to it
        n_term_buckets=int(stats.get("n_term_buckets", N_TERM_BUCKETS)),
    )
