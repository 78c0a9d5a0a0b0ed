"""Incremental (streaming) index ingest.

The reference is strictly batch (SURVEY.md §2.10) — its "anytime" is a
query-latency budget, not stream processing. For a web-scale pipeline we
add what JASS cannot do: continuous ingest of new documents into the
tf-counts table via Structured Streaming, with the impact-quantized segment
build as a periodic batch *finalize* step. That split is forced by the
math: uniform quantization needs the GLOBAL BM25 min/max
(`source/quantize.h:108-136`), so impacts are only final over a closed
snapshot — exactly why this is foreachBatch-append + batch-rebuild rather
than a fully streaming aggregation.

  ingest_stream(...)  docs stream → tokenize → (doc_id, term, cnt) append
  finalize(...)       counts snapshot → impacts → segments (reuses the
                      checkpointed batch stages from plans/persist.py)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from jassv2_spark.functions.tokenizer import spark_tokens
from jassv2_spark.operators.build import BuildConf


def ingest_stream(
    docs_stream: DataFrame,
    out_dir: str,
    *,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    tokenizer: str = "parity",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query appending per-batch (doc_id, term, cnt) rows
    to <out>/counts_stream and (doc_id, dl) to <out>/doc_lengths_stream.

    Each micro-batch is tokenized with the same vectorized tokenizer as the
    batch build; counts are additive across batches because each document
    arrives exactly once (dedupe upstream via dedup.exact_duplicates)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.select(
                F.col(doc_id_col).cast("long").alias("doc_id"),
                F.explode(spark_tokens(text_col, mode=tokenizer, xml=True)).alias("term"),
            )
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        counts.write.mode("append").parquet(os.path.join(out_dir, "counts_stream"))
        counts.groupBy("doc_id", "batch_id").agg(F.sum("cnt").alias("dl")).write.mode(
            "append"
        ).parquet(os.path.join(out_dir, "doc_lengths_stream"))

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize(spark: SparkSession, out_dir: str, conf: BuildConf | None = None):
    """Close the current snapshot: quantize + segment the streamed counts.

    Feeds the snapshot into the checkpointed batch pipeline
    (plans/persist.py) as its pre-built "counts"/"doc_map" stages, so every
    downstream stage (stats → impacts → segments → vocab metadata) is the
    SAME code the batch build runs. Rerunnable; each finalize rebuilds the
    snapshot's quantization (global min/max must see everything)."""
    import shutil

    from jassv2_spark.plans import persist as P

    final_dir = os.path.join(out_dir, "final")
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)
    os.makedirs(final_dir, exist_ok=True)

    streamed = spark.read.parquet(os.path.join(out_dir, "counts_stream"))
    # collapse multi-batch arrivals (a doc re-sent across batches sums)
    counts = streamed.groupBy("doc_id", "term").agg(F.sum("cnt").alias("cnt"))
    P._write_stage(counts, final_dir, "counts", lineage_key="term")
    doc_map = counts.select("doc_id").distinct().select(
        "doc_id", F.col("doc_id").cast("string").alias("key"),
        F.lit(None).cast("string").alias("text"),
    )
    P._write_stage(doc_map, final_dir, "doc_map", lineage_key="doc_id")

    # docs arg is unused once doc_map+counts stages exist; pass doc_map
    return P.build_index_persisted(
        doc_map, final_dir, text_col="text", key_col="key", doc_id_col="doc_id",
        conf=conf or BuildConf(),
    )
