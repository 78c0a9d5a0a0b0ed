"""Streaming ingest + finalize: the incremental index must equal the batch
index built over the same documents."""

import os

from jassv2_spark.fixtures import synthetic_corpus, synthetic_queries
from jassv2_spark.operators.build import build_index
from jassv2_spark.operators.search import search
from jassv2_spark.streaming.incremental import finalize, ingest_stream


def test_stream_ingest_equals_batch(spark, tmp_path):
    rows = synthetic_corpus(120)
    src = str(tmp_path / "src")
    out = str(tmp_path / "stream_idx")
    # write source docs as 3 parquet files → 3 ingest units
    docs = spark.createDataFrame(
        [(i + 1, rows[i]["text"]) for i in range(len(rows))], ["doc_id", "text"]
    )
    docs.repartition(3).write.parquet(src)

    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = ingest_stream(stream, out, trigger_available_now=True)
    q.awaitTermination(120)

    # streamed counts must equal batch counts
    streamed = spark.read.parquet(os.path.join(out, "counts_stream"))
    idx_b = build_index(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id", cache=False)
    got = {
        (r["doc_id"], r["term"]): r["cnt"]
        for r in streamed.groupBy("doc_id", "term").sum("cnt").withColumnRenamed("sum(cnt)", "cnt").collect()
    }
    want = {(r["doc_id"], r["term"]): r["tf"] for r in idx_b.postings.collect()}
    assert got == want

    # finalize → rank-identical search vs the batch index
    idx_s = finalize(spark, out)
    queries = synthetic_queries(6)
    qdf = spark.createDataFrame(queries, ["query_id", "query"])
    a = sorted(map(tuple, search(idx_s, qdf, k=10, with_keys=False).collect()))
    b = sorted(map(tuple, search(idx_b, qdf, k=10, with_keys=False).collect()))
    assert a == b


def test_stateful_dedup_stream(spark, tmp_path):
    """applyInPandasWithState dedup: exactly one emitted row per distinct
    content across micro-batches; re-sent duplicates are swallowed even
    when they arrive in a LATER batch than the original."""
    from jassv2_spark.streaming.dedup_stream import dedup_stream

    src = str(tmp_path / "dsrc")
    sink = str(tmp_path / "dsink")
    chk = str(tmp_path / "dchk")
    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon", "gamma delta", "zeta"]
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    # 3 files → 3 micro-batches (maxFilesPerTrigger=1); dup of doc 1 and 2
    # land in different batches than the originals
    df.where("doc_id in (1, 2)").coalesce(1).write.mode("append").parquet(src)
    df.where("doc_id in (3, 4)").coalesce(1).write.mode("append").parquet(src)
    df.where("doc_id in (5, 6)").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(sink).collect()
    )
    # first occurrence per content: docs 1, 2, 4, 6 (3 and 5 are dups)
    assert out == [(1, "alpha beta"), (2, "gamma delta"), (4, "epsilon"), (6, "zeta")]
