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
