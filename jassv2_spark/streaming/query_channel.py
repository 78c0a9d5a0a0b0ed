"""Socket query channel: continuous top-k serving over a TCP line stream.

The reference's `channel_socket` (`source/channel_socket.h`, used by the
interactive/CGI front ends) reads query lines from a TCP connection and
writes results back. Spark-first, a query CHANNEL is a Structured
Streaming source: `readStream.format("socket")` delivers lines, each
micro-batch flows through the SAME Arrow-batched SaaT kernel the batch
path uses (`operators/saat._search_one` under mapInPandas — the packaged
index rides a broadcast, so every micro-batch serves against the shared
mmap shards with zero per-batch load cost), and results go to any
streaming sink. Line protocol matches the reference's query files:
``<query-id> <term> <term> ...``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from jassv2_spark.operators.build import Index
from jassv2_spark.operators.saat import _search_one, package_index

RESULT_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("rsv", LongType(), False),
        StructField("rank", LongType(), False),
    ]
)


def socket_query_channel(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """Streaming (query_id, query) from TCP lines ``<id> <terms...>``
    (`source/channel_socket.h` analogue; same line shape as `-q` files)."""
    lines = spark.readStream.format("socket").option("host", host).option("port", port).load()
    qid = F.split(F.col("value"), " ", 2)
    return lines.where(F.trim("value") != "").select(
        qid.getItem(0).alias("query_id"),
        F.coalesce(qid.getItem(1), F.lit("")).alias("query"),
    ).where(F.col("query") != "")


def serve_query_stream(
    index: Index,
    queries_stream: DataFrame,
    k: int = 10,
    rho: float = 1.0,
    package: dict | None = None,
    tokenizer: str | None = None,
) -> DataFrame:
    """Streaming results (query_id, doc_id, rsv, rank) for a streaming
    (query_id, query) frame — every micro-batch runs the SaaT kernel
    against the broadcast-packaged index. Attach any sink:
    ``serve_query_stream(...).writeStream.format("memory")...``."""
    spark = queries_stream.sparkSession
    pkg = package if package is not None else package_index(index)
    bpkg = spark.sparkContext.broadcast(pkg)
    raw = tokenizer == "raw"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = bpkg.value
        for pdf in batches:
            out = []
            for qid, qtext in zip(pdf["query_id"], pdf["query"]):
                ranked, _ = _search_one(p, qtext, k, rho, None, raw=raw)
                for rank, (doc, rsv) in enumerate(ranked, start=1):
                    out.append((qid, doc, rsv, rank))
            yield pd.DataFrame(out, columns=["query_id", "doc_id", "rsv", "rank"])

    return queries_stream.mapInPandas(run, schema=RESULT_SCHEMA)
