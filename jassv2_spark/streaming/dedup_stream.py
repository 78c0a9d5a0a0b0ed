"""Stateful streaming exact-dedup: first-occurrence filter over a document
stream, the ingest-side guard of a training-data pipeline.

A batch engine dedups with a hash-groupBy (`operators/dedup.py`); on a
continuous ingest that becomes a STATEFUL streaming operator — the set of
already-seen content hashes must persist across micro-batches. Spark's
primitive for custom stateful logic is ``applyInPandasWithState``
(Arrow-batched, grouped state): we group by ``md5(text)`` and keep one
tiny state row per distinct content hash (first-seen doc id, duplicates
seen). Only a hash's FIRST occurrence is emitted downstream, so the
streamed output feeds the incremental index build pre-deduplicated.

Scale: state is keyed by a uniformly-distributed 128-bit digest —
skew-free shuffle, state size = one small row per distinct document
(RocksDB state store holds billions); the payload `text` never enters
state, only the digest and ids do.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "text_hash string, doc_id long, text string"
STATE_SCHEMA = "first_id long, n_dups long"


def _first_occurrence(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first row ever seen for this content hash; count the rest."""
    if state.exists:
        first_id, n_dups = state.get
        emit = []
    else:
        first_id, n_dups = None, 0
        emit = None  # becomes the first row below
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("doc_id")
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if first_id is None:
                first_id = int(doc_id)
                rows.append((key[0], int(doc_id), text))
            else:
                n_dups += 1
    state.update((first_id, n_dups))
    yield pd.DataFrame(rows, columns=["text_hash", "doc_id", "text"])


def dedup_stream(
    docs_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming DataFrame of first occurrences: (text_hash, doc_id, text).

    Exactly one output row per distinct content ever seen on the stream;
    later duplicates only bump the state counter. Downstream is typically
    ``incremental.ingest_stream`` (index build over unique docs only)."""
    hashed = docs_stream.select(
        F.md5(F.col(text_col).cast("binary")).alias("text_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_occurrence,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
