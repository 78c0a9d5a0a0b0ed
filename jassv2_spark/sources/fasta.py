"""FASTA genome ingest: record splitting and DNA k-mer tokenization.

Spark-first re-expression of the reference's genomics path:

- split_fasta_documents — records are delimited by a ``\\n>`` boundary
  (`source/instream_document_fasta.cpp:96-141`): contents run from the
  record's ``>`` through (and including) the newline before the next
  ``>``; the primary key is the whole first line, whitespace-trimmed
  (keys may themselves contain further ``>`` characters — boundary is
  newline-anchored, see the reference unittest's example_3_key).
- kmer_tokens / fasta_token_counts — the parser_fasta semantics
  (`source/parser_fasta.cpp:24-86` + unittest at :92): the HEADER line is
  parsed as ordinary text (alpha/numeric tokens, normalized); the
  remaining SEQUENCE is lowercased, ASCII whitespace is skipped (it does
  NOT break a k-mer), any non-DNA-base character ({ACGTacgt}) invalidates
  every k-mer containing it, and every window of ``k`` consecutive bases
  inside a valid run is a token — i.e. strip whitespace, split on
  non-bases, slide a k-window per run.
- build_fasta_index — k-mer counts → the standard impact-ordered build
  (the reference routes parser_fasta output into the same indexer,
  `tools/JASS_index.cpp` parser selection).

Reference golden (parser_fasta.cpp unittest): k=5 over
``>NR_118889.1\\nG GTC\\nTTA TAxGxxGATTCAx`` yields header tokens
nr/118889/1 and k-mers ggtct gtctt tctta cttat ttata gattc attca.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from jassv2_spark.functions.tokenizer import tokenize

_RECORD_SPLIT = re.compile(r"\n(?=>)")
_NON_BASE = re.compile(r"[^acgt]")
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

_DOC_SCHEMA = StructType(
    [
        StructField("primary_key", StringType(), True),
        StructField("contents", StringType(), True),
    ]
)


def _split_fasta(text: str) -> list[tuple[str, str]]:
    start = text.find(">")
    if start < 0:
        return []
    parts = _RECORD_SPLIT.split(text[start:])
    out = []
    for i, rec in enumerate(parts):
        # the boundary newline belongs to the record before it
        # ("the end of line marker matters", instream_document_fasta.cpp:115)
        contents = rec + "\n" if i < len(parts) - 1 else rec
        key = rec.split("\n", 1)[0].strip()
        out.append((key or "Unknown", contents))
    return out


def split_fasta_documents(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Rows of raw FASTA text → one row per record (primary_key, contents)."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                text = blob.decode("utf-8", "replace") if isinstance(blob, bytes) else blob
                rows.extend(_split_fasta(text))
            yield pd.DataFrame(rows, columns=["primary_key", "contents"])

    return blobs.mapInPandas(split, schema=_DOC_SCHEMA)


def kmer_tokens(contents: str | None, k: int = 5) -> list[str]:
    """parser_fasta token stream: header text tokens, then sequence k-mers."""
    if contents is None:
        return []
    header, _, sequence = contents.partition("\n")
    toks = tokenize(header, xml=True)
    seq = _ASCII_WS.sub("", sequence).lower()
    for run in _NON_BASE.split(seq):
        if len(run) >= k:
            toks.extend(run[i : i + k] for i in range(len(run) - k + 1))
    return toks


def fasta_token_counts(docs: DataFrame, k: int = 5, contents_col: str = "contents",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, cnt, dl) from FASTA records — the counts shape
    consumed by build_index_from_counts (same fused map-only pass as the
    web build: no token-occurrence shuffle)."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("term", StringType(), False),
            StructField("cnt", LongType(), False),
            StructField("dl", LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, contents in zip(pdf[id_col], pdf[contents_col]):
                toks = kmer_tokens(contents, k)
                c = Counter(toks)
                dl = len(toks)
                rows.extend((int(did), t, n, dl) for t, n in c.items())
            yield pd.DataFrame(rows, columns=["doc_id", "term", "cnt", "dl"])

    return docs.select(id_col, contents_col).mapInPandas(run, schema=schema)


def build_fasta_index(docs: DataFrame, k: int = 5, contents_col: str = "contents",
                      key_col: str = "primary_key", conf=None):
    """FASTA records → impact-ordered k-mer index (searchable with k-mer
    queries through the ordinary serve paths)."""
    from pyspark.sql import functions as F

    from jassv2_spark.operators.build import BuildConf, build_index_from_counts
    from jassv2_spark.sources.docids import assign_doc_ids

    with_ids = assign_doc_ids(docs, key_col=key_col, out_col="doc_id")
    doc_map = with_ids.select("doc_id", F.col(key_col).cast("string").alias("key"))
    n_docs = with_ids.count()
    counts = fasta_token_counts(with_ids, k=k, contents_col=contents_col)
    return build_index_from_counts(counts, doc_map, n_docs, conf=conf or BuildConf())
