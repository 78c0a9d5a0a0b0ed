"""Document-stream sources: TREC <DOC>, WARC, TREC topics, uniCOIL JSON.

Spark-first equivalents of the reference's instream/channel family. The
reference streams bytes through a splitter chain; here each raw blob (one
file / one WARC member) is a row, and splitting is a `mapInPandas` over
blobs — embarrassingly parallel across files, which is how a 100 TB crawl
is actually laid out (many ~1 GB WARC files → many input splits).

- split_trec_documents: `<DOC>…</DOC>` with `<DOCNO>` keys
  (`source/instream_document_trec.cpp:83-190` semantics).
- split_warc_documents: WARC/x.y records, key = WARC-TREC-ID else
  WARC-Record-ID, body after the blank line, Content-Length honored
  (`source/instream_document_warc.cpp:19-108` semantics).
- parse_trec_topics: TREC `<top>` topics (`<num> … <title> …`) and ClueWeb
  `<topic number=…><query>` into a queries DataFrame
  (`source/channel_trec.cpp:36-130` semantics; tag letters q/t/d/n select
  which fields join the query text).
- read_unicoil_json: learned-sparse pre-quantized `{"id": …, "vector":
  {term: impact}}` lines → (key, term, impact)
  (`source/instream_document_unicoil_json.cpp:14-17` markers); feeds the
  quantize_none build path (`source/quantize_none.h`).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_DOC_SCHEMA = StructType(
    [
        StructField("primary_key", StringType(), True),
        StructField("contents", StringType(), True),
    ]
)

_DOC_RE = re.compile(r"<DOC>(.*?)</DOC>", re.DOTALL)
_DOCNO_RE = re.compile(r"<DOCNO>\s*(.*?)\s*</DOCNO>", re.DOTALL)


def split_trec_documents(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Rows of raw TREC-format text → one row per <DOC>."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                text = blob.decode("utf-8", "replace") if isinstance(blob, bytes) else blob
                for m in _DOC_RE.finditer(text):
                    body = m.group(1)
                    key_m = _DOCNO_RE.search(body)
                    rows.append((key_m.group(1) if key_m else None, body))
            yield pd.DataFrame(rows, columns=["primary_key", "contents"])

    return blobs.mapInPandas(split, schema=_DOC_SCHEMA)


_WARC_VERSION_RE = re.compile(r"^WARC/\d", re.MULTILINE)


def _parse_warc(text: str) -> list[tuple[str | None, str]]:
    out = []
    starts = [m.start() for m in _WARC_VERSION_RE.finditer(text)]
    starts.append(len(text))
    for s, e in zip(starts, starts[1:]):
        record = text[s:e]
        # Split at the EARLIEST blank line of either convention. Standard
        # WARC headers end with CRLF-CRLF, but an LF-LF sequence inside a
        # CRLF record's payload (common in HTML bodies) occurs later —
        # trying LF-LF first would land the split inside the body and parse
        # payload lines as WARC headers (instream_document_warc.cpp:60-75
        # scans header lines up to the first blank line only).
        i_crlf = record.find("\r\n\r\n")
        i_lf = record.find("\n\n")
        if i_crlf != -1 and (i_lf == -1 or i_crlf <= i_lf):
            head, body = record[:i_crlf], record[i_crlf + 4 :]
        elif i_lf != -1:
            head, body = record[:i_lf], record[i_lf + 2 :]
        else:
            head, body = record, ""
        headers = {}
        for line in head.splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        key = headers.get("warc-trec-id") or headers.get("warc-record-id")
        try:
            clen = int(headers.get("content-length", ""))
            body = body[:clen]
        except ValueError:
            pass
        if headers.get("warc-type", "response") == "warcinfo":
            continue
        out.append((key, body))
    return out


def split_warc_documents(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Rows of raw WARC text → one row per response record."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                text = blob.decode("utf-8", "replace") if isinstance(blob, bytes) else blob
                rows.extend(_parse_warc(text))
            yield pd.DataFrame(rows, columns=["primary_key", "contents"])

    return blobs.mapInPandas(split, schema=_DOC_SCHEMA)


_TOPIC_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), True),
        StructField("query", StringType(), True),
    ]
)

_TOP_RE = re.compile(r"<top>(.*?)</top>", re.DOTALL | re.IGNORECASE)
_NUM_RE = re.compile(r"<num>[^0-9]*(\d+)", re.IGNORECASE)
_FIELD_RES = {
    "t": re.compile(r"<title>\s*(?:Topic:)?\s*(.*?)\s*(?=<|$)", re.DOTALL | re.IGNORECASE),
    "d": re.compile(r"<desc>\s*(?:Description:)?\s*(.*?)\s*(?=<|$)", re.DOTALL | re.IGNORECASE),
    "n": re.compile(r"<narr>\s*(?:Narrative:)?\s*(.*?)\s*(?=<|$)", re.DOTALL | re.IGNORECASE),
}
_CLUEWEB_RE = re.compile(
    r'<topic[^>]*number\s*=\s*"?(\d+)"?[^>]*>(.*?)</topic>', re.DOTALL | re.IGNORECASE
)
_QUERY_RE = re.compile(r"<query>\s*(.*?)\s*</query>", re.DOTALL | re.IGNORECASE)


def parse_trec_topics(blobs: DataFrame, blob_col: str = "blob", tag: str = "t") -> DataFrame:
    """TREC/ClueWeb topic files → (query_id, query). `tag` selects fields
    like the reference's -q[tdn] letters (q = ClueWeb <query>)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                if blob is None:
                    continue
                text = blob.decode("utf-8", "replace") if isinstance(blob, bytes) else blob
                for m in _TOP_RE.finditer(text):
                    body = m.group(1)
                    num = _NUM_RE.search(body)
                    parts = []
                    for letter, rex in _FIELD_RES.items():
                        if letter in tag:
                            fm = rex.search(body)
                            if fm:
                                parts.append(fm.group(1).strip())
                    if num:
                        rows.append((num.group(1), " ".join(parts)))
                for m in _CLUEWEB_RE.finditer(text):
                    if "q" in tag or "t" in tag:
                        qm = _QUERY_RE.search(m.group(2))
                        if qm:
                            rows.append((m.group(1), qm.group(1).strip()))
            yield pd.DataFrame(rows, columns=["query_id", "query"])

    return blobs.mapInPandas(parse, schema=_TOPIC_SCHEMA)


def read_unicoil_json(lines: DataFrame, json_col: str = "line") -> DataFrame:
    """uniCOIL lines `{"id": "...", "vector": {"term": impact, ...}}` →
    (primary_key, term, impact) — pure JVM: from_json + explode."""
    parsed = lines.select(
        F.from_json(
            F.col(json_col), "struct<id: string, vector: map<string, int>>"
        ).alias("j")
    )
    return parsed.select(
        F.col("j.id").alias("primary_key"),
        F.explode("j.vector").alias("term", "impact"),
    )
