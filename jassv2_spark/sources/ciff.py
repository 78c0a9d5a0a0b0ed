"""Common Index File Format (CIFF) import/export.

CIFF (Lin et al., "Supporting Interoperability Between Open-Source Search
Engines with the Common Index File Format", SIGIR 2020; osirrc/ciff) is a
stream of length-delimited protobuf messages:

    Header, num_postings_lists × PostingsList, num_docs × DocRecord

The reference imports it with `tools/ciff_to_JASS.cpp`: postings docids
are d-gaps starting from 0, the first gap is incremented to make internal
ids 1-based (`ciff_to_JASS.cpp:191-193`), doc lengths come from the
DocRecords (`:212-224`), and the index is then ATIRE-BM25-quantized (or,
with -passthrough, the CIFF tf values are taken as pre-quantized impacts,
`:51-60`).

The protobuf wire format is implemented directly (varints + tag/length
framing — public spec), so no protobuf runtime is needed. Import parses
the stream once (the reference tool is serial too — an interchange file
is a one-shot ingest) and hands `createDataFrame` batches to Spark; the
expensive work (scoring, quantization, segment build) runs distributed
through the standard pipeline.

Messages (field numbers per the public CIFF .proto):
    Header:       version=1 i32, num_postings_lists=2, num_docs=3,
                  total_postings_lists=4, total_docs=5,
                  total_terms_in_collection=6 i64, average_doclength=7 dbl,
                  description=8 str
    PostingsList: term=1 str, df=2 i64, cf=3 i64, postings=4 repeated
    Posting:      docid=1 i32 (d-gap), tf=2 i32
    DocRecord:    docid=1 i32, collection_docid=2 str, doclength=3 i32
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from jassv2_spark.operators.build import (
    BuildConf,
    Index,
    build_index_from_counts,
    build_prequantized_index,
)

# ------------------------------------------------------------- wire format


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        raise ValueError("negative varint")
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) — value is int for varint,
    bytes for length-delimited, float for 64-bit."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 1:  # 64-bit
            (val,) = struct.unpack_from("<d", buf, pos)
            pos += 8
            yield field, wire, val
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            (val,) = struct.unpack_from("<f", buf, pos)
            pos += 4
            yield field, wire, val
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _tag(out: bytearray, field: int, wire: int) -> None:
    _write_varint(out, (field << 3) | wire)


def _emit_varint_field(out: bytearray, field: int, value: int) -> None:
    _tag(out, field, 0)
    _write_varint(out, value)


def _emit_bytes_field(out: bytearray, field: int, data: bytes) -> None:
    _tag(out, field, 2)
    _write_varint(out, len(data))
    out += data


def _delimited(msg: bytes | bytearray) -> bytes:
    out = bytearray()
    _write_varint(out, len(msg))
    out += msg
    return bytes(out)


def _read_delimited(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = _read_varint(buf, pos)
    return buf[pos : pos + ln], pos + ln


# ------------------------------------------------------------------ export


def write_ciff(index: Index, path: str, description: str = "jassv2_spark") -> dict:
    """Serialize an Index's postings + doc records to a CIFF file.
    Docids are written 0-based dense (ranked by internal doc_id, which may
    itself start anywhere), d-gapped ascending per term.

    Streaming export epilogue: the output is inherently ONE sequential
    protobuf stream, but nothing postings-scale is ever materialized on
    the driver — the 0-based remap is the distributed two-phase dense-id
    assignment (sources/docids.py), per-term postings are aggregated and
    d-gapped executor-side, and the driver consumes the sorted frame one
    partition at a time via ``toLocalIterator()`` (round-2 verdict #2:
    the previous full ``collect()`` + driver dict over all docs)."""
    from pyspark.sql import functions as F

    from jassv2_spark.sources.docids import assign_doc_ids

    docs_df = (
        index.doc_map.join(index.doc_lengths, "doc_id").select("doc_id", "key", "dl")
    )
    # distributed dense 0-based CIFF ids, ordered by internal doc_id;
    # persisted because both the postings join and the doc-record pass
    # read it and the assignment must be one consistent numbering
    remap = (
        assign_doc_ids(docs_df, key_col="doc_id", out_col="cid")
        .withColumn("cid", F.col("cid") - 1)
        .persist()
    )
    n_docs = int(remap.count())
    per_term = (
        index.postings.select("term", "doc_id", "tf")
        .join(remap.select("doc_id", "cid"), "doc_id")
        .groupBy("term")
        .agg(
            F.sort_array(F.collect_list(F.struct("cid", "tf"))).alias("ps"),
            F.count("*").alias("df"),
            F.sum("tf").alias("cf"),
        )
        .orderBy("term")
    )
    n_terms = per_term.count()

    header = bytearray()
    _emit_varint_field(header, 1, 1)  # version
    _emit_varint_field(header, 2, n_terms)
    _emit_varint_field(header, 3, n_docs)
    _emit_varint_field(header, 4, n_terms)
    _emit_varint_field(header, 5, n_docs)
    _emit_varint_field(header, 6, int(index.collection_length))
    _tag(header, 7, 1)
    header += struct.pack("<d", float(index.mean_doc_length))
    _emit_bytes_field(header, 8, description.encode("utf-8"))

    with open(path, "wb") as f:
        f.write(_delimited(header))
        for row in per_term.toLocalIterator():
            msg = bytearray()
            _emit_bytes_field(msg, 1, row["term"].encode("utf-8"))
            _emit_varint_field(msg, 2, int(row["df"]))
            _emit_varint_field(msg, 3, int(row["cf"]))
            prev = 0
            for p in row["ps"]:
                pb = bytearray()
                cid = p["cid"]
                _emit_varint_field(pb, 1, cid - prev)
                _emit_varint_field(pb, 2, int(p["tf"]))
                prev = cid
                _emit_bytes_field(msg, 4, bytes(pb))
            f.write(_delimited(msg))
        for r in remap.select("cid", "key", "dl").orderBy("cid").toLocalIterator():
            msg = bytearray()
            _emit_varint_field(msg, 1, int(r["cid"]))
            _emit_bytes_field(msg, 2, str(r["key"]).encode("utf-8"))
            _emit_varint_field(msg, 3, int(r["dl"]))
            f.write(_delimited(msg))
    remap.unpersist()
    return {"num_postings_lists": n_terms, "num_docs": n_docs}


# ------------------------------------------------------------------ import


def read_ciff(spark: SparkSession, path: str) -> tuple[dict, DataFrame, DataFrame]:
    """Parse a CIFF file → (header dict,
    postings(term, doc_id, tf) with 1-based docids,
    doc_records(doc_id, collection_docid, doclength))."""
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0

    hmsg, pos = _read_delimited(buf, pos)
    header: dict = {}
    names = {1: "version", 2: "num_postings_lists", 3: "num_docs",
             4: "total_postings_lists", 5: "total_docs",
             6: "total_terms_in_collection", 7: "average_doclength",
             8: "description"}
    for field, _wire, val in _fields(hmsg):
        key = names.get(field)
        if key == "description":
            header[key] = val.decode("utf-8")
        elif key:
            header[key] = val

    postings_rows = []
    for _ in range(int(header["num_postings_lists"])):
        msg, pos = _read_delimited(buf, pos)
        term, gaps = "", []
        for field, _wire, val in _fields(msg):
            if field == 1:
                term = val.decode("utf-8")
            elif field == 4:
                docid = tf = 0
                for pf, _pw, pv in _fields(val):
                    if pf == 1:
                        docid = pv
                    elif pf == 2:
                        tf = pv
                gaps.append((docid, tf))
        prev = 0
        for gap, tf in gaps:
            prev += gap
            # first gap is the absolute 0-based docid; +1 → internal id
            # (ciff_to_JASS.cpp:191-193)
            postings_rows.append((term, prev + 1, int(tf)))

    doc_rows = []
    for _ in range(int(header["num_docs"])):
        msg, pos = _read_delimited(buf, pos)
        docid, key, dl = 0, "", 0
        for field, _wire, val in _fields(msg):
            if field == 1:
                docid = val
            elif field == 2:
                key = val.decode("utf-8")
            elif field == 3:
                dl = val
        doc_rows.append((docid + 1, key, int(dl)))

    postings = spark.createDataFrame(postings_rows, "term string, doc_id long, tf long")
    doc_records = spark.createDataFrame(
        doc_rows, "doc_id long, collection_docid string, doclength long"
    )
    return header, postings, doc_records


def build_index_from_ciff(
    spark: SparkSession,
    path: str,
    conf: BuildConf | None = None,
    passthrough: bool = False,
) -> Index:
    """The `ciff_to_JASS` pipeline: import + ATIRE BM25 quantize
    (`tools/ciff_to_JASS.cpp:85-100`), or `-passthrough` for CIFFs whose
    tf values already are quantized impacts (`:41-60`, uniCOIL-style)."""
    from pyspark.sql import functions as F

    header, postings, doc_records = read_ciff(spark, path)
    if passthrough:
        pre = postings.join(doc_records, "doc_id").select(
            F.col("collection_docid").alias("key"), "term", F.col("tf").alias("impact")
        )
        return build_prequantized_index(
            pre, key_col="key", term_col="term", impact_col="impact", conf=conf
        )
    counts = postings.join(doc_records, "doc_id").select(
        "doc_id", "term", F.col("tf").alias("cnt"), F.col("doclength").alias("dl")
    )
    doc_map = doc_records.select("doc_id", F.col("collection_docid").alias("key"))
    idx = build_index_from_counts(
        counts,
        doc_map,
        int(header["num_docs"]),
        collection_length=int(header["total_terms_in_collection"]),
        conf=conf,
    )
    return idx
