"""TREC/WARC splitters, topic channel, and uniCOIL pre-quantized ingest."""

from jassv2_spark.operators.build import build_prequantized_index
from jassv2_spark.operators.search import search
from jassv2_spark.sources.instreams import (
    parse_trec_topics,
    read_unicoil_json,
    split_trec_documents,
    split_warc_documents,
)

TREC_BLOB = """<DOC>
<DOCNO> WSJ870324-0001 </DOCNO>
<TEXT>
John Blair is near an agreement.
</TEXT>
</DOC>
<DOC>
<DOCNO>WSJ870324-0002</DOCNO>
<TEXT>second doc body</TEXT>
</DOC>
"""

WARC_BLOB = (
    "WARC/1.0\n"
    "WARC-Type: warcinfo\n"
    "Content-Length: 10\n"
    "\n"
    "info stuff\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-TREC-ID: clueweb09-en0000-00-00001\n"
    "Content-Length: 11\n"
    "\n"
    "hello world and trailing garbage\n"
    "WARC/1.0\n"
    "WARC-Type: response\n"
    "WARC-Record-ID: <urn:uuid:1234>\n"
    "Content-Length: 6\n"
    "\n"
    "body 2\n"
)

TOPICS_BLOB = """<top>
<num> Number: 301
<title> International Organized Crime
<desc> Description:
Identify organizations that participate in international criminal activity.
</top>
<top>
<num> Number: 302
<title> Poliomyelitis and Post-Polio
</top>
"""

CLUEWEB_TOPICS = """<topic number="251" type="single">
<query>identifying spider bites</query>
<description>Find data on spider bites.</description>
</topic>
"""

UNICOIL_LINES = [
    '{"id": "d1", "vector": {"apple": 140, "pie": 95}}',
    '{"id": "d2", "vector": {"apple": 20, "banana": 130}}',
    '{"id": "d3", "vector": {"cherry": 50}}',
]


def test_trec_split(spark):
    df = spark.createDataFrame([(TREC_BLOB,)], ["blob"])
    rows = {r["primary_key"]: r["contents"] for r in split_trec_documents(df).collect()}
    assert set(rows) == {"WSJ870324-0001", "WSJ870324-0002"}
    assert "John Blair" in rows["WSJ870324-0001"]


def test_warc_split(spark):
    df = spark.createDataFrame([(WARC_BLOB,)], ["blob"])
    rows = {r["primary_key"]: r["contents"] for r in split_warc_documents(df).collect()}
    assert rows == {
        "clueweb09-en0000-00-00001": "hello world",
        "<urn:uuid:1234>": "body 2",
    }


def test_trec_topics(spark):
    df = spark.createDataFrame([(TOPICS_BLOB,)], ["blob"])
    rows = dict(parse_trec_topics(df, tag="t").collect())
    assert rows["301"] == "International Organized Crime"
    assert rows["302"] == "Poliomyelitis and Post-Polio"
    both = dict(parse_trec_topics(df, tag="td").collect())
    assert "criminal activity" in both["301"]


def test_clueweb_topics(spark):
    df = spark.createDataFrame([(CLUEWEB_TOPICS,)], ["blob"])
    rows = dict(parse_trec_topics(df, tag="q").collect())
    assert rows == {"251": "identifying spider bites"}


def test_unicoil_ingest_and_search(spark):
    lines = spark.createDataFrame([(l,) for l in UNICOIL_LINES], ["line"])
    pre = read_unicoil_json(lines)
    assert {(r["primary_key"], r["term"], r["impact"]) for r in pre.collect()} == {
        ("d1", "apple", 140), ("d1", "pie", 95),
        ("d2", "apple", 20), ("d2", "banana", 130), ("d3", "cherry", 50),
    }
    idx = build_prequantized_index(pre)
    q = spark.createDataFrame([("q1", "apple pie")], ["query_id", "query"])
    hits = search(idx, q, k=3, with_keys=True).collect()
    ranked = sorted(((r["rank"], r["key"], r["rsv"]) for r in hits))
    # d1: 140+95=235 (>255? no — largest_rsv = 140+95=235 ≤ 255, no rescale)
    # d2: apple 20
    assert ranked == [(1, "d1", 235), (2, "d2", 20)]
    idx.unpersist()


def test_warc_crlf_with_lf_lf_body(spark):
    """Standard CRLF WARC whose payload contains an LF-LF sequence: the
    header/body split must land at the CRLF-CRLF blank line, not inside the
    body (ADVICE r1) — otherwise payload lines parse as WARC headers and an
    embedded HTTP Content-Length truncates the contents."""
    body = "<html>\nContent-Length: 3\n\n<p>hello body</p>\n</html>\n"
    blob = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-TREC-ID: clueweb09-crlf-0001\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
        + body
    )
    df = spark.createDataFrame([(blob,)], ["blob"])
    rows = split_warc_documents(df).collect()
    assert len(rows) == 1
    assert rows[0]["primary_key"] == "clueweb09-crlf-0001"
    assert rows[0]["contents"] == body
