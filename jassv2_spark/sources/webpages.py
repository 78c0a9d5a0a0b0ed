"""The input-contract web-pages table: (url, warc_ts, html, text, lang).

This is the shape the engine is specified against (BASELINE.json
input_hint): an Iceberg/parquet table of Common-Crawl-style pages where
`html` is the raw fetched bytes and `text` the extracted body, with the
per-row invariant ``extract_text(html) == text`` byte-identical per url.

- synthesize_webpages: deterministic contract-shaped table derived from
  any (doc_id, text) table — TREC-framed html bytes, zero-padded urls
  (lexical url order == doc_id order, so tie-breaks align), derived
  timestamps. Used by tests/benches/entries; no external data.
- extracted_text / verify_extraction: the extraction pass as a column
  (Arrow-batched pandas UDF over the binary html) and its invariant check.
- build_web_index: html → extract → tokenize → impact-ordered index keyed
  by url, i.e. the north-rule build pipeline end-to-end from raw pages.

TREC framing follows `source/instream_document_trec.cpp:83-160`; the
extraction itself is :func:`jassv2_spark.functions.tokenizer.extract_text`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.functions.tokenizer import extract_text_udf
from jassv2_spark.operators.build import BuildConf, Index, build_index

URL_PREFIX = "https://example.org/web/"


def synthesize_webpages(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic (url, warc_ts, html, text, lang) from a text table.
    Pure JVM expressions — scales as a map-only pass."""
    did = F.col(id_col).cast("long")
    url = F.concat(F.lit(URL_PREFIX), F.lpad(did.cast("string"), 8, "0"))
    html = F.encode(
        F.concat(
            F.lit("<DOC><DOCNO>"), did.cast("string"), F.lit("</DOCNO>"),
            F.col(text_col), F.lit("</DOC>"),
        ),
        "utf-8",
    )
    warc_ts = F.expr(
        f"timestamp'2024-01-01 00:00:00' + make_dt_interval(0, 0, 0, {id_col})"
    )
    return docs.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col(text_col).alias("text"),
        F.lit("en").alias("lang"),
    )


def extracted_text(webpages: DataFrame) -> DataFrame:
    """(url, extracted): the extraction pass over the raw html bytes."""
    return webpages.select("url", extract_text_udf(F.col("html")).alias("extracted"))


def verify_extraction(webpages: DataFrame) -> int:
    """Count rows violating the byte-identical invariant (0 = contract holds)."""
    return (
        extracted_text(webpages)
        .join(webpages.select("url", "text"), "url")
        .where(F.col("extracted") != F.col("text"))
        .count()
    )


def build_web_index(webpages: DataFrame, conf: BuildConf | None = None) -> Index:
    """North-rule build from raw pages: extract text from `html` (never
    trusting the `text` column), tokenize, index; keys are urls (dense
    internal docids assigned in url order)."""
    extracted = webpages.select(
        "url", extract_text_udf(F.col("html")).alias("__extracted")
    )
    return build_index(extracted, text_col="__extracted", key_col="url", conf=conf)
