"""Debug/interop export sinks mirroring the reference's minor serializers.

- `forward_index`: re-emit documents as a `<DOC><DOCNO>…</DOCID>…</DOC>`
  line per document, reconstructed from the inverted postings
  (`source/serialise_forward_index.cpp:32-59` — including the reference's
  mismatched `</DOCID>` closing tag, which we reproduce verbatim). The
  reference emits terms in its hash-table iteration order, which is not
  meaningful outside that process; we pin sorted term order instead (each
  term repeated tf times), making the export deterministic.
- `integer_segments`: the raw `<length><docid>*` uint32 dump of impact
  segments, highest-impact-first with 0-based docids
  (`source/serialise_integers.cpp:21-55`), as a DataFrame row per segment
  ready for `write.parquet` — the Spark-native form of the debug sink.

Scale: both are one shuffle keyed doc_id / (term, impact) over the
existing postings tables; no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index


def forward_index(index: Index) -> DataFrame:
    """One `line` per non-empty document:
    `<DOC><DOCNO>{doc_id}</DOCID>{term × tf ...}</DOC>`."""
    per_doc = (
        index.postings.groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("term", "tf"))
                        ),
                        lambda s: F.array_repeat(s["term"], s["tf"].cast("int")),
                    )
                ),
            ).alias("body")
        )
    )
    return per_doc.select(
        "doc_id",
        F.concat(
            F.lit("<DOC><DOCNO>"),
            F.col("doc_id").cast("string"),
            F.lit("</DOCID>"),
            F.col("body"),
            F.lit("</DOC>"),
        ).alias("line"),
    )


def index_statistics(index: Index) -> DataFrame:
    """One row of build-end collection statistics — the numbers
    `tools/JASS_index.cpp:342-343` prints (`Documents:`, `Terms:` = the
    collection length, i.e. total term occurrences) plus the derived
    sizes a capacity planner asks for: vocabulary size, posting count
    (Σ df), segment-row count, max impact. All from the (tiny) stats
    tables; no corpus scan."""
    spark = index.spark
    vocab = index.term_stats.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.max("max_impact").alias("max_impact"),
    ).collect()[0]
    n_segments = index.seg_stats.count()
    return spark.createDataFrame(
        [
            (
                int(index.n_docs),
                int(index.collection_length),
                int(vocab["n_terms"]),
                int(vocab["n_postings"]),
                int(n_segments),
                int(vocab["max_impact"]),
            )
        ],
        "documents bigint, terms bigint, unique_terms bigint, "
        "postings bigint, segments bigint, max_impact bigint",
    )


def index_to_human(index: Index, dictionary_only: bool = False) -> DataFrame:
    """One `line` per vocabulary term, the `tools/JASSv1_to_human.cpp`
    dump: ``term <doc,impact><doc,impact>...`` — segments walked
    highest-impact-first (this engine's canonical stored order), docids
    ascending within a segment (`walk_index_v1`, JASSv1_to_human.cpp:
    124-152; posting rendering `printer::add_rsv`, :103-113). With
    ``dictionary_only`` only the vocabulary is printed (the tool's `-d`).
    Entirely JVM-side: shard merge + two string folds per term."""
    if dictionary_only:
        return index.term_stats.select(
            "term", F.col("term").alias("line")
        )
    per_seg = (
        index.segments.groupBy("term", "impact")
        .agg(F.array_sort(F.flatten(F.collect_list("doc_ids"))).alias("ds"))
        .select(
            "term",
            "impact",
            F.aggregate(
                "ds",
                F.lit(""),
                lambda acc, d: F.concat(
                    acc, F.lit("<"), d.cast("string"), F.lit(","),
                    F.col("impact").cast("string"), F.lit(">"),
                ),
            ).alias("seg_str"),
        )
    )
    return (
        per_seg.groupBy("term")
        .agg(
            F.reverse(F.array_sort(F.collect_list(F.struct("impact", "seg_str")))).alias("segs")
        )
        .select(
            "term",
            F.concat(
                F.col("term"),
                F.lit(" "),
                F.aggregate(
                    "segs", F.lit(""), lambda acc, s: F.concat(acc, s["seg_str"])
                ),
            ).alias("line"),
        )
    )


def integer_segments(index: Index) -> DataFrame:
    """Per (term, impact) segment: `length` and ascending 0-based
    `doc_ids`, ordered impact DESC within term (the reference's reversed
    emit order is an ORDER BY here)."""
    merged = (
        index.segments.select("term", "impact", F.explode("doc_ids").alias("doc_id"))
        .groupBy("term", "impact")
        .agg(F.sort_array(F.collect_list(F.col("doc_id") - F.lit(1))).alias("doc_ids"))
    )
    return merged.select(
        "term",
        F.col("impact").cast("int").alias("impact"),
        F.size("doc_ids").alias("length"),
        "doc_ids",
    ).orderBy("term", F.col("impact").desc())
