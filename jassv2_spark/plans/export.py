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


def index_space_audit(index: Index) -> DataFrame:
    """Per-impact physical storage audit of the impact-ordered layout.

    The reference's serializer picks one integer codec for every segment's
    d-gapped ascending docid array (default Group Elias Gamma SIMD,
    `source/serialise_jass_v1.h:189`; variable-byte and 24 others are
    CLI-selectable — `source/compress_integer_all.cpp`). This audit prices
    the layout under the codec family without writing a byte: for each
    logical (term, impact) segment the docids are d-gapped exactly as
    `functions/compression.py:delta_encode` does (first docid kept
    absolute), and per gap we charge

    - raw_bits:    32 (the uncompressed uint32 baseline,
                   `source/serialise_integers.cpp`)
    - binary_bits: floor(log2 g)+1 — the minimal binary magnitude, the
                   lower bound any of the codec family approaches
    - vbyte_bits:  8*ceil(bits/7) — the reference's stop-bit vbyte
                   (`source/compress_integer_variable_byte.h:24-38`)
    - gamma_bits:  2*bits(g+1)-1 — Elias gamma of g+1, matching
                   `functions/compression.py:gamma_encode`'s +1 shift

    all in exact integer arithmetic (`length(bin(x))` is floor(log2 x)+1,
    no floating log), summed per impact level. High impacts are rare and
    gappy (expensive per posting); impact 1 is dense and cheap — the
    distribution this table exposes is what motivates impact-ordered
    compression in the first place.

    Scale: one window shuffle keyed (term, impact) — the same key the
    segment build already shuffles on — then a partial-aggregating
    groupBy over ≤1024 impact rows. Pure JVM end to end.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("term", "impact").orderBy("doc_id")
    bits = F.length(F.bin(F.col("gap")))
    bits1 = F.length(F.bin(F.col("gap") + F.lit(1)))
    gaps = index.impacts.select(
        "impact",
        (F.col("doc_id") - F.lag("doc_id", 1, 0).over(w)).alias("gap"),
    )
    return (
        gaps.groupBy(F.col("impact").cast("long").alias("impact"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_postings"),
            F.sum(bits).cast("long").alias("binary_bits"),
            F.sum(F.lit(8) * F.expr("(length(bin(gap)) + 6) div 7"))
            .cast("long")
            .alias("vbyte_bits"),
            F.sum(F.lit(2) * bits1 - F.lit(1)).cast("long").alias("gamma_bits"),
        )
        .withColumn("raw_bits", (F.lit(32) * F.col("n_postings")).cast("long"))
    )
