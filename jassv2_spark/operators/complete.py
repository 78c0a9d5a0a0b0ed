"""Prefix autocompletion over the index vocabulary.

Search-box completion from the term dictionary: for each prefix, the
top-k vocabulary terms ranked by document frequency (df DESC, term ASC —
deterministic). The reference exposes its vocabulary only through the
binary-search lookup (`source/deserialised_jass_v1.h:311-334`); a
serving stack needs the prefix scan too.

Plan shape: the prefix set is tiny and broadcast; the vocabulary is
term_stats (one row per term — vocabulary-sized, not corpus-sized), so
the prefix probe is a broadcast-join `startswith` filter followed by a
per-prefix top-k window over only the matching terms. At web scale a
prefix's match set is bounded by the vocabulary's branching factor, and
the window partitions by prefix — no corpus-sized anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.operators.build import Index


def complete_terms(index: Index, prefixes: DataFrame, k: int = 10) -> DataFrame:
    """(prefix, term, df, rank): per prefix the top-k completions by
    df DESC, term ASC. `prefixes` carries one string column named
    ``prefix`` (matched case-sensitively against the casefolded
    vocabulary — lowercase your prefixes)."""
    hits = index.term_stats.join(
        F.broadcast(prefixes.select("prefix").distinct()),
        F.col("term").startswith(F.col("prefix")),
    )
    w = Window.partitionBy("prefix").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("prefix", "term", F.col("df").cast("long").alias("df"), "rank")
    )
