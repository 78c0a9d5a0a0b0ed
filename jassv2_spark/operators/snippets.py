"""Result snippets: the best query-term window of each top-k document.

Serve-side UX pass the reference engine leaves to the caller (JASSv2
returns docids/scores only — `anytime/JASS_anytime.cpp` run export): given
the top-k hits, pick for each (query, doc) the `window`-token span that
covers the most DISTINCT query terms (ties: more total matches, then the
earliest span) and render it.

Determinism: an optimal window can always be anchored at a query-term
match, so only match positions are candidate anchors — a finite,
deterministic set; every tie-break is explicit, so a SQL oracle
reproduces the output exactly.

Scale shape: everything downstream of the hit list is bounded by
(n_queries x k), never by corpus size — the hit-doc id set broadcasts
onto the corpus scan (semi-join prune BEFORE any token explode), match
positions are per-hit-doc counts, and the anchor self-join is within
(query, doc) groups of a few dozen rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.operators.textstats import _toks


def snippets(
    docs: DataFrame,
    query_terms: DataFrame,
    hits: DataFrame,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id, win_start, n_terms, snippet) for each hit.

    `query_terms`: (query_id, term); `hits`: (query_id, doc_id, ...).
    win_start is the 0-based token offset of the chosen window; snippet is
    the window's tokens joined by spaces (normalized-token rendering —
    byte-offset rendering would join the raw text instead).
    Hits whose document shares no term with the query (possible under
    anytime/rho truncation) yield no row.
    """
    hd = hits.select("query_id", id_col).distinct()
    dt = docs.join(
        F.broadcast(hd.select(id_col).distinct()), id_col
    ).select(F.col(id_col), _toks(text_col).alias("tk"))
    pos = dt.select(id_col, F.posexplode("tk").alias("p", "term"))
    m = (
        pos.join(F.broadcast(query_terms.select("query_id", "term")), "term")
        .join(F.broadcast(hd), ["query_id", id_col])
        .select("query_id", id_col, "p", "term")
    )
    a, b = m.alias("a"), m.alias("b")
    an = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("b.p") >= F.col("a.p"))
            & (F.col("b.p") < F.col("a.p") + F.lit(int(window))),
        )
        .groupBy(F.col("a.query_id").alias("query_id"), F.col(f"a.{id_col}").alias(id_col), F.col("a.p").alias("p"))
        .agg(
            F.countDistinct("b.term").cast("long").alias("n_terms"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    w = Window.partitionBy("query_id", id_col).orderBy(
        F.col("n_terms").desc(), F.col("n_hits").desc(), F.col("p").asc()
    )
    best = an.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.join(dt, id_col).select(
        "query_id",
        F.col(id_col),
        F.col("p").cast("long").alias("win_start"),
        "n_terms",
        F.array_join(F.expr(f"slice(tk, p + 1, {int(window)})"), " ").alias("snippet"),
    )
