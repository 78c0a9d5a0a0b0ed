"""BPE tokenizer training over the corpus (Sennrich et al. ACL 2016).

The training-data-pipeline op the reference has no analogue for: its
parser (`source/parser.cpp`) tokenizes with fixed rules, but a modern
LLM pipeline must LEARN its subword vocabulary from the same crawl it
indexes. Classic byte-pair-encoding training is: count words, split each
word into character symbols, repeatedly merge the globally most frequent
adjacent symbol pair.

Scale shape (the part worth getting right at 100 TB):
- The corpus is touched ONCE — `word_counts` is a single tokenize +
  (word)-keyed partial agg; everything after runs on the VOCABULARY
  (distinct words weighted by frequency), which is ~10⁸ rows when the
  corpus is 10¹² tokens — a 10⁴× reduction before any iterative work.
- Each merge iteration is a map-only JVM `aggregate()` fold over the
  symbol arrays plus one (pair)-keyed agg to find the next argmax —
  no UDF, no driver-side vocabulary, no quadratic blowup (a word of
  n symbols yields n−1 pair rows, and words only shrink).
- The only driver hops are one `.first()` per merge (the argmax pair —
  inherently sequential in BPE) and the final merge list, which is
  `n_merges` rows by construction.

`pair_counts` (one iteration) is the driver-gate entry with a DuckDB
oracle; the sequential `learn_bpe` loop is pinned by pytest goldens
against a hand-run of the textbook algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jassv2_spark.operators.textstats import _toks


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): corpus word frequencies — the ONE corpus-sized pass;
    everything downstream is vocabulary-sized."""
    return (
        docs.select(F.explode(_toks(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _char_symbols(col: str = "word"):
    """Split a word into single-character symbols (JVM-side, UTF-8 aware)."""
    return F.expr(
        f"transform(sequence(1, length({col})), i -> substring({col}, i, 1))"
    )


def pair_counts(vocab: DataFrame, symbols_col: str | None = None) -> DataFrame:
    """(left, right, n): frequency-weighted adjacent-symbol pair counts —
    one BPE statistics pass. `vocab(word, freq)` uses character symbols;
    pass `symbols_col` to count over an already-merged symbol array column
    instead (the iterative path). Map-only + one (pair)-keyed agg."""
    if symbols_col is None:
        v = vocab.select(_char_symbols("word").alias("__sym"), "freq")
    else:
        v = vocab.select(F.col(symbols_col).alias("__sym"), "freq")
    pairs = F.expr(
        "transform(sequence(1, size(__sym) - 1),"
        " i -> struct(element_at(__sym, i) AS left,"
        "             element_at(__sym, i + 1) AS right))"
    )
    return (
        v.where(F.size("__sym") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def apply_merge(vocab: DataFrame, left: str, right: str, symbols_col: str = "symbols") -> DataFrame:
    """Replace every non-overlapping `left`+`right` adjacency (leftmost
    first — the standard BPE application order) by the merged symbol, via
    a JVM `aggregate()` fold: 'aaa' under merge (a,a) becomes ['aa','a'].
    Map-only; words only shrink."""
    l_lit, r_lit = _sql_str(left), _sql_str(right)
    fold = (
        f"aggregate({symbols_col}, CAST(array() AS array<string>),"
        f" (acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = {l_lit}"
        f"                AND s = {r_lit},"
        f"    concat(slice(acc, 1, size(acc) - 1), array(concat({l_lit}, {r_lit}))),"
        f"    concat(acc, array(s))))"
    )
    return vocab.withColumn(symbols_col, F.expr(fold))


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def learn_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus: [(left, right, count)]
    in merge order. Ties broken deterministically by (n DESC, left ASC,
    right ASC), so the learned vocabulary is parallelism- and
    engine-independent. The corpus is read once; each iteration is
    vocabulary-sized with one driver-side argmax row."""
    vocab = (
        word_counts(docs, text_col)
        .select("word", "freq", _char_symbols("word").alias("symbols"))
        .cache()
    )
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            best = (
                pair_counts(vocab, symbols_col="symbols")
                .orderBy(F.col("n").desc(), F.col("left").asc(), F.col("right").asc())
                .first()
            )
            if best is None:
                break
            merges.append((best["left"], best["right"], int(best["n"])))
            nxt = apply_merge(vocab, best["left"], best["right"]).cache()
            nxt.count()  # materialize before dropping the parent cache
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def segment_words(vocab: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(word, freq, symbols): the vocabulary segmented under a learned
    merge list — what a tokenizer export consumes. Applies merges in
    learned order (BPE's defined semantics)."""
    out = vocab.select("word", "freq", _char_symbols("word").alias("symbols"))
    for left, right, _n in merges:
        out = apply_merge(out, left, right)
    return out
