"""Text-analysis operators for large-scale training-data pipelines.

All pure-JVM column expressions (whole-stage codegen, no Python in the hot
path): token counting, quality scoring, language-ID heuristic, document
fingerprinting (min-hash of token shingles — a rolling-hash analogue that is
portable across engines via md5).

Each operator's semantics are deliberately expressible in ANSI SQL so the
DuckDB oracle can mirror them bit-for-bit (integer counts, exact IEEE
ratios, md5 over utf-8 bytes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z]+|[0-9]+"
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
# BPE-ish pretokenizer (GPT-2-style shape: contraction suffixes, then
# space-prefixed letter runs / digit runs / punctuation runs). Counts the
# word-piece boundaries a byte-pair tokenizer would start from; ASCII
# classes + explicit whitespace set so java.util.regex and RE2 agree, and
# both engines use leftmost-first alternation.
BPE_ISH_PATTERN = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]+"
)


def _toks(text_col: str) -> Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_ws, n_tok, n_pretok): whitespace-split count, tokenizer-token
    count, and BPE-ish pretokenizer piece count (the unit a subword
    tokenizer's merge loop starts from)."""
    return docs.select(
        F.col(id_col),
        F.size(F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")).cast("long").alias("n_ws"),
        F.size(_toks(text_col)).cast("long").alias("n_tok"),
        # F.lit, not an F.expr SQL literal: the pattern's \x0B escape must
        # reach java.util.regex verbatim (SQL literal parsing would eat it)
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))
        .cast("long")
        .alias("n_pretok"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: token/type counts, length ratios, stopword
    ratio, alphanumeric density. Deterministic, engine-portable math."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    d = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        _toks(text_col).alias("__toks"),
    )
    n_tokens = F.size("__toks").cast("long")
    return d.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_types"),
        (
            F.aggregate("__toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).cast(
                "double"
            )
            / n_tokens.cast("double")
        ).alias("avg_token_len"),
        (
            F.size(F.expr(f"filter(__toks, t -> t in ({stop_list}))")).cast("double")
            / n_tokens.cast("double")
        ).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace("__t", "[^a-z0-9]", "")).cast("double")
            / F.length("__t").cast("double")
        ).alias("alnum_ratio"),
    )


def lang_guess(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Char-class language-ID heuristic (script detection). A real n-gram
    model would be a broadcast lookup over the same plumbing."""
    t = F.col(text_col)
    guess = (
        F.when(t.rlike("[一-鿿]"), F.lit("zh"))
        .when(t.rlike("[぀-ヿ]"), F.lit("ja"))
        .when(t.rlike("[Ѐ-ӿ]"), F.lit("ru"))
        .when(t.rlike("[Ͱ-Ͽ]"), F.lit("el"))
        .when(t.rlike("[a-zA-Z]"), F.lit("en"))
        .otherwise(F.lit("und"))
    )
    return docs.select(F.col(id_col), guess.alias("lang_guess"))


# Character-trigram profiles for the n-gram language-ID heuristic —
# highest-frequency trigrams (including word boundaries as spaces) of each
# language's most common function words; public-knowledge linguistics,
# deterministic, tiny enough to inline as literals in BOTH engines.
LANG_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", " th", "and", "nd ", " an", "ing", "ng ", " of",
           "of ", " to", "to ", "ion", " in", "in ", "ed ", "is ", " is",
           "hat", "at "),
    "de": ("der", "er ", " de", "ie ", "die", "und", "nd ", " un", "ein",
           "ich", "ch ", " ei", "sch", "en ", "ung", " da", "das", "cht",
           "ben", "gen"),
    "fr": ("es ", " de", "de ", "le ", " le", "ent", "nt ", "la ", " la",
           "et ", " et", "les", "que", " qu", "ue ", "our", " pa", "ais",
           "ons", "ait"),
    "es": (" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu",
           "ue ", "as ", " en", "en ", "ado", "ión", "ar ", " co", "es ",
           "nte", "los"),
}
LANG_ORDER = tuple(LANG_TRIGRAM_PROFILES)  # deterministic tie-break order


def lang_ngram_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_hits: int = 2
) -> DataFrame:
    """(id, score_en, score_de, score_fr, score_es, lang_ngram): character
    n-gram language ID — score = number of DISTINCT profile trigrams found
    in the lowercased text; guess = argmax (first language in profile order
    on ties), 'und' when the best score < min_hits. Pure JVM expressions;
    profiles inline as literals, so an SQL oracle reproduces it exactly."""
    d = docs.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
    score_cols = {}
    for lang, prof in LANG_TRIGRAM_PROFILES.items():
        hits = [F.when(F.contains(F.col("__t"), F.lit(t)), 1).otherwise(0) for t in prof]
        expr = hits[0]
        for h in hits[1:]:
            expr = expr + h
        score_cols[lang] = expr
    best = None
    for lang in LANG_ORDER:
        best = score_cols[lang] if best is None else F.greatest(best, score_cols[lang])
    guess = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier languages win ties
        guess = F.when(score_cols[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best >= F.lit(int(min_hits)), guess).otherwise(F.lit("und"))
    return d.select(
        F.col(id_col),
        *[score_cols[lang].cast("long").alias(f"score_{lang}") for lang in LANG_ORDER],
        guess.alias("lang_ngram"),
    )


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle: int = 8
) -> DataFrame:
    """(id, fingerprint): min-md5 over `shingle`-token windows — a portable
    document fingerprint (winnowing-style min-selection over a rolling
    window hash). Docs shorter than one window hash all their tokens."""
    w = shingle
    expr = f"""
      CASE WHEN size(__toks) = 0 THEN NULL
           WHEN size(__toks) < {w} THEN md5(cast(array_join(__toks, ' ') AS binary))
           ELSE array_min(transform(sequence(1, size(__toks) - {w - 1}),
                          i -> md5(cast(array_join(slice(__toks, i, {w}), ' ') AS binary))))
      END
    """
    return docs.select(F.col(id_col), _toks(text_col).alias("__toks")).select(
        F.col(id_col), F.expr(expr).alias("fingerprint")
    )


# PII patterns: shared by Spark (java.util.regex) and the DuckDB oracle
# (RE2) — the subset below (character classes, bounded repeats, \b ASCII
# word boundary, no backreferences) behaves identically in both engines.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dup_line_frac, dup_line_char_frac, top2_char_frac,
    dup3_char_frac): the Gopher repetition filters (Rae et al. 2021,
    "Scaling Language Models", table A1) used to gate web documents out of
    training corpora:

    - dup_line_frac: fraction of (trimmed, non-empty) lines that are
      repeats of an earlier line.
    - dup_line_char_frac: fraction of line characters inside those repeats.
    - top2_char_frac: fraction of token characters covered by occurrences
      of the single most frequent word 2-gram (ties broken by
      lexicographically smallest gram, so engines agree).
    - dup3_char_frac: fraction of token characters inside word 3-grams
      that occur at least twice.

    Arrow-batched mapInPandas kernel (dict/Counter-based gram counting,
    O(n_tokens) per row), NOT chained higher-order array expressions: a
    pure-expression formulation was tried and rejected — Catalyst's
    CollapseProject inlines each single-use array intermediate (grams,
    occurrence positions) into the downstream lambda that consumes it, so
    it is re-evaluated once per array ELEMENT, compounding to
    super-quadratic per-row cost (measured: hung on 500 short docs).
    Spark has no gram→count map primitive, so the honest JVM plan is
    O(distinct_grams · n_tokens) string scans even before that blowup.
    The kernel is still a map-only pass — column-pruned scan, zero
    shuffles, Arrow batch in/out — i.e. embarrassingly parallel at
    100 TB. All ratios are one exact-integer numerator and denominator
    divided once, so the DuckDB oracle matches bitwise (trim/lower/regex
    semantics mirrored: space-only strip, [a-z]+|[0-9]+ over lowercased
    text)."""
    import re
    from collections import Counter

    import pandas as pd

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = docs.schema[id_col]
    out_schema = StructType(
        [StructField(id_col, id_field.dataType, id_field.nullable)]
        + [
            StructField(name, DoubleType(), False)
            for name in ("dup_line_frac", "dup_line_char_frac", "top2_char_frac", "dup3_char_frac")
        ]
    )
    pat = re.compile(TOKEN_PATTERN)

    def _row(text):
        if not isinstance(text, str):
            return 0.0, 0.0, 0.0, 0.0
        # DuckDB trim() strips spaces only — mirror with strip(" ")
        lines = [s for s in (l.strip(" ") for l in text.split("\n")) if s]
        if lines:
            n_lines = len(lines)
            dlines = set(lines)
            line_chars = sum(map(len, lines))
            dline_chars = sum(map(len, dlines))
            dup_line = (n_lines - len(dlines)) / n_lines
            dup_line_char = (line_chars - dline_chars) / line_chars if line_chars else 0.0
        else:
            dup_line = dup_line_char = 0.0
        toks = pat.findall(text.lower())
        n = len(toks)
        tok_chars = sum(map(len, toks))
        top2 = dup3 = 0
        if n >= 2:
            g2 = [toks[i] + " " + toks[i + 1] for i in range(n - 1)]
            cnt = Counter(g2)
            mc = max(cnt.values())
            best = min(g for g, c in cnt.items() if c == mc)
            cov = bytearray(n)
            for i, g in enumerate(g2):
                if g == best:
                    cov[i] = cov[i + 1] = 1
            top2 = sum(len(toks[j]) for j in range(n) if cov[j])
        if n >= 3:
            g3 = [toks[i] + " " + toks[i + 1] + " " + toks[i + 2] for i in range(n - 2)]
            c3 = Counter(g3)
            cov = bytearray(n)
            for i, g in enumerate(g3):
                if c3[g] >= 2:
                    cov[i] = cov[i + 1] = cov[i + 2] = 1
            dup3 = sum(len(toks[j]) for j in range(n) if cov[j])
        return (
            dup_line,
            dup_line_char,
            top2 / tok_chars if tok_chars else 0.0,
            dup3 / tok_chars if tok_chars else 0.0,
        )

    def _batches(it):
        for pdf in it:
            vals = [_row(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dup_line_frac": [v[0] for v in vals],
                    "dup_line_char_frac": [v[1] for v in vals],
                    "top2_char_frac": [v[2] for v in vals],
                    "dup3_char_frac": [v[3] for v in vals],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_batches, out_schema)


# Gopher rule C5 ("required words"): keep needs >= 2 of these present.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc Gopher quality-filter signals (Rae et al. 2021, table A1)
    plus two C4 line signals (Raffel et al. 2020), and the Gopher keep
    decision:

    - n_words / mean_word_len: whitespace-split word count and mean chars
      per word (Gopher bounds: 50..100k words, mean length 3..10).
    - frac_alpha_words: fraction of words containing an alphabetic char
      (>= 0.8 to keep).
    - n_stop_hits: how many of the 8 Gopher required words occur (>= 2).
    - symbol_word_ratio: ('#' + '...') occurrences per word (<= 0.1).
    - frac_lines_bullet / frac_lines_ellipsis: lines starting with a
      bullet (<= 0.9) / ending with an ellipsis (<= 0.3).
    - frac_lines_end_punct: C4's terminal-punctuation line fraction.
    - keep_gopher: conjunction of the six Gopher thresholds above.

    Pure-JVM single-level array expressions over three materialized
    arrays (words, trimmed lines, tokens); each array is referenced by
    several consumers, so CollapseProject keeps them materialized (unlike
    the chained single-use intermediates that made the expression form of
    repetition_signals blow up). Map-only: zero shuffles, whole-stage
    codegen, a pure scan at 100 TB. Regex patterns ride the Column API
    (never SQL literals) so java.util.regex sees \\x0B et al. verbatim;
    every ratio is one exact-integer division, so the DuckDB oracle
    matches bitwise."""
    d = docs.select(
        F.col(id_col),
        F.col(text_col).alias("__t"),
        F.filter(
            F.split(F.col(text_col), r"[ \t\n\x0B\f\r]+"), lambda w: w != F.lit("")
        ).alias("__w"),
        F.filter(
            F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
            lambda l: l != F.lit(""),
        ).alias("__lines"),
        _toks(text_col).alias("__toks"),
    )
    n_words = F.size("__w").cast("long")
    word_chars = F.aggregate("__w", F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_alpha = F.size(F.filter("__w", lambda w: w.rlike("[a-zA-Z]"))).cast("long")
    n_lines = F.size("__lines").cast("long")
    n_bullet = F.size(
        F.filter("__lines", lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
    ).cast("long")
    n_ellipsis = F.size(
        F.filter("__lines", lambda l: l.endswith("...") | l.endswith("…"))
    ).cast("long")
    n_punct = F.size(
        F.filter("__lines", lambda l: F.right(l, F.lit(1)).isin(".", "!", "?", '"'))
    ).cast("long")
    n_symbols = (
        F.regexp_count(F.col("__t"), F.lit("#")) + F.regexp_count(F.col("__t"), F.lit("\\.\\.\\."))
    ).cast("long")
    stop_hits = None
    for s in GOPHER_STOPWORDS:
        hit = F.array_contains("__toks", s).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit

    def _frac(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))

    mean_word_len = _frac(word_chars, n_words)
    frac_alpha = _frac(n_alpha, n_words)
    symbol_ratio = _frac(n_symbols, n_words)
    frac_bullet = _frac(n_bullet, n_lines)
    frac_ellipsis = _frac(n_ellipsis, n_lines)
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (frac_bullet <= 0.9)
        & (frac_ellipsis <= 0.3)
        & (frac_alpha >= 0.8)
        & (stop_hits >= 2)
    )
    return d.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        stop_hits.alias("n_stop_hits"),
        symbol_ratio.alias("symbol_word_ratio"),
        frac_bullet.alias("frac_lines_bullet"),
        frac_ellipsis.alias("frac_lines_ellipsis"),
        _frac(n_punct, n_lines).alias("frac_lines_end_punct"),
        keep.alias("keep_gopher"),
    )


def pii_scrub(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): redact emails,
    IPv4 addresses, and NANP-style phone numbers with typed placeholders.

    Standard pre-training hygiene pass. Pure JVM `regexp_replace` /
    `regexp_count` — whole-stage-codegen, no Python in the path. Counts are
    taken on the original text; replacement order (email, ip, phone) is
    fixed so the output is engine-independent."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, F.lit(PII_EMAIL), F.lit("[EMAIL]")),
            F.lit(PII_IPV4),
            F.lit("[IP]"),
        ),
        F.lit(PII_PHONE),
        F.lit("[PHONE]"),
    )
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    )


def split_assign(
    docs: DataFrame,
    val_frac: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, split): deterministic, engine-portable train/val
    assignment — bucket = first 32 bits of md5(str(id)) as an integer,
    split = 'val' iff bucket / 2^32 < val_frac.

    Hash-based (not random) so the split is stable under re-runs, joins,
    and incremental ingest — any engine that can md5 a string reproduces
    it. No shuffle at all: a per-row projection."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    thresh = int(val_frac * (1 << 32))
    return docs.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < F.lit(thresh), F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def leakage_safe_split(
    docs: DataFrame,
    val_frac: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, bucket, split): train/val split
    that can never leak a near-duplicate across the boundary — the split
    is hashed from the document's near-dup CLUSTER id (the MinHash-LSH
    transitive closure, dedup.dedup_cluster_assign), so every member of a
    cluster lands in the same split by construction.

    This is the standard fix for the classic eval bug where a val document
    has a near-identical twin in train (`split_assign` on raw ids cannot
    prevent it). Same md5-prefix bucket rule as `split_assign`, applied to
    cluster_id — singletons therefore split exactly like `split_assign`
    on their own id.

    Scale shape: clustering cost is the LSH-pairs + O(log diameter)
    label-propagation closure (see dedup.connected_components); the split
    itself is a per-row projection, no extra shuffle."""
    from jassv2_spark.operators.dedup import dedup_cluster_assign

    if clusters is None:
        clusters = dedup_cluster_assign(
            docs, text_col=text_col, id_col=id_col, n=n,
            num_hashes=num_hashes, bands=bands,
        )
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster_id").cast("string").cast("binary")), 1, 8),
        16, 10,
    ).cast("long")
    thresh = int(val_frac * (1 << 32))
    return clusters.select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        bucket.alias("bucket"),
        F.when(bucket < F.lit(thresh), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def heaps_profile(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10,
) -> DataFrame:
    """(decile, n_docs, n_tokens, vocab_size): vocabulary growth along the
    corpus — Heaps'-law profile, the tokenizer/dedup QA curve (a healthy
    crawl grows vocab ~ tokens^beta, beta<1; a dedup regression or
    tokenizer bug bends it).

    Corpus position = doc_id offset from the minimum id (the engine's
    docid assignment is dense, sources/docids.py — no global sort needed);
    checkpoint i covers the first floor(N·i/buckets) documents.
    vocab_size(i) = distinct terms whose FIRST occurrence lies in the
    prefix; n_tokens(i) = total token count of the prefix. All integers.

    Scale shape: one tokenize pass → per-(term) min-position partial agg
    (vocab) and per-doc length agg (tokens); the decile roll-up is
    `buckets` rows. No global sort, no window over the corpus.
    """
    from jassv2_spark.functions.tokenizer import spark_tokens

    bounds = docs.agg(
        F.min(id_col).alias("lo"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    lo, n = int(bounds["lo"]), int(bounds["n"])
    spark = docs.sparkSession

    tok = spark_tokens(text_col, mode="parity", xml=False)
    base = docs.select(
        (F.col(id_col) - F.lit(lo) + F.lit(1)).alias("pos"),
        F.explode(tok).alias("term"),
    )
    # decile of a position: smallest i with pos <= floor(n*i/buckets)
    cuts = [(i, (n * i) // buckets) for i in range(1, buckets + 1)]
    cut_df = F.broadcast(
        spark.createDataFrame(cuts, schema="decile long, cut long")
    )

    first = base.groupBy("term").agg(F.min("pos").alias("fpos"))
    vocab_per = (
        first.join(cut_df, F.col("fpos") <= F.col("cut"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab_size"))
    )
    dl = base.groupBy("pos").agg(F.count(F.lit(1)).alias("dl"))
    tok_per = (
        dl.join(cut_df, F.col("pos") <= F.col("cut"))
        .groupBy("decile")
        .agg(F.sum("dl").cast("long").alias("n_tokens"))
    )
    return (
        cut_df.select("decile", F.col("cut").cast("long").alias("n_docs"))
        .join(tok_per, "decile", "left")
        .join(vocab_per, "decile", "left")
        .na.fill(0)
        .select("decile", "n_docs", "n_tokens", "vocab_size")
    )


def zipf_profile(postings: DataFrame, top_r: int = 50) -> DataFrame:
    """(rank, term, ctf): the collection's rank-frequency head — the
    Zipf curve over the index's saturated term frequencies
    (`Index.postings`), ranked ctf DESC with term-ASC ties. The corpus-QA
    companion to `heaps_profile`: a healthy natural-language crawl is
    near-linear in log-log with slope ≈ −1; boilerplate floods or
    tokenizer bugs bend or flatten the head.

    Scale shape: one (term)-keyed partial agg over postings, then a
    DISTRIBUTED top-`top_r` (orderBy+limit plans as TakeOrderedAndProject
    — per-partition heaps, never a single-partition window over the
    vocabulary); only the ≤ top_r surviving rows see the rank window."""
    ctf = postings.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    head = ctf.orderBy(F.col("ctf").desc(), F.col("term").asc()).limit(int(top_r))
    w = Window.orderBy(F.col("ctf").desc(), F.col("term").asc())
    return head.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", "ctf"
    )


def zipf_slope(postings: DataFrame, top_r: int = 50) -> DataFrame:
    """One row (n_ranks, slope_micros): least-squares slope of
    ln(ctf) vs ln(rank) over the top-`top_r` Zipf head — the scalar QA
    witness (≈ −1·10⁶ for Zipfian text).

    Determinism: ln is evaluated DRIVER-side (CPython/glibc — the repo
    standard, bitwise equal to DuckDB's ln) over the bounded domains of
    ranks (literals 1..top_r) and distinct ctf values (≤ top_r rows
    collected), quantized to floor-micros integers; all regression
    moments are then exact int64 sums, and the slope is a single
    int64→double division — bitwise-reproducible on any engine."""
    import math

    prof = zipf_profile(postings, top_r=top_r)
    spark = prof.sparkSession
    ctf_vals = [r[0] for r in prof.select("ctf").distinct().collect()]
    if not ctf_vals:
        return spark.createDataFrame(
            [(0, None)], schema="n_ranks long, slope_micros long"
        )
    xm = spark.createDataFrame(
        [(r, int(math.floor(1_000_000 * math.log(r)))) for r in range(1, top_r + 1)],
        schema="rank long, xm long",
    )
    ym = spark.createDataFrame(
        [(c, int(math.floor(1_000_000 * math.log(c)))) for c in ctf_vals],
        schema="ctf long, ym long",
    )
    pts = prof.join(F.broadcast(xm), "rank").join(F.broadcast(ym), "ctf")
    agg = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xm").cast("long").alias("sx"),
        F.sum("ym").cast("long").alias("sy"),
        F.sum(F.col("xm") * F.col("ym")).cast("long").alias("sxy"),
        F.sum(F.col("xm") * F.col("xm")).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return agg.select(
        F.col("n").alias("n_ranks"),
        F.when(den != 0, F.floor(F.lit(1_000_000.0) * num / den))
        .cast("long")
        .alias("slope_micros"),
    )


def dl_histogram(doc_lengths: DataFrame) -> DataFrame:
    """(bucket, n_docs, total_tokens): document-length distribution in
    power-of-two buckets — bucket = floor(log2(dl)) computed EXACTLY as
    length(bin(dl)) − 1 (binary digit count, pure integer/string math —
    a float log2 could misbucket at power-of-two boundaries on some
    engine); dl ≥ 1, empty docs land in bucket −1. The corpus QA
    histogram that exact percentiles can't give at scale: a per-group
    exact percentile buffers every value, while this is a map-side
    projection plus a ≤64-row aggregate."""
    bucket = (
        F.when(F.col("dl") <= 0, F.lit(-1))
        .otherwise(F.length(F.bin(F.col("dl"))) - 1)
        .cast("long")
    )
    return (
        doc_lengths.select(bucket.alias("bucket"), F.col("dl").cast("long").alias("dl"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("long").alias("total_tokens"),
        )
    )


def stopword_candidates(
    term_stats: DataFrame, n_docs: int, min_df_ppm: int = 200_000, top_r: int = 50
) -> DataFrame:
    """(rank, term, df, df_ppm): vocabulary whose document frequency
    exceeds `min_df_ppm` parts-per-million of the corpus — the
    stoplist-generation tool (the reference indexes everything,
    `parser.cpp` has no stoplist; consumers that want one derive it from
    collection statistics exactly like this). df_ppm = (10⁶·df) DIV
    n_docs, exact; ordered df DESC with term-ASC ties, capped at `top_r`
    via distributed orderBy+limit.

    Scale: VOCABULARY-sized input (term_stats), one filter + top-k —
    never touches postings."""
    cand = term_stats.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.expr(f"(1000000 * df) DIV {int(n_docs)}").cast("long").alias("df_ppm"),
    ).where(F.col("df_ppm") >= F.lit(int(min_df_ppm)))
    head = cand.orderBy(F.col("df").desc(), F.col("term").asc()).limit(int(top_r))
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return head.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", "df", "df_ppm"
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., p, value, n_rows): EXACT nearest-rank percentiles
    (ceil(p/100·n)-th smallest value — the classic definition, no
    interpolation) of an integer column, optionally per group. The
    deterministic complement to Spark's approx_percentile: identical on
    every engine because the answer is an order statistic, not an
    estimate, so it can gate corpus QA thresholds (dl p99, rsv p50)
    that an approximate sketch would make flaky.

    Scale shape: one rank window per group (the honest cost of an exact
    order statistic — grouped data sorts within its partition; for
    ungrouped corpus-wide use at 10^12 rows prefer dl_histogram /
    approx_percentile, which is why both exist) and a broadcast-sized
    join of the requested ranks."""
    spark = df.sparkSession
    gcols = list(group_cols or [])
    gexprs = [F.col(c) for c in gcols] or [F.lit(0).alias("__g")]
    part = gcols or ["__g"]
    base = df.select(*gexprs, F.col(value_col).cast("long").alias("__v"))
    w = Window.partitionBy(*part).orderBy(F.col("__v").asc())
    ranked = base.select(
        *part,
        "__v",
        F.row_number().over(w).cast("long").alias("__rk"),
        F.count(F.lit(1)).over(Window.partitionBy(*part)).cast("long").alias("n_rows"),
    )
    ps = F.broadcast(
        spark.createDataFrame([(int(p),) for p in percentiles], "p long")
    )
    hit = ranked.crossJoin(ps).where(
        F.col("__rk") == F.ceil(F.col("p") * F.col("n_rows") / F.lit(100)).cast("long")
    )
    out_cols = gcols + ["p"]
    return hit.select(
        *out_cols, F.col("__v").alias("value"), "n_rows"
    ).orderBy(*out_cols)


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_sentences, n_words, n_syllables, fk_grade_micros):
    Flesch–Kincaid grade level (Kincaid et al. 1975) — the classic
    readability gate some curation pipelines bucket by — from fully
    specified integer counts so any engine reproduces it:

    - sentences: maximal runs of [.!?] split the text; count =
      non-empty fragments holding ≥1 token (min 1 when any word
      exists, so the ratio is always defined);
    - words: the tokenizer's [a-z]+|[0-9]+ runs over the lowercased
      text;
    - syllables per word: vowel-group count — runs of [aeiouy] — with
      the silent-e discount (a word ending in 'e' whose vowel-group
      count is ≥2 drops one), min 1; digits-only tokens count 1. The
      standard dictionary-free approximation.

    fk_grade_micros = floor(10⁶ · (0.39·W/S + 11.8·Y/W − 15.59)), one
    fixed left-to-right IEEE chain over exact int64 counts (the repo's
    fixed-point recipe — associative-safe because the float math runs
    ONCE per row, never in an aggregate). Empty docs emit NULL grade.
    Map-only: zero shuffles at any corpus size."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")
    sent_frags = F.expr(f"filter(split(lower({text_col}), '[.!?]+'), s -> s rlike '[a-z0-9]')")
    syl = (
        "aggregate(__toks, cast(0 as bigint), (acc, w) -> acc + greatest(1,"
        " size(regexp_extract_all(w, '[aeiouy]+', 0))"
        " - (CASE WHEN w rlike '[a-z]*[^aeiouy]e$'"
        "          AND size(regexp_extract_all(w, '[aeiouy]+', 0)) >= 2"
        "     THEN 1 ELSE 0 END)))"
    )
    base = docs.select(
        F.col(id_col),
        F.size(sent_frags).cast("long").alias("__ns"),
        toks.alias("__toks"),
    ).select(
        F.col(id_col),
        F.greatest(F.col("__ns"), F.lit(1)).alias("n_sentences"),
        F.size("__toks").cast("long").alias("n_words"),
        F.expr(syl).alias("n_syllables"),
    )
    grade = F.when(
        F.col("n_words") > 0,
        F.floor(
            F.lit(1000000.0)
            * (
                F.lit(0.39) * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
                + F.lit(11.8) * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
                - F.lit(15.59)
            )
        ).cast("long"),
    )
    return base.select(
        id_col, "n_sentences", "n_words", "n_syllables", grade.alias("fk_grade_micros")
    )


def cross_source_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared_texts): the cross-source exact-dup
    contamination matrix — how many distinct text contents appear in
    BOTH sources (source_a < source_b lexicographically). The first
    audit a multi-source training mix needs: silent overlap between
    two "independent" crawls double-weights those documents.

    Plan: distinct (md5, source) pairs (one partial-agg shuffle keyed
    by content hash), then the per-hash source-set self-pairs — bounded
    by (sources-per-hash choose 2), with sources ≤ the source-universe
    size (tiny), never a corpus² blowup."""
    hs = (
        docs.select(
            F.md5(F.col(text_col).cast("binary")).alias("h"),
            F.col(source_col).alias("src"),
        )
        .distinct()
    )
    a = hs.select("h", F.col("src").alias("source_a"))
    b = hs.select("h", F.col("src").alias("source_b"))
    return (
        a.join(b, "h")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_texts"))
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, n_distinct_chars, entropy_cbits): character-
    distribution entropy at integer bit-length resolution — Σ_c n_c ·
    (bitlen(n) − bitlen(n_c)) over the lowercased character histogram
    (the repo's exact-integer log2 surprisal recipe; "cbits" = count-
    weighted bits). The classic cheap garbage detector: runs of one
    repeated character score ~0, natural text scores high; threshold
    per length band. Empty docs emit 0.

    Pure-JVM higher-order functions (distinct-chars × length filter
    scan per row — alphabet-bounded); map-only, zero shuffles."""
    a = F.expr(f"regexp_extract_all(lower({text_col}), '[\\\\s\\\\S]', 0)")
    ent = (
        "aggregate(transform(array_distinct(__a),"
        " c -> size(filter(__a, x -> x = c))),"
        " cast(0 as bigint),"
        " (acc, cnt) -> acc + cnt * (length(bin(size(__a))) - length(bin(cnt))))"
    )
    return docs.select(
        F.col(id_col),
        a.alias("__a"),
    ).select(
        F.col(id_col),
        F.size("__a").cast("long").alias("n_chars"),
        F.size(F.array_distinct("__a")).cast("long").alias("n_distinct_chars"),
        F.when(F.size("__a") > 0, F.expr(ent)).otherwise(F.lit(0)).cast("long").alias("entropy_cbits"),
    )


def mojibake_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_replacement, n_c1_controls, n_cp1252_sigs, is_suspect):
    encoding-damage detectors every web-text pipeline runs before
    training — U+FFFD replacement chars (decoder already gave up), C1
    control chars U+0080–U+009F (latin-1-decoded bytes that were never
    text), and the 'â€' bigram (the signature of CP1252-decoding UTF-8
    bytes — curly quotes/dashes mangle to â€™/â€œ/â€"). is_suspect
    flags any hit. Counts by regexp extraction — map-only, zero
    shuffles, portable regexes (no lookaround)."""
    t = F.col(text_col)

    def _cnt(pat):
        return F.size(F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)")).cast("long")

    n_rep = _cnt("\\\\uFFFD")
    n_c1 = _cnt("[\\\\u0080-\\\\u009F]")
    n_sig = _cnt("â€")
    return docs.select(
        F.col(id_col),
        n_rep.alias("n_replacement"),
        n_c1.alias("n_c1_controls"),
        n_sig.alias("n_cp1252_sigs"),
        ((n_rep > 0) | (n_c1 > 0) | (n_sig > 0)).alias("is_suspect"),
    )
