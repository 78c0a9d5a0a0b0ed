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

from pyspark.sql import Column, DataFrame
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
