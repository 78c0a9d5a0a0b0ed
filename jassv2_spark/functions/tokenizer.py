"""JASS-parity tokenizer, PySpark-native.

Re-implements the *semantics* of the reference document tokenizer
(`/root/reference/source/parser.cpp:79-423`) and query tokenizer
(`/root/reference/source/parser_query.cpp:21-106`) from scratch in Python:

- A token is a maximal run of *alphabetic* codepoints or of *numeric*
  codepoints (ASCII and Unicode runs join seamlessly: ``aβc`` is one token,
  `parser.cpp:146-157`).
- ``isalpha`` = Unicode "Alphabetic" (approximated as category L* plus Nl),
  ``isdigit`` = Unicode categories Nd/Nl/No — the same classes the reference
  code-generates from the Unicode database
  (`tools/unicode_database_to_c.cpp:20-23`).
- Every codepoint is normalized with the JASS recipe: **NFKD → strip
  non-alphanumerics → casefold** (`tools/unicode_database_to_c.cpp:711`).
  This is why ``①②③`` → ``123``, ``½`` → ``12``, and ``℃`` contributes only
  ``c`` (as a non-indexed "other" token) — see `parser.cpp::unittest`.
- XML-ish markup is consumed but NOT indexed: start/empty/end tags
  (attributes skipped, quote-aware), processing instructions ``<?..?>``,
  comments ``<!--..-->``, ``<!DOCTYPE..>``-style definitions, CDATA blocks
  (their *content is not indexed*), and ``<![ .. [`` conditionals — matching
  `parser.cpp:199-385` branch for branch, including its bounds checks.
- Punctuation / symbols are "other" tokens: never indexed
  (`tools/JASS_index.cpp:303-330` keeps only alpha/numeric).
- Tokens are truncated at ``MAX_TOKEN_BYTES`` UTF-8 bytes
  (`source/parser.h:81`, max_token_length = 1024), at folded-codepoint
  granularity like the reference's buffer guard.

Divergences (documented, not observable on the test corpora):
- The reference pins Unicode 6.3 tables; we use the Python runtime's
  ``unicodedata`` (a later Unicode). Differences are confined to codepoints
  added/reclassified between versions.
- The reference scans raw bytes and tolerates broken UTF-8; we operate on
  ``str`` (binary inputs are decoded with ``errors='replace'``).

Spark-side: the per-document scanner is wrapped in **Arrow-batched pandas
UDFs** (no row-at-a-time Python UDFs). Pure-ASCII markup-free documents take
a compiled-regex fast path (identical output, C-speed); for corpora that are
*known* all-ASCII there is also a 100% JVM expression path
(:func:`spark_ascii_tokens`) built on ``regexp_extract_all`` so the hot path
stays inside whole-stage codegen.
"""

from __future__ import annotations

import re
import sys
import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

MAX_TOKEN_BYTES = 1024  # source/parser.h:81

# Regex equivalent of the scanner on lowercase ASCII, markup-free text:
# alpha runs split from numeric runs (parser.cpp:131-185).
_ASCII_TOKEN_RE = re.compile(r"[a-z]+|[0-9]+")
# JVM-side pattern (applied after lower()): same token language.
ASCII_TOKEN_PATTERN = "[a-z]+|[0-9]+"

_ALPHA_CATS = frozenset({"Lu", "Ll", "Lt", "Lm", "Lo"})
_DIGIT_CATS = frozenset({"Nd", "Nl", "No"})
_ALNUM_CATS = _ALPHA_CATS | _DIGIT_CATS


@lru_cache(maxsize=None)
def _is_alpha(ch: str) -> bool:
    """Unicode Alphabetic, approximated (tools/unicode_database_to_c.cpp:20)."""
    cat = unicodedata.category(ch)
    return cat in _ALPHA_CATS or cat == "Nl"


@lru_cache(maxsize=None)
def _is_digit(ch: str) -> bool:
    """Unicode Nd/Nl/No (tools/unicode_database_to_c.cpp:23)."""
    return unicodedata.category(ch) in _DIGIT_CATS


@lru_cache(maxsize=None)
def fold(ch: str) -> str:
    """JASS normalization of one codepoint: NFKD → keep alnum → casefold.

    `tools/unicode_database_to_c.cpp:711` ("The JASS normalisation process
    is: Unicode NFKD normalization, remove all non-alphanumerics, then case
    fold").
    """
    decomposed = unicodedata.normalize("NFKD", ch)
    kept = "".join(c for c in decomposed if unicodedata.category(c) in _ALNUM_CATS)
    return kept.casefold()


# --- XML name character classes (parser.cpp:210-214, W3C XML productions 4/4a)

_XML_NAME_START_RANGES = (
    (0xC0, 0xD6),
    (0xD8, 0xF6),
    (0xF8, 0x2FF),
    (0x370, 0x37D),
    (0x37F, 0x1FFF),
    (0x200C, 0x200D),
    (0x2070, 0x218F),
    (0x2C00, 0x2FEF),
    (0x3001, 0xD7FF),
    (0xF900, 0xFDCF),
    (0xFDF0, 0xFFFD),
    (0x10000, 0xEFFFF),
)


@lru_cache(maxsize=None)
def _is_xml_name_start(ch: str) -> bool:
    if ch == ":" or ch == "_" or ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
        return True
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _XML_NAME_START_RANGES)


@lru_cache(maxsize=None)
def _is_xml_name_char(ch: str) -> bool:
    if _is_xml_name_start(ch):
        return True
    if ch in "-." or ("0" <= ch <= "9") or ch == "\xb7":
        return True
    cp = ord(ch)
    return 0x300 <= cp <= 0x36F or 0x203F <= cp <= 0x2040


def _consume_markup(s: str, i: int) -> int:
    """Consume an XML-ish construct starting at ``s[i] == '<'``.

    Returns the index of the first character after the construct. Mirrors
    the branch structure of `parser.cpp:199-385` (tags with quote-aware
    attribute skipping, end tags, PIs, comments, definitions, CDATA,
    conditionals) — none of these produce indexable tokens, so we only need
    the *consumption* behaviour, including the reference's exact bounds
    checks so truncated markup degrades identically.
    """
    n = len(s)
    i += 1  # past '<'
    if i >= n:
        return n
    c = s[i]
    if _is_xml_name_start(c):
        # Start/empty tag: skip name, then attributes (quote-aware) to '>'.
        i += 1
        while i < n and _is_xml_name_char(s[i]):
            i += 1
        while i < n and s[i] != ">":
            if s[i] == '"':
                i += 1
                while i < n and s[i] != '"':
                    i += 1
            elif s[i] == "'":
                i += 1
                while i < n and s[i] != "'":
                    i += 1
            i += 1
        return i + 1 if i < n else n
    if c == "/":
        # End tag only if '</' is followed by a name-start char; otherwise
        # '<' alone was an "other" token and scanning resumes at the '/'.
        if i + 1 < n and _is_xml_name_start(s[i + 1]):
            j = s.find(">", i + 1)
            return n if j < 0 else j + 1
        return i
    if c == "?":
        j = s.find("?>", i + 1)
        return n if j < 0 else j + 2
    if c == "!":
        b = i + 1  # position after '!'
        if b + 4 < n and s[b] == "-" and s[b + 1] == "-":
            j = s.find("-->", b + 2)
            return n if j < 0 else j + 3
        if b < n and "A" <= s[b] <= "Z":
            j = s.find(">", b)
            return n if j < 0 else j + 1
        if b + 9 < n and s[b] == "[" and s[b + 1 : b + 7] == "CDATA[":
            j = s.find("]]>", b + 7)
            return n if j < 0 else j + 3
        if b + 4 < n and s[b] == "[":
            j = s.find("[", b + 1)
            return n if j < 0 else j + 1
        # '<' and '!' were both consumed as "other" tokens.
        return b
    # '<' alone was an "other" token; resume at the char after it.
    return i


def _run_token(s: str, i: int, pred) -> tuple[str, int]:
    """Fold a maximal ``pred`` run starting at i; returns (token, next_i)."""
    parts: list[str] = []
    nbytes = 0
    n = len(s)
    while i < n and pred(s[i]):
        if nbytes < MAX_TOKEN_BYTES:
            folded = fold(s[i])
            for c in folded:  # folded-codepoint-granularity truncation
                b = len(c.encode("utf-8"))
                if nbytes + b > MAX_TOKEN_BYTES:
                    nbytes = MAX_TOKEN_BYTES
                    break
                parts.append(c)
                nbytes += b
        i += 1
    return "".join(parts), i


def tokenize(text: str | None, xml: bool = True) -> list[str]:
    """Indexable (alpha/numeric) tokens of ``text``, reference semantics.

    ``xml=True`` = document parser (`parser.cpp`); ``xml=False`` = query
    parser (`parser_query.cpp`: no markup handling, '<' is punctuation).
    """
    if text is None:
        return []
    if text.isascii() and (not xml or "<" not in text):
        toks = _ASCII_TOKEN_RE.findall(text.lower())
        if toks and max(map(len, toks)) > MAX_TOKEN_BYTES:
            toks = [t[:MAX_TOKEN_BYTES] for t in toks]
        return toks
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
        elif _is_alpha(ch):
            tok, i = _run_token(text, i, _is_alpha)
            out.append(tok)
        elif _is_digit(ch):
            tok, i = _run_token(text, i, _is_digit)
            out.append(tok)
        elif xml and ch == "<":
            i = _consume_markup(text, i)
        else:
            i += 1  # "other": one char, not indexable
    return out


# JASS_anytime's `-a` ("ascii parser") raw query mode
# (`source/parser_query.cpp:112-143` get_next_token_raw): tokens are maximal
# runs of non-whitespace bytes, NO normalization/casefold — the queries are
# assumed pre-normalized. Whitespace = C isspace = ASCII {space \t \n \v \f \r}
# (`source/ascii.h` table); NOT Unicode whitespace.
_RAW_TOKEN_RE = re.compile(r"[^ \t\n\x0b\f\r]+")
# Same token language for the JVM (java.util.regex) and DuckDB (RE2) sides;
# \x0B spelled explicitly because RE2's \s omits vertical tab.
RAW_TOKEN_PATTERN = "[^ \\t\\n\\x0B\\f\\r]+"


def tokenize_raw(text: str | None) -> list[str]:
    """Raw whitespace-split query tokens, reference `-a` semantics: no
    casefold, no markup, punctuation stays inside tokens."""
    return [] if text is None else _RAW_TOKEN_RE.findall(text)


def extract_text(html: bytes | str | None) -> str:
    """Extract the body from a ``<DOC><DOCNO>..</DOCNO>body</DOC>`` blob.

    The byte-identical per-url invariant of the input contract: for the
    synthetic corpus, ``extract_text(html) == text``. TREC framing follows
    `source/instream_document_trec.cpp:83-160`.
    """
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    m = re.search(r"<DOC>(?:\s*<DOCNO>.*?</DOCNO>)?(.*?)</DOC>", s, re.DOTALL)
    return m.group(1) if m else s


def make_tokenize_udf(xml: bool = True):
    """Arrow-batched pandas UDF: text column → array<string> of tokens."""

    @pandas_udf(ArrayType(StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: tokenize(t, xml=xml))

    return tokenize_udf


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched pandas UDF for :func:`extract_text` over binary html."""
    return html.map(extract_text)


def spark_ascii_tokens(col: Column) -> Column:
    """100% JVM tokenizer for *known all-ASCII, markup-free* text.

    Stays inside whole-stage codegen (``regexp_extract_all`` over
    ``lower(col)``); output is identical to :func:`tokenize` on that input
    class. Use for hot paths where the corpus contract guarantees ASCII.
    """
    return F.expr(f"regexp_extract_all(lower({col._jc.toString() if hasattr(col, '_jc') else col}), '{ASCII_TOKEN_PATTERN}', 0)")


def spark_tokens(text_col: str, mode: str = "parity", xml: bool = True) -> Column:
    """Tokenizer as a Column. mode: 'parity' (pandas UDF) | 'ascii' (JVM) |
    'raw' (JVM; the query-side `-a` whitespace mode, never for documents)."""
    if mode == "ascii":
        return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(ASCII_TOKEN_PATTERN), 0)
    if mode == "raw":
        return F.regexp_extract_all(F.col(text_col), F.lit(RAW_TOKEN_PATTERN), 0)
    return make_tokenize_udf(xml=xml)(F.col(text_col))
