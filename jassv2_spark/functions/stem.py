"""Porter stemmer (version 1, Porter 1980) for the optional `-tp` build path.

The reference applies Porter v1 to alpha tokens longer than 2 characters
(`tools/JASS_index.cpp:314-315`, `source/stem_porter.h` — "An algorithm for
suffix stripping", Program 14(3), 1980). This is an independent
implementation of the published algorithm (not a port of the reference's
ATIRE-derived code); vectorized via a pandas UDF for explode pipelines.

Tokens arriving here are already casefolded ASCII-lowercase alpha runs
(the tokenizer emits nothing else for alpha), so no case handling needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _m(word: str, j: int) -> int:
    """Porter's measure of word[0..j]: the m in [C](VC)^m[V]."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _is_cons(word, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _is_cons(word, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _is_cons(word, i):
                break
            i += 1
        i += 1


def _has_vowel(word: str, j: int) -> bool:
    return any(not _is_cons(word, i) for i in range(j + 1))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    return (
        _is_cons(word, i)
        and word[i] not in "wxy"
        and not _is_cons(word, i - 1)
        and _is_cons(word, i - 2)
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _m(stem, len(stem) - 1) > min_m - 1:
        return stem + repl
    return word  # suffix matched but condition failed → rule consumed


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase alpha token per Porter (1980)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        stem = w[:-3]
        if _m(stem, len(stem) - 1) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2], len(w) - 3):
            w, hit = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3], len(w) - 4):
            w, hit = w[:-3], True
        if hit:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _m(w, len(w) - 1) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1], len(w) - 2):
        w = w[:-1] + "i"

    # Step 2 (longest-match within the step, as published: match on
    # penultimate letter dispatch ≡ first suffix hit in table order works
    # because suffixes in the table are mutually exclusive per ending)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            out = _replace(w, suf, rep, 1)
            if out is not None:
                w = out
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            out = _replace(w, suf, rep, 1)
            if out is not None:
                w = out
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not (stem and stem[-1] in "st"):
                break
            if _m(stem, len(stem) - 1) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _m(stem, len(stem) - 1)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _ends_double_cons(w) and w[-1] == "l" and _m(w, len(w) - 1) > 1:
        w = w[:-1]

    return w


def stem_tokens(tokens: list[str] | None) -> list[str] | None:
    """Reference gating: stem only tokens with len > 2
    (`tools/JASS_index.cpp:314`); numeric tokens pass through untouched
    (they contain no alpha suffixes for the rules to fire on)."""
    if tokens is None:
        return None
    return [porter_stem(t) if len(t) > 2 and t.isalpha() else t for t in tokens]


@F.pandas_udf(ArrayType(StringType()))
def stem_tokens_udf(tok_col: pd.Series) -> pd.Series:
    return tok_col.map(stem_tokens)


def spark_stem(tokens_col: Column) -> Column:
    return stem_tokens_udf(tokens_col)
