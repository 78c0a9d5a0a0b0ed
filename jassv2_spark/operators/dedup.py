"""Deduplication operators for web-scale corpora.

- exact_duplicates: hash-groupBy on content (md5) — one shuffle, partial-agg
  friendly; at 100 TB group by a 128-bit digest, never the raw text.
- ngram_jaccard_pairs: exact n-gram-shingle Jaccard via a shingle-keyed
  self-join — the *verification* step; quadratic only within shingle
  buckets.
- minhash_lsh_pairs: MinHash signatures + banded LSH — the *scale* path:
  candidate pairs are docs sharing a band bucket, so the self-join is keyed
  on (band_idx, band_hash) and never goes quadratic. Hash family is
  md5(f"{i}:{shingle}") with lexicographic min — portable across engines
  (no engine-specific hash), deterministic, and uniform enough for LSH.
- simhash_fingerprints: 64-bit SimHash over token md5s (vectorized pandas
  UDF; bit-level ops are not expressible as portable SQL).

All are pure DataFrame plans except SimHash; every shuffle is keyed on
content-derived hashes → uniformly distributed, skew-free by construction.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jassv2_spark.operators.textstats import TOKEN_PATTERN


def _shingles(text_col: str, n: int):
    return F.expr(
        f"""
        CASE WHEN size(__toks) < {n} THEN array(array_join(__toks, ' '))
        ELSE array_distinct(transform(sequence(1, size(__toks) - {n - 1}),
             i -> array_join(slice(__toks, i, {n}), ' ')))
        END
        """
    )


def _with_shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        docs.select(
            F.col(id_col),
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)").alias("__toks"),
        )
        .select(F.col(id_col), F.explode(_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_dups, keep_id): md5-exact duplicate groups; keep_id is
    the smallest id of the group (deterministic survivor)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """(doc_a, doc_b, inter, uni, jaccard) for candidate pairs sharing ≥1
    n-gram shingle (doc_a < doc_b). Exact Jaccard over distinct shingles."""
    sh = _with_shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("sa")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("sb")), "doc_b")
        .withColumn("uni", (F.col("sa") + F.col("sb") - F.col("inter")).cast("long"))
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni").cast("double"))
        .select("doc_a", "doc_b", F.col("inter").cast("long").alias("inter"), "uni", "jaccard")
    )
    if min_jaccard > 0.0:
        out = out.where(F.col("jaccard") >= F.lit(min_jaccard))
    return out


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, h0..h{num_hashes-1}): MinHash signature — per hash function i,
    the lexicographic min of md5(f"{i}:{shingle}") over the doc's shingles."""
    sh = _with_shingles(docs, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")).cast("binary"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands): LSH candidate pairs — docs whose
    MinHash signatures collide in ≥1 of `bands` bands (rows = num_hashes /
    bands). The self-join is keyed on (band_idx, band_hash): bounded
    buckets, no quadratic blowup."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    band_cols = []
    for bidx in range(bands):
        parts = [f"h{bidx * rows + r}" for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(bidx).alias("band_idx"),
                F.md5(F.concat(*[F.col(p) for p in parts]).cast("binary")).alias("band_hash"),
            )
        )
    banded = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("b")).select(
        F.col(id_col), F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )
    a = banded.select(F.col(id_col).alias("doc_a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("doc_b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): 64-bit SimHash over tf-weighted token md5s.

    Arrow-batched pandas UDF (bit-twiddling isn't portable SQL). Near-dup
    candidates = fingerprints within small Hamming distance; pair them by
    joining on rotated prefixes (future work in ann.py's LSH style).
    """
    import re as _re

    tok_re = _re.compile(TOKEN_PATTERN)

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return 0
            counts: dict[str, int] = {}
            for m in tok_re.findall(t.lower()):
                counts[m] = counts.get(m, 0) + 1
            acc = [0] * 64
            for tok, w in counts.items():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for bit in range(64):
                    acc[bit] += w if (h >> bit) & 1 else -w
            v = 0
            for bit in range(64):
                if acc[bit] > 0:
                    v |= 1 << bit
            # to signed 64-bit
            return v - (1 << 64) if v >= (1 << 63) else v

        return texts.map(one)

    return docs.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))
