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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
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
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, inter, uni, jaccard) for candidate pairs sharing ≥1
    n-gram shingle (doc_a < doc_b). Exact Jaccard over distinct shingles.

    `max_shingle_df` caps the document frequency of shingles admitted to
    the self-join: a Zipf-head shingle ("of the and") appearing in f docs
    creates an f² bucket, so ONE hot 3-gram over a web corpus turns the
    join quadratic. Shingles with df > cap are dropped from candidate
    generation (standard SimHash/MinHash-era practice — a shingle shared
    by half the corpus carries no dedup signal). Sizes (the Jaccard
    denominator) still count ALL shingles, so with cap ≥ the corpus' true
    max df the output is bit-identical to the uncapped plan; below it,
    `inter` undercounts by the dropped hot shingles only."""
    sh = _with_shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = sh
    if max_shingle_df is not None:
        admitted = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= F.lit(int(max_shingle_df)))
            .select("shingle")
        )
        joinable = sh.join(admitted, "shingle")
    a = joinable.select(F.col(id_col).alias("doc_a"), "shingle")
    b = joinable.select(F.col(id_col).alias("doc_b"), "shingle")
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

    Arrow-batched pandas UDF with a numpy kernel: per unique token the md5
    digest's first 8 bytes are expanded to a 64-lane ±1 row via
    ``np.unpackbits`` (cached across the batch — the Zipf head amortizes),
    and the per-document bit votes are one weighted matrix sum. Bit k of
    the fingerprint is bit k of the big-endian uint64 of ``md5(tok)[:8]``;
    the result is the signed-64 reinterpretation (portable: the DuckDB
    oracle reproduces it from hex(md5) exactly).
    """
    import re as _re

    tok_re = _re.compile(TOKEN_PATTERN)

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        bit_cache: dict[str, np.ndarray] = {}

        def one(t):
            if t is None:
                return 0
            toks = tok_re.findall(t.lower())
            if not toks:
                return 0
            counts: dict[str, int] = {}
            for m in toks:
                counts[m] = counts.get(m, 0) + 1
            rows = np.empty((len(counts), 64), dtype=np.int64)
            w = np.empty(len(counts), dtype=np.int64)
            for j, (tok, cnt) in enumerate(counts.items()):
                bits = bit_cache.get(tok)
                if bits is None:
                    d8 = hashlib.md5(tok.encode()).digest()[:8]
                    # lane k == (int.from_bytes(d8,'big') >> k) & 1
                    bits = np.unpackbits(
                        np.frombuffer(d8, dtype=np.uint8)[::-1], bitorder="little"
                    ).astype(np.int64)
                    bit_cache[tok] = bits
                rows[j] = bits
                w[j] = cnt
            acc = ((2 * rows - 1) * w[:, None]).sum(axis=0)
            packed = np.packbits((acc > 0).astype(np.uint8), bitorder="little")
            return int(packed.view("<u8")[0].astype(np.int64))

        return texts.map(one)

    return docs.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def simhash_hamming_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming): SimHash near-dup pairs with Hamming distance
    ≤ max_distance.

    GUARANTEED-recall candidate generation by pigeonhole: 64 bits split into
    ``max_distance + 1`` blocks — any pair within distance d must agree on
    at least one whole block — so candidates come from an equi-join keyed on
    (block_idx, block_value), never an all-pairs scan. Exact popcount
    verification (`bit_count(a ^ b)`) filters candidates; both stages are
    pure JVM expressions. With d=3 the blocks are 16-bit: ~2^16 buckets per
    block index, uniformly filled (md5 bits), so bucket joins stay bounded
    at corpus scale."""
    n_blocks = max_distance + 1
    if not 1 <= n_blocks <= 64:
        raise ValueError("max_distance must be in [0, 63]")
    width = 64 // n_blocks
    fp = (
        fingerprints
        if fingerprints is not None
        else simhash_fingerprints(docs, text_col, id_col)
    )
    blocks = []
    for b in range(n_blocks):
        w = width if b < n_blocks - 1 else 64 - width * (n_blocks - 1)
        mask = (1 << w) - 1
        blocks.append(
            F.struct(
                F.lit(b).alias("block_idx"),
                F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("block_val"),
            )
        )
    banded = fp.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*blocks)).alias("blk")
    ).select(
        F.col(id_col),
        "simhash",
        F.col("blk.block_idx").alias("block_idx"),
        F.col("blk.block_val").alias("block_val"),
    )
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sa"), "block_idx", "block_val"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sb"), "block_idx", "block_val"
    )
    return (
        a.join(b, ["block_idx", "block_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(sa ^ sb)").cast("long").alias("hamming"))
        .where(F.col("hamming") <= F.lit(int(max_distance)))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, label): connected-component label = min node id reachable from
    each node over the undirected `pairs` graph; nodes with no edges keep
    their own id (singleton clusters).

    Distributed min-label propagation with pointer jumping. Per iteration:

      1. neighbour min:  label(v) <- min(label(v), min over {u : u~v} label(u))
         — one shuffle join keyed on node id + one partial-agg groupBy;
      2. pointer jump:   label(v) <- label(label(v))
         — one more keyed join; halves pointer-tree height each round, so
         convergence is O(log diameter) iterations rather than O(diameter).

    Labels only ever DECREASE, so sum(label) is a strictly monotone
    potential: the loop stops when the sum is unchanged (one scalar agg per
    iteration — no row-wise diff join). Every join/groupBy is keyed on the
    id itself (uniform at web scale where ids are hashes/dense ints); the
    per-iteration lineage is truncated with localCheckpoint so the plan does
    not grow — on a real cluster point `spark.sparkContext.setCheckpointDir`
    at durable storage and swap in `.checkpoint()`.

    The reference engine has no clustering stage (dedup is out of its
    scope); this is the standard LSH-pairs -> duplicate-clusters closure a
    training-data pipeline needs (cf. MinHash-LSH dedup in web-corpus
    curation), built as a from-scratch DataFrame plan.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        nb = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nb_min"))
        )
        l1 = labels.join(nb, "node", "left").select(
            "node", F.least(F.col("label"), F.coalesce("nb_min", "label")).alias("label")
        )
        ptr = l1.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        l2 = (
            l1.withColumnRenamed("label", "mid")
            .join(ptr, F.col("mid") == F.col("p_node"), "left")
            .select("node", F.coalesce("p_label", "mid").alias("label"))
        )
        labels = l2.localCheckpoint(eager=True)
        s = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def dedup_cluster_assign(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size): every document labelled with its
    near-duplicate cluster — the transitive closure of MinHash-LSH candidate
    pairs — cluster_id = smallest doc id in the cluster (the deterministic
    survivor a dedup policy keeps). Docs with no near-dup candidates form
    size-1 clusters."""
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, text_col, id_col, n, num_hashes, bands)
    labels = connected_components(pairs, docs.select(id_col), id_col=id_col)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").cast("long").alias(id_col),
        F.col("label").cast("long").alias("cluster_id"),
        "cluster_size",
    )


def repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    length: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens): maximal token spans
    covered by `length`-token substrings that occur ≥ `min_count` times
    across the whole corpus (self-repeats included) — the exact-substring
    dedup of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022), at token granularity. A curation pipeline cuts
    these spans out of the training text.

    Plan: per-doc rolling `length`-token shingles with positions (one JVM
    transform + inline, no Python); one groupBy on the shingle md5 to find
    repeated substrings (partial-agg, content-hash keyed → uniform); a
    LEFT SEMI join to keep hot occurrences (semi join: no row blowup,
    whatever the repeat count — a million-fold boilerplate shingle
    contributes its occurrences once each, never a pairwise product);
    then gaps-and-islands interval merge per doc (running-max window).
    Span positions are 0-based token indexes, end inclusive."""
    occ = (
        docs.select(
            F.col(id_col),
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)").alias("tk"),
        )
        .where(F.expr(f"size(tk) >= {length}"))
        .select(
            F.col(id_col),
            F.expr(
                f"""inline(transform(sequence(1, size(tk) - {length} + 1),
                     i -> struct(i - 1 AS start_tok, i + {length} - 2 AS end_tok,
                                 md5(cast(concat_ws(' ', slice(tk, i, {length})) AS binary)) AS g)))"""
            ),
        )
    )
    hot = occ.groupBy("g").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") >= min_count)
    spans = occ.join(hot.select("g"), "g", "left_semi")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("start_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        F.col(id_col),
        "start_tok",
        "end_tok",
        F.when(
            F.col("start_tok") > F.coalesce(F.max("end_tok").over(w), F.lit(-2)) + 1, 1
        ).otherwise(0).alias("new_island"),
    )
    wisl = (
        Window.partitionBy(id_col)
        .orderBy("start_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        F.col(id_col), "start_tok", "end_tok", F.sum("new_island").over(wisl).alias("island")
    )
    return islands.groupBy(id_col, "island").agg(
        F.min("start_tok").cast("long").alias("span_start"),
        F.max("end_tok").cast("long").alias("span_end"),
    ).select(
        F.col(id_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
    )


def dup_rate_over_time(
    docs: DataFrame,
    doc_ts: DataFrame,
    bucket_s: int = 3600,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(bucket, n_docs, n_dups, dup_ppm): per-time-bucket exact-duplicate
    rate — "how much of this crawl window is content we already had" (the
    crawl-health metric behind recrawl-policy tuning; CC-style crawls
    routinely re-fetch unchanged pages). A document is a duplicate iff an
    md5-identical document exists EARLIER in crawl order — (bucket,
    doc_id) lexicographic, so exactly one member of every duplicate group
    (its first occurrence) is original, deterministically. Buckets are
    relative to the corpus' earliest timestamp (`trending_terms`' rule:
    timezone/epoch cancel). dup_ppm = (10⁶·n_dups) DIV n_docs — exact.

    Scale shape: one md5 map pass; one (hash)-keyed agg carrying the
    group's min (bucket, doc_id) as a packed struct-min (partial-agg
    friendly); one broadcast-sized reference time; one (bucket)-keyed
    roll-up. Never corpus×corpus."""
    ts = doc_ts.select(
        F.col(id_col).alias("__id"),
        F.unix_timestamp(F.col(ts_col)).alias("__epoch"),
    )
    ref = ts.agg(F.min("__epoch").alias("__ref"))
    d = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.md5(F.col(text_col).cast("binary")).alias("h"),
        )
        .join(ts, "__id")
        .crossJoin(F.broadcast(ref))
        .select(
            "h", "__id",
            F.expr(f"(__epoch - __ref) DIV {int(bucket_s)}").alias("bucket"),
        )
    )
    first = d.groupBy("h").agg(
        F.min(F.struct("bucket", "__id")).alias("first")
    )
    flagged = d.join(first, "h").select(
        "bucket",
        (
            (F.col("bucket") != F.col("first.bucket"))
            | (F.col("__id") != F.col("first.__id"))
        ).cast("long").alias("is_dup"),
    )
    return flagged.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_dups"),
    ).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_docs",
        "n_dups",
        F.expr("(1000000 * n_dups) DIV n_docs").cast("long").alias("dup_ppm"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp): winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken SIGMOD'03 — the MOSS algorithm) over raw lowered CHARACTERS:
    hash every k-gram (md5 hex, engine-portable), slide a w-hash window,
    keep each window's minimum. GUARANTEE (the paper's Thm. 1): two
    documents sharing an exact substring of length ≥ w + k − 1 share at
    least one fingerprint — the detection primitive for exact-substring
    training-data dedup (Lee et al. ACL 2022 find verbatim repeats this
    token-insensitive form catches and bag-of-words MinHash misses).

    Docs with ≥1 k-gram but fewer than w of them emit one fingerprint
    (the global min); docs shorter than k characters emit none.

    Scale shape: ENTIRELY in-row JVM higher-order functions (transform /
    slice / array_min over md5 hex strings — lexicographic min, no int
    conversion) followed by array_distinct + one explode. Map-only, no
    shuffle, no UDF; fan-out ≤ chars/1 pre-distinct but duplicates
    collapse in-row first, so the exploded stream is the selected
    fingerprint set only (~1/w of positions, the paper's density bound)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    hs = (
        f"transform(sequence(1, length(__s) - {k} + 1),"
        f" i -> md5(substring(__s, i, {k})))"
    )
    fps = (
        f"CASE WHEN size(__hs) >= {w} THEN"
        f" array_distinct(transform(sequence(1, size(__hs) - {w} + 1),"
        f"   j -> array_min(slice(__hs, j, {w}))))"
        f" ELSE array(array_min(__hs)) END"
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__s"))
        .where(F.length("__s") >= k)
        .select("id", F.expr(hs).alias("__hs"))
        .select("id", F.explode(F.expr(fps)).alias("fp"))
    )


def substring_dup_pairs(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_shared): candidate pairs sharing ≥ 1 winnowing
    fingerprint — i.e. likely sharing an exact ≥ (w+k−1)-char substring —
    with doc_a < doc_b and the shared-fingerprint count as evidence.

    `max_df` drops fingerprints occurring in more than that many docs
    before the self-join (boilerplate chrome — copyright lines, nav bars —
    lands in near-every page and would go quadratic; the same Zipf-head
    cap the shingle joins use). Scale shape: fingerprint df is one keyed
    agg; the candidate join is an EQUI-join on fp with per-key fan-out
    ≤ max_df², never all-pairs."""
    fps = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    small = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= F.lit(max_df))
        .select("fp")
    )
    kept = fps.join(small, "fp")
    a = kept.select("fp", F.col("id").alias("doc_a"))
    b = kept.select("fp", F.col("id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def dedup_keep_best(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    clusters: DataFrame | None = None,
    quality: DataFrame | None = None,
    quality_col: str = "quality",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, quality, rep_doc_id, keep):
    near-dup retention by QUALITY instead of the min-id default — per
    cluster the survivor is the highest-quality member (tie → smallest
    doc id), the policy corpus curation actually wants (keep the
    richest copy of a boilerplate family, not whichever crawled first;
    cf. the dedup-then-filter ordering discussion in web-corpus
    pipelines, e.g. RefinedWeb §3.3 / C4's dedup choices).

    Defaults: clusters = :func:`dedup_cluster_assign` (MinHash-LSH
    closure), quality = distinct-token count (`n_types` — an
    exact-integer richness proxy; pass any (doc_id, quality) table for
    model-based scores).

    Scale shape: quality is a map-only pass; the join is doc-keyed; the
    survivor pick is one window per cluster over cluster-sized frames
    (bounded — near-dup families are small; a pathological mega-cluster
    bounds its own frame, not the shuffle)."""
    if clusters is None:
        clusters = dedup_cluster_assign(
            docs, text_col, id_col, n=n, num_hashes=num_hashes, bands=bands
        )
    if quality is None:
        from jassv2_spark.operators.textstats import quality_scores

        quality = quality_scores(docs, text_col=text_col, id_col=id_col).select(
            id_col, F.col("n_types").alias(quality_col)
        )
    joined = clusters.join(
        quality.select(F.col(id_col).cast("long").alias(id_col), quality_col),
        id_col,
        "left",
    ).select(
        F.col(id_col),
        "cluster_id",
        "cluster_size",
        F.coalesce(F.col(quality_col), F.lit(0)).cast("long").alias("quality"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return joined.select(
        id_col,
        "cluster_id",
        "cluster_size",
        "quality",
        F.first(id_col).over(w).cast("long").alias("rep_doc_id"),
    ).withColumn("keep", F.col(id_col) == F.col("rep_doc_id"))


def lsh_candidate_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    tau_num: int = 1,
    tau_den: int = 2,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """ONE summary row measuring the MinHash-LSH candidate generator
    against exact n-gram Jaccard ground truth at threshold τ = tau_num /
    tau_den: (n_true, n_candidates, tp, fp, fn, precision_ppm,
    recall_ppm). The number every banding choice (rows × bands) is
    tuned by — the S-curve's realized precision/recall on THIS corpus —
    computed exactly rather than from the (1-(1-s^r)^b) formula.

    τ compares as an exact rational (inter·den ≥ num·uni — no float
    threshold drift between engines); ppm ratios are exact integer
    div, with the vacuous-case convention precision = recall = 10^6
    when the denominator set is empty.

    Scale shape: reuses the two existing pair plans (banded LSH join;
    df-capped shingle join for truth) plus one full-outer pair-keyed
    join and a global agg. Exact truth is the expensive side by design
    — at 10^12 docs run this on a sampled slice (hash-prefix of doc_id)
    to audit the banding, never corpus-wide."""
    truth = (
        ngram_jaccard_pairs(
            docs, text_col, id_col, n=n, max_shingle_df=max_shingle_df
        )
        .where(F.col("inter") * F.lit(int(tau_den)) >= F.lit(int(tau_num)) * F.col("uni"))
        .select("doc_a", "doc_b", F.lit(True).alias("is_true"))
    )
    cand = minhash_lsh_pairs(
        docs, text_col, id_col, n=n, num_hashes=num_hashes, bands=bands
    ).select("doc_a", "doc_b", F.lit(True).alias("is_cand"))
    j = truth.join(cand, ["doc_a", "doc_b"], "full")

    def _n(c):  # empty-input agg must read 0, not NULL
        return F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).cast("long")

    return j.agg(
        _n(F.col("is_true")).alias("n_true"),
        _n(F.col("is_cand")).alias("n_candidates"),
        _n(F.col("is_true") & F.col("is_cand")).alias("tp"),
        _n(F.col("is_cand") & F.col("is_true").isNull()).alias("fp"),
        _n(F.col("is_true") & F.col("is_cand").isNull()).alias("fn"),
    ).select(
        "n_true",
        "n_candidates",
        "tp",
        "fp",
        "fn",
        F.coalesce(
            F.expr("1000000 * tp div nullif(n_candidates, 0)"), F.lit(1000000)
        ).cast("long").alias("precision_ppm"),
        F.coalesce(
            F.expr("1000000 * tp div nullif(n_true, 0)"), F.lit(1000000)
        ).cast("long").alias("recall_ppm"),
    )


def minhash_estimate_audit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, n_hash_agree, est_ppm, true_ppm, err_ppm): the
    MinHash ESTIMATOR audited against exact Jaccard on the LSH candidate
    pairs — agreement fraction of the `num_hashes` signature components
    is the unbiased Jaccard estimate (Broder 1997), and this measures
    its realized error on THIS corpus (est_ppm = 10⁶·agree div
    num_hashes; true_ppm = 10⁶·inter div uni; err = |est − true|).
    Together with :func:`lsh_candidate_quality` (does banding FIND the
    pairs) this closes the measurement loop: does the signature RANK
    them right.

    Scale shape: candidates come from the banded join (never
    all-pairs); signatures join by doc id twice; the exact
    inter/uni verification is per-candidate only."""
    sig = minhash_signatures(docs, text_col, id_col, n, num_hashes)
    cand = minhash_lsh_pairs(
        docs, text_col, id_col, n, num_hashes, bands
    ).select("doc_a", "doc_b")
    a = sig.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)]
    )
    b = sig.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)]
    )
    agree = None
    for i in range(num_hashes):
        t = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    truth = ngram_jaccard_pairs(docs, text_col, id_col, n=n).select(
        "doc_a", "doc_b", "inter", "uni"
    )
    est = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", agree.cast("long").alias("n_hash_agree"))
        .join(truth, ["doc_a", "doc_b"])  # candidates share ≥1 shingle ⇒ inner is total
    )
    return est.select(
        "doc_a",
        "doc_b",
        "n_hash_agree",
        F.expr(f"1000000 * n_hash_agree div {num_hashes}").cast("long").alias("est_ppm"),
        F.expr("1000000 * inter div uni").cast("long").alias("true_ppm"),
        F.expr(f"abs(1000000 * n_hash_agree div {num_hashes} - 1000000 * inter div uni)")
        .cast("long")
        .alias("err_ppm"),
    )
