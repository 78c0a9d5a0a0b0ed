"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, sequence packing, and per-domain cap sampling.

These are the curation passes a 100 TB pre-training pipeline runs after
quality filtering (textstats.gopher_quality) and dedup (operators.dedup):
drop eval-set contamination (Brown et al. 2020, appendix C: 13-gram
overlap decontamination), pack documents into fixed-length training
sequences, and bound each domain's contribution (C4-style per-host caps,
Raffel et al. 2020 §2.2).

All three are engine-portable by construction — exact integer math,
md5-derived buckets, and deterministic tie-breaks — so the DuckDB oracle
reproduces them bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jassv2_spark.operators.textstats import TOKEN_PATTERN, _toks


def _doc_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): one row per n-gram occurrence position (duplicates kept;
    callers dedup as needed). Pure-JVM: regexp tokenize → transform over a
    1-based index sequence → explode."""
    grams = F.when(
        F.size("__tk") >= n,
        F.expr(
            f"transform(sequence(1, size(__tk) - {n} + 1),"
            f" i -> array_join(slice(__tk, i, {n}), ' '))"
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))
    return (
        docs.select(F.col(id_col), _toks(text_col).alias("__tk"))
        .select(F.col(id_col), F.explode(grams).alias("gram"))
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated): for every training document, the
    number of distinct token n-grams it shares with ANY document of the
    evaluation/benchmark set, and the contamination verdict (n_hits > 0).

    The GPT-3 decontamination recipe (Brown et al. 2020 appendix C) at
    engine scale: the benchmark side is always tiny relative to the corpus
    (thousands of eval documents vs 10^12 training documents), so its
    distinct n-gram set is BROADCAST and the expensive side stays a
    map-only scan — tokenize, enumerate n-grams, hash-probe the broadcast
    set. Only matching (doc, gram) pairs reach the one small shuffle
    (count-distinct per contaminated doc), then a broadcast join hangs the
    hit counts back onto the train ids. At 100 TB nothing but true matches
    ever shuffles.
    """
    ev_grams = _doc_ngrams(eval_docs, n, id_col, text_col).select("gram").distinct()
    hits = (
        _doc_ngrams(train, n, id_col, text_col)
        .join(F.broadcast(ev_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").cast("long").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(F.broadcast(hits), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """(doc_id, source, n_tok, tok_start, seq_first, seq_last): GPT-style
    concatenation packing. Within each shard (default: the `source`
    column), documents are concatenated in id order into one token stream
    that is chunked into fixed `ctx_len` training sequences; each document
    reports its token offset and the first/last sequence index it lands in
    (documents may span a boundary — the standard causal-LM packing).

    Scale shape: ONE shuffle, partitioned by shard — each shard's running
    offset is a window cumulative sum over its own partition, so shards
    pack in parallel and no global total order is ever imposed (a global
    sort at 10^12 docs would serialize; per-shard offsets are exactly what
    a sharded training loader consumes). Empty documents occupy zero
    tokens and report seq_last = seq_first at their offset.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(_toks(text_col)).cast("long")
    d = docs.select(F.col(id_col), F.col(shard_col), n_tok.alias("n_tok"))
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    d = d.select(id_col, shard_col, "n_tok", start.alias("tok_start"))
    last_tok = F.col("tok_start") + F.greatest(F.col("n_tok"), F.lit(1)) - 1
    return d.select(
        id_col, shard_col, "n_tok", "tok_start", last_tok.alias("__last")
    ).select(
        F.col(id_col),
        F.col(shard_col),
        F.col("n_tok"),
        F.col("tok_start"),
        F.expr(f"tok_start div {ctx_len}").cast("long").alias("seq_first"),
        F.expr(f"__last div {ctx_len}").cast("long").alias("seq_last"),
    )


def chunk_passages(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, tok_start, n_tok, chunk_text): per-document
    sliding token windows with overlap — the passage-chunking prep for
    retrieval/embedding training and RAG ingestion (DPR, Karpukhin et al.
    2020 §4.1 splits pages into fixed-length passages; overlap via
    stride < window is the standard recall hedge). Complements
    :func:`pack_sequences`, which concatenates ACROSS documents for causal
    LM training; this op never crosses a document boundary.

    Chunk starts are 0, stride, 2·stride, …; each covers up to `window`
    tokens; a start is emitted only while it adds unseen tokens, so
    n_chunks = 1 + ceil((n − window)/stride) for n > window, else 1 —
    every token lands in ≥ 1 chunk and the tail chunk may be short. Empty
    documents emit one empty chunk (n_tok = 0) to keep per-doc
    accountability.

    Scale shape: MAP-ONLY — tokenize, per-row chunk-count arithmetic, one
    explode over sequence(0, n_chunks−1), JVM `slice`/`array_join`; no
    shuffle, no UDF, fan-out ≈ n_tokens/stride per doc. Deterministic pure
    function of the row ⇒ the DuckDB oracle matches exactly."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    n_chunks = F.expr(
        f"CASE WHEN size(__tk) <= {window} THEN 1"
        f" ELSE 1 + ((size(__tk) - {window}) + {stride} - 1) DIV {stride} END"
    )
    return (
        docs.select(F.col(id_col), _toks(text_col).alias("__tk"))
        .select(
            F.col(id_col),
            F.col("__tk"),
            F.size("__tk").cast("long").alias("__n"),
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("tok_start"),
            F.least(
                F.lit(window).cast("long"),
                F.col("__n") - F.col("chunk_idx") * stride,
            ).alias("n_tok"),
            F.array_join(
                F.expr(f"slice(__tk, chunk_idx * {stride} + 1, {window})"), " "
            ).alias("chunk_text"),
        )
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_total: int | None = None,
) -> DataFrame:
    """(doc_id, n_tok, sum_bits, mean_bits): a perplexity-proxy quality
    signal from a corpus-level unigram language model — per token,
    surprisal ≈ log2(N / count(token)) taken as the EXACT integer
    bit-length difference bits(N) - bits(count), where bits(x) =
    length(bin(x)) = floor(log2 x) + 1. Documents full of rare tokens
    score high (gibberish / boilerplate-stripped residue), documents of
    common tokens score low — the CCNet bucketing signal (Wenzek et al.
    2020) without a trained LM.

    Integer bit-lengths instead of floating log: both engines compute
    length(bin(x)) identically, so the oracle matches bitwise where a
    transcendental log2 would drift in the last ulp. mean_bits is the one
    exact IEEE division sum/n, emitted in the same order on both sides.

    Scale shape: token explode is map-side; ONE vocab-sized shuffle builds
    the count table (partial-agg combines upstream), which then broadcasts
    — vocabularies are millions of rows vs 10^12 documents — onto the
    exploded tokens (map-side probe), and ONE doc-keyed shuffle sums per
    document. Pass `n_total` (the collection token count — a build
    statistic every index already tracks) to keep the plan strictly
    two-pass; when omitted it is derived lazily from the vocab table,
    which costs one extra tokenize pass unless the upstream is cached.
    """
    toks = docs.select(F.col(id_col), F.explode(_toks(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    if n_total is not None:
        total_col = F.lit(int(n_total)).cast("long")
        joined = toks.join(F.broadcast(vocab), "tok")
    else:
        total = vocab.agg(F.sum("cnt").cast("long").alias("n_total"))
        total_col = F.col("n_total")
        joined = toks.join(F.broadcast(vocab), "tok").crossJoin(F.broadcast(total))
    bits = (F.length(F.bin(total_col)) - F.length(F.bin(F.col("cnt")))).cast("long")
    per_doc = (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(bits).cast("long").alias("sum_bits"),
        )
    )
    n_tok = F.coalesce(F.col("n_tok"), F.lit(0).cast("long"))
    sum_bits = F.coalesce(F.col("sum_bits"), F.lit(0).cast("long"))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            n_tok.alias("n_tok"),
            sum_bits.alias("sum_bits"),
            F.when(
                n_tok > 0, sum_bits.cast("double") / n_tok.cast("double")
            )
            .otherwise(F.lit(0.0))
            .alias("mean_bits"),
        )
    )


def domain_cap_sample(
    docs: DataFrame,
    cap: int = 15,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """(doc_id, source, bucket, rk, keep): deterministic per-domain cap —
    every domain keeps at most `cap` documents, chosen as the cap lowest
    md5-derived buckets (ties broken by id). The C4-style bound on any
    single host/domain dominating the mix, made reproducible: hash rank,
    not random sample, so re-runs, incremental ingest of OTHER domains,
    and engine changes never alter which documents a domain keeps.

    Scale shape: one shuffle partitioned by domain; each domain ranks only
    its own partition (window row_number). Domain skew is the pipeline's
    known hazard — a mega-domain serializes its own rank; the mitigation
    at 10^12 docs is a pre-pass that routes domains with count <= cap
    straight through (they keep everything, no rank needed) so only the
    rare over-cap domains shuffle. Kept as the simple single-window form
    here; the bucket is the same 32-bit md5 prefix as split_assign, so
    cap-sampling composes with the train/val split without correlation.
    """
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(domain_col).orderBy("bucket", id_col)
    d = docs.select(F.col(id_col), F.col(domain_col), bucket.alias("bucket"))
    return d.select(
        id_col,
        domain_col,
        "bucket",
        F.row_number().over(w).cast("long").alias("rk"),
    ).select(
        id_col,
        domain_col,
        "bucket",
        "rk",
        (F.col("rk") <= cap).alias("keep"),
    )


def dyadic_exponent(alpha: float, max_m: int = 6) -> tuple[int, int]:
    """Express the sampling exponent ``1 - alpha`` as ``j / 2**m`` exactly.

    Every Python float is a dyadic rational, but only small denominators
    (≤ 2**max_m) admit the portable sqrt-product evaluation below; for
    anything else (e.g. 0.7) raise and name the nearest admissible value,
    rather than silently computing a different mix.
    """
    from fractions import Fraction

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    fr = Fraction(1.0 - alpha)
    if fr.denominator > (1 << max_m):
        near = round(alpha * (1 << max_m)) / (1 << max_m)
        raise ValueError(
            f"alpha={alpha} is not a dyadic rational with denominator "
            f"<= 2^{max_m}; nearest admissible value is {near} "
            f"({round(alpha * (1 << max_m))}/{1 << max_m})"
        )
    m = fr.denominator.bit_length() - 1
    return fr.numerator, m


def temperature_mix_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """(doc_id, source, n_source, rate, keep): temperature-flattened domain
    mixing — each domain is down-sampled at rate = (n_min / n_domain)^(1-alpha),
    so post-sampling domain shares go as n^alpha: the standard flattening
    between proportional (alpha=1) and uniform (alpha=0) mixes used for
    multilingual / multi-domain pre-training (Devlin et al. 2019
    exponent-0.7 recipe, Conneau & Lample 2019 alpha=0.5 i.e. tau=2).

    alpha must be a DYADIC rational (k/2^m, m ≤ 6): with 1-alpha = j/2^m
    the rate is evaluated as y = sqrt applied m times to x = n_min/n, then
    y multiplied j times left-to-right. sqrt is the one power IEEE 754
    requires correctly rounded and IEEE multiplication is exact-order
    deterministic, so every engine computes the IDENTICAL double — where a
    general pow() drifts in the last ulp across libms. (For j > 1 the
    product is the recipe's defined value, within 1-2 ulp of the true
    power and exactly reproducible; at alpha ∈ {0, 1/2, 1} it IS the
    correctly rounded power.) Non-dyadic requests raise with the nearest
    admissible alpha (0.7 → 45/64 = 0.703125).
    keep = md5-bucket < rate * 2^32 (the split_assign bucket, so the mix
    composes with splits and caps without correlation).

    Scale shape: one tiny per-domain count aggregation (partial-agg,
    domain-cardinality rows) broadcast back onto the corpus with its
    1-row min — the corpus pass itself is map-only: no window, no rank,
    no shuffle of document rows at all (contrast domain_cap_sample).
    """
    j, m = dyadic_exponent(alpha)
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_source"))
    n_min = counts.agg(F.min("n_source").alias("n_min"))
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    y = F.col("n_min").cast("double") / F.col("n_source").cast("double")
    for _ in range(m):
        y = F.sqrt(y)
    if j == 0:
        rate = F.lit(1.0)
    else:
        rate = y
        for _ in range(j - 1):
            rate = rate * y
    return (
        docs.select(F.col(id_col), F.col(domain_col), bucket.alias("bucket"))
        .join(F.broadcast(counts), domain_col)
        .crossJoin(F.broadcast(n_min))
        .select(
            F.col(id_col),
            F.col(domain_col),
            F.col("n_source").cast("long").alias("n_source"),
            rate.alias("rate"),
            (
                F.col("bucket").cast("double")
                < rate * F.lit(4294967296.0)
            ).alias("keep"),
        )
    )


def collocations(
    docs: DataFrame,
    min_count: int = 3,
    top_k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """(bigram, n_ab, n_a, n_b, pmi_bits): corpus-level collocation mining
    — the top_k adjacent-token bigrams by a pointwise-mutual-information
    score, the phrase-discovery pass a tokenizer/vocab builder runs before
    BPE training (Mikolov et al. 2013 word2vec phrases use the same
    count-ratio shape). PMI = log((n_ab/B) / ((n_a/N)(n_b/N))) is scored
    in EXACT integer arithmetic as
        pmi_bits = bits(n_ab) + 2*bits(N) - bits(n_a) - bits(n_b) - bits(B)
    with bits(x) = length(bin(x)): sums of bit-lengths instead of a log of
    a product, so it never overflows at any corpus size (bits(N^2) would)
    and both engines agree bitwise. Ordering: pmi_bits DESC, n_ab DESC,
    bigram ASC — fully deterministic.

    Scale shape: two token-keyed shuffles with map-side partial aggs
    (unigram counts, bigram counts); min_count prunes the Zipf tail
    BEFORE the unigram join; the unigram table broadcasts; N and B are
    1-row broadcast aggs off the (small) count tables; the final top-k is
    a single ORDER BY ... LIMIT over the surviving bigrams.
    """
    base = docs.select(_toks(text_col).alias("__tk"))
    grams = F.when(
        F.size("__tk") >= 2,
        F.expr("transform(sequence(1, size(__tk) - 1),"
               " i -> struct(element_at(__tk, i) as a, element_at(__tk, i + 1) as b))"),
    ).otherwise(F.expr("cast(array() as array<struct<a:string,b:string>>)"))
    toks = base.select(F.explode("__tk").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    n_total = uni.agg(F.sum("n_tok").cast("long").alias("n_u"))
    bi = (
        base.select(F.explode(grams).alias("g"))
        .select(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    b_total = bi.agg(F.sum("n_ab").cast("long").alias("n_bi"))
    bi = bi.where(F.col("n_ab") >= F.lit(int(min_count)))
    j = (
        bi.join(F.broadcast(uni.select(F.col("tok").alias("a"), F.col("n_tok").alias("n_a"))), "a")
        .join(F.broadcast(uni.select(F.col("tok").alias("b"), F.col("n_tok").alias("n_b"))), "b")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(b_total))
    )
    bits = lambda c: F.length(F.bin(c))  # noqa: E731
    pmi_bits = (
        bits(F.col("n_ab")) + F.lit(2) * bits(F.col("n_u"))
        - bits(F.col("n_a")) - bits(F.col("n_b")) - bits(F.col("n_bi"))
    ).cast("long")
    return (
        j.select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            pmi_bits.alias("pmi_bits"),
        )
        .orderBy(F.col("pmi_bits").desc(), F.col("n_ab").desc(), F.col("bigram").asc())
        .limit(int(top_k))
    )


def curate_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_stop_hits: int = 1,
    min_frac_alpha: float = 0.5,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """(doc_id, lang_ok, quality_ok): the two map-only curation gates as
    boolean flags — script-range language ID (textstats.lang_guess) against
    an allow-list, and the Gopher/C4 quality signals
    (textstats.gopher_quality) against CONFIGURABLE thresholds (the paper
    defaults live on `keep_gopher`; pipelines tune per corpus). One scan,
    no shuffle: both gates are pure column expressions joined on the id
    Catalyst collapses back into a single projection."""
    from jassv2_spark.operators.textstats import gopher_quality, lang_guess

    g = gopher_quality(docs, text_col, id_col)
    quality_ok = (
        (F.col("n_words") >= int(min_words))
        & (F.col("n_words") <= int(max_words))
        & (F.col("mean_word_len") >= float(min_mean_word_len))
        & (F.col("mean_word_len") <= float(max_mean_word_len))
        & (F.col("n_stop_hits") >= int(min_stop_hits))
        & (F.col("frac_alpha_words") >= float(min_frac_alpha))
        & (F.col("symbol_word_ratio") <= float(max_symbol_ratio))
    )
    lang = lang_guess(docs, text_col, id_col)
    return (
        lang.join(g, id_col)
        .select(
            F.col(id_col),
            F.col("lang_guess").isin(*langs).alias("lang_ok"),
            quality_ok.alias("quality_ok"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_shingle: int = 3,
    dedup_hashes: int = 16,
    dedup_bands: int = 4,
    **gate_kwargs,
) -> DataFrame:
    """The curated corpus: docs passing the language gate, the quality
    gate, and near-dup dedup — MinHash-LSH candidate pairs over the gate
    survivors, transitive closure, keep the smallest doc id per cluster
    (operators.dedup.dedup_cluster_assign). Funnel order matters and is
    fixed (lang → quality → dedup): dedup runs on the smallest set, and
    its cluster structure is computed among survivors only, exactly like
    a production pipeline (dropping a low-quality duplicate must not
    delete its high-quality twin's whole cluster).

    Returns the input rows (all columns) of the surviving docs. Shuffle
    budget: the gates are map-only; dedup adds the MinHash band
    shuffle + the closure's per-iteration id-keyed joins — all on the
    post-gate survivor set."""
    from jassv2_spark.operators.dedup import dedup_cluster_assign

    flags = curate_flags(docs, text_col, id_col, **gate_kwargs)
    gated = docs.join(
        flags.where(F.col("lang_ok") & F.col("quality_ok")).select(id_col), id_col
    )
    clusters = dedup_cluster_assign(
        gated, text_col, id_col, n=dedup_shingle,
        num_hashes=dedup_hashes, bands=dedup_bands,
    )
    keep = clusters.where(F.col("cluster_id") == F.col(id_col)).select(id_col)
    return docs.join(keep, id_col)


def curate_funnel(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_shingle: int = 3,
    dedup_hashes: int = 16,
    dedup_bands: int = 4,
    **gate_kwargs,
) -> DataFrame:
    """(stage, n_in, n_dropped, n_out): the per-stage curation funnel
    report — the pipeline observability artifact (how many documents each
    gate removed, chained in the fixed lang → quality → near_dup order).
    Stage counts follow funnel semantics: a doc is charged to the FIRST
    gate that rejects it. The whole report is one aggregate row reshaped
    with stack(); at any corpus size the result is 3 rows."""
    from jassv2_spark.operators.dedup import dedup_cluster_assign

    flags = curate_flags(docs, text_col, id_col, **gate_kwargs)
    gated = docs.join(
        flags.where(F.col("lang_ok") & F.col("quality_ok")).select(id_col), id_col
    )
    clusters = dedup_cluster_assign(
        gated, text_col, id_col, n=dedup_shingle,
        num_hashes=dedup_hashes, bands=dedup_bands,
    )
    dup_keep = clusters.select(
        F.col(id_col), (F.col("cluster_id") == F.col(id_col)).alias("dup_keep")
    )
    full = flags.join(dup_keep, id_col, "left")
    one = full.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum((~F.col("lang_ok")).cast("long")).cast("long").alias("d_lang"),
        F.sum((F.col("lang_ok") & ~F.col("quality_ok")).cast("long"))
        .cast("long").alias("d_quality"),
        F.sum(
            (F.col("lang_ok") & F.col("quality_ok")
             & ~F.coalesce(F.col("dup_keep"), F.lit(True))).cast("long")
        ).cast("long").alias("d_dup"),
    )
    return one.selectExpr(
        "stack(3, "
        " 'lang',     n0,                     d_lang,    n0 - d_lang, "
        " 'quality',  n0 - d_lang,            d_quality, n0 - d_lang - d_quality, "
        " 'near_dup', n0 - d_lang - d_quality, d_dup,    n0 - d_lang - d_quality - d_dup"
        ") AS (stage, n_in, n_dropped, n_out)"
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 2,
    buckets: int = 4096,
) -> DataFrame:
    """(doc_id, n_feat, sum_bits, mean_bits): DSIR-style importance
    weights (Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023) — per raw document, the
    hashed-n-gram bag log-likelihood ratio between a TARGET domain
    (the quality corpus you want more of) and the RAW pool, the score
    importance resampling then samples proportional to.

    Features are token n-grams hashed into `buckets` cells with the
    repo's portable 32-bit md5 (selective.py:_h32 recipe); both corpus
    distributions get add-one smoothing over the same cells. The log
    ratio is taken at integer bit-length resolution exactly like
    :func:`unigram_surprisal`: per feature,
    Δbits = bits(ct_b+1) − bits(cr_b+1) + bits(Zr) − bits(Zt) with
    bits(x) = length(bin(x)) — power-of-two resolution in exchange for
    exact int64 sums that match any engine bitwise; mean_bits is the
    single IEEE division at the end. Rank order within ±1 bit of the
    float DSIR score, which importance *sampling* tolerates by design.

    Scale shape: one pass over each corpus to count features (vocab is
    `buckets` rows — tiny by construction, the point of hashing), the
    joint smoothed table broadcast onto the raw side's exploded
    features (map-side probe), ONE doc-keyed shuffle to sum. The
    target corpus is typically 10^-3 of raw; its count pass is noise.
    """
    def _feats(frame: DataFrame) -> DataFrame:
        tk = frame.select(F.col(id_col), _toks(text_col).alias("a"))
        return tk.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"case when size(a) >= {n} then"
                    f" transform(sequence(1, size(a) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(a, i, {n})))"
                    f" else array() end"
                )
            ).alias("f"),
        ).withColumn(
            "b",
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("f").cast("binary")), 1, 8), 16, 10
                ).cast("long"),
                F.lit(int(buckets)),
            ),
        )
    raw_f = _feats(docs)
    cr = raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    ct = _feats(target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    tbl = (
        cr.join(ct, "b", "full")
        .select(
            "b",
            F.coalesce("cr", F.lit(0)).alias("cr"),
            F.coalesce("ct", F.lit(0)).alias("ct"),
        )
    )
    z = tbl.agg(
        (F.sum("cr") + F.lit(int(buckets))).cast("long").alias("zr"),
        (F.sum("ct") + F.lit(int(buckets))).cast("long").alias("zt"),
    )
    delta = (
        F.length(F.bin(F.col("ct") + 1))
        - F.length(F.bin(F.col("cr") + 1))
        + F.length(F.bin(F.col("zr")))
        - F.length(F.bin(F.col("zt")))
    ).cast("long")
    per_doc = (
        raw_f.join(F.broadcast(tbl), "b")
        .crossJoin(F.broadcast(z))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.sum(delta).cast("long").alias("sum_bits"),
        )
    )
    n_feat = F.coalesce(F.col("n_feat"), F.lit(0).cast("long"))
    sum_bits = F.coalesce(F.col("sum_bits"), F.lit(0).cast("long"))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            n_feat.alias("n_feat"),
            sum_bits.alias("sum_bits"),
            F.when(n_feat > 0, sum_bits.cast("double") / n_feat.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("mean_bits"),
        )
    )


def bigram_surprisal(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tok, n_backoff, sum_bits, mean_bits): a context-aware
    perplexity proxy from a bigram LM with stupid backoff (Brants et
    al. EMNLP'07), trained on `lm_docs` (a reference corpus — e.g. the
    quality slice; defaults to `docs` itself) — the CCNet
    quality-bucketing signal one modeling step past
    :func:`unigram_surprisal`. Per token after the first, surprisal is
    −log2 S(w|prev) at exact integer bit-length resolution:
    bits(c(prev)) − bits(c(prev,w)) when the LM saw the bigram, else
    backoff 2 + bits(N) − bits(c(w)+1) (α = 1/4 so −log2 α is exactly
    2 bits; add-one for OOV words); the first token pays unigram
    bits(N) − bits(c(w)+1). n_backoff (how often the model fell to
    unigrams) is itself a fluency signal — shuffled or boilerplate
    text backs off constantly. Note when lm_docs is the scored corpus
    itself every scored bigram is in the table, so n_backoff is 0 by
    construction; backoff bites when scoring against a held-out or
    quality-slice LM. All sums exact int64 (bits(x) = length(bin(x))
    on every engine); mean_bits is the single IEEE division.

    Scale shape: one pass builds the unigram table (vocab-sized,
    broadcasts) and one the bigram table (corpus-sized — this one joins
    by SHUFFLE on the bigram key, the honest cost of a context model),
    then the scoring pass re-joins exploded positions and sums with ONE
    doc-keyed shuffle. Hot bigram keys are Zipf-bounded by their own
    frequency — partial agg collapses them map-side.
    """
    lm = lm_docs if lm_docs is not None else docs

    def _pairs(frame: DataFrame) -> DataFrame:
        tk = frame.select(F.col(id_col), _toks(text_col).alias("a"))
        return tk.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "case when size(a) >= 2 then"
                    " transform(sequence(2, size(a)),"
                    " i -> struct(a[i-2] as prev, a[i-1] as cur))"
                    " else array() end"
                )
            ).alias("p"),
        ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))

    lm_tk = lm.select(F.col(id_col), _toks(text_col).alias("a"))
    uni = (
        lm_tk.select(F.explode("a").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    big = _pairs(lm).groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    n_total = uni.agg(F.sum("cu").cast("long").alias("n"))

    tk = docs.select(F.col(id_col), _toks(text_col).alias("a"))
    firsts = (
        tk.where(F.size("a") >= 1)
        .select(F.col(id_col), F.expr("a[0]").alias("w"))
        .join(F.broadcast(uni), "w", "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col(id_col),
            (
                F.length(F.bin(F.col("n")))
                - F.length(F.bin(F.coalesce(F.col("cu"), F.lit(0)) + 1))
            )
            .cast("long")
            .alias("bits"),
            F.lit(0).cast("long").alias("backoff"),
        )
    )
    scored_pairs = (
        _pairs(docs)
        .join(big, ["prev", "cur"], "left")
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("prev"), F.col("cu").alias("cprev"))
            ),
            "prev",
            "left",
        )
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("cur"), F.col("cu").alias("ccur"))
            ),
            "cur",
            "left",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col(id_col),
            F.when(
                F.col("cb").isNotNull(),
                F.length(F.bin(F.col("cprev"))) - F.length(F.bin(F.col("cb"))),
            )
            .otherwise(
                F.lit(2)
                + F.length(F.bin(F.col("n")))
                - F.length(F.bin(F.coalesce(F.col("ccur"), F.lit(0)) + 1))
            )
            .cast("long")
            .alias("bits"),
            F.when(F.col("cb").isNotNull(), F.lit(0)).otherwise(F.lit(1))
            .cast("long")
            .alias("backoff"),
        )
    )
    per_doc = (
        firsts.unionByName(scored_pairs)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum("backoff").cast("long").alias("n_backoff"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
    )
    n_tok = F.coalesce(F.col("n_tok"), F.lit(0).cast("long"))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            n_tok.alias("n_tok"),
            F.coalesce(F.col("n_backoff"), F.lit(0).cast("long")).alias("n_backoff"),
            F.coalesce(F.col("sum_bits"), F.lit(0).cast("long")).alias("sum_bits"),
            F.when(
                n_tok > 0,
                F.coalesce(F.col("sum_bits"), F.lit(0).cast("long")).cast("double")
                / n_tok.cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_bits"),
        )
    )


def ppmi_term_contexts(
    docs: DataFrame,
    *,
    window: int = 3,
    top_m: int = 5,
    min_pair_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, context, n_pair, ppmi_bits, ctx_rank): the top-m PPMI
    context terms per vocabulary term — the count-based distributional
    representation (Levy & Goldberg NIPS'14 showed skip-gram factorizes
    exactly this matrix), the from-scratch ingredient for related-term
    expansion and embedding pretraining over a web corpus.

    Pairs are generated MAP-SIDE from each document's token array (for
    every position and offset 1..window, both directions — a pure JVM
    transform/flatten, no positional self-join ever touches the
    shuffle); one (term, context) exchange counts them (Zipf-hot pairs
    partial-aggregate upstream). PPMI at the repo's integer bit-length
    resolution, overflow-proof by construction:
    ppmi_bits = max(0, bits(n_pair) + bits(N) − bits(n_w) − bits(n_c))
    (each bits() stays on an int64 count; no products ever form).
    Ranking (ppmi DESC, n_pair DESC, context ASC) is total, so top-m is
    engine-portable. min_pair_count drops hapax pairs before the rank
    window — the standard noise floor.

    Scale shape: pair fan-out is 2·window per token (map-side), ONE
    (w, c)-keyed shuffle, unigram table broadcast onto it, one
    term-partitioned rank window over the surviving pairs."""
    tk = docs.select(F.col(id_col), _toks(text_col).alias("a"))
    pairs = tk.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, size(a)), i ->
                      flatten(transform(sequence(1, {int(window)}), o ->
                        case when i + o <= size(a) then
                          array(struct(a[i-1] as w, a[i+o-1] as c),
                                struct(a[i+o-1] as w, a[i-1] as c))
                        else array() end))))"""
            )
        ).alias("p")
    ).select(F.col("p.w").alias("w"), F.col("p.c").alias("c"))
    pc = pairs.groupBy("w", "c").agg(F.count(F.lit(1)).alias("n_pair"))
    uni = pairs.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    n_total = uni.agg(F.sum("n_w").cast("long").alias("n_all"))
    scored = (
        pc.where(F.col("n_pair") >= F.lit(int(min_pair_count)))
        .join(F.broadcast(uni), "w")
        .join(
            F.broadcast(uni.select(F.col("w").alias("c"), F.col("n_w").alias("n_c"))),
            "c",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "w",
            "c",
            "n_pair",
            F.greatest(
                F.lit(0),
                F.length(F.bin("n_pair"))
                + F.length(F.bin("n_all"))
                - F.length(F.bin("n_w"))
                - F.length(F.bin("n_c")),
            )
            .cast("long")
            .alias("ppmi_bits"),
        )
    )
    rk = Window.partitionBy("w").orderBy(
        F.col("ppmi_bits").desc(), F.col("n_pair").desc(), F.col("c").asc()
    )
    return (
        scored.withColumn("ctx_rank", F.row_number().over(rk).cast("long"))
        .where(F.col("ctx_rank") <= F.lit(int(top_m)))
        .select(
            F.col("w").alias("term"),
            F.col("c").alias("context"),
            F.col("n_pair").cast("long").alias("n_pair"),
            "ppmi_bits",
            "ctx_rank",
        )
    )


def related_terms(
    contexts: DataFrame,
    *,
    top_s: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """(term, related, n_shared, dot, sim_rank): second-order
    distributional similarity — two terms are related when their
    :func:`ppmi_term_contexts` feature rows overlap, scored by the
    exact integer dot product Σ ppmi_bits·ppmi_bits' over shared
    contexts (the count-based cousin of embedding cosine; this is how
    corpus-mined synonym candidates for `fuzzy.search_synonyms` are
    born without any trained model). min_shared ≥ 2 kills one-context
    coincidences; ranking (dot DESC, n_shared DESC, related ASC) is
    total.

    Scale shape: the input is already top-m-per-term (vocab × m rows);
    the self equi-join keys on CONTEXT, so fan-out per context row is
    the number of terms listing that context among their top-m — PPMI
    already demoted stopword contexts, which is what makes this join
    safe where a raw co-occurrence self-join would go quadratic. One
    (term, related)-keyed partial agg + a term-partitioned rank
    window."""
    a = contexts.select(
        F.col("term").alias("w1"), F.col("context").alias("ctx"),
        F.col("ppmi_bits").alias("p1"),
    )
    b = contexts.select(
        F.col("term").alias("w2"), F.col("context").alias("ctx"),
        F.col("ppmi_bits").alias("p2"),
    )
    dots = (
        a.join(b, "ctx")
        .where(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum(F.col("p1") * F.col("p2")).cast("long").alias("dot"),
        )
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )
    rk = Window.partitionBy("w1").orderBy(
        F.col("dot").desc(), F.col("n_shared").desc(), F.col("w2").asc()
    )
    return (
        dots.withColumn("sim_rank", F.row_number().over(rk).cast("long"))
        .where(F.col("sim_rank") <= F.lit(int(top_s)))
        .select(
            F.col("w1").alias("term"), F.col("w2").alias("related"),
            "n_shared", "dot", "sim_rank",
        )
    )
