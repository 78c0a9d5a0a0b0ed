"""Web-pipeline operators: URL canonicalization and paragraph-level dedup.

Standard Common-Crawl-pipeline stages over the web-pages input contract:

- canonicalize_url — a DEFINED, engine-portable canonical form: strip the
  fragment, drop tracking parameters (utm_*, gclid, fbclid), lowercase
  scheme+host only (path/query case preserved), strip default :80/:443
  ports, strip a single trailing slash. Pure JVM regex expressions with
  the same regexes runnable in RE2 (no backreferences, no lookaround), so
  a DuckDB oracle can mirror the plan bit-for-bit. At 10^12 rows this is
  a map-only pass; the usual consumer is an exact-dup groupBy on the
  canonical form (same-page-different-tracking collapses).
- paragraph_hashes / paragraph_duplicates — split each document on a
  separator pattern, hash each piece (md5), and find pieces shared across
  documents: the paragraph-granularity exact dedup used to strip
  boilerplate (headers, footers, nav) that repeats across a crawl.
  Shuffle is keyed by the content hash — uniform, skew-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = "utm_[a-zA-Z]+|gclid|fbclid"
_SCHEME_HOST = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"


def canonicalize_url(col: Column) -> Column:
    """Canonical URL column expression (see module docstring for the form)."""
    # 1. fragment
    u = F.regexp_replace(col, "#.*", "")
    # 2. tracking params followed by another param (keep the separator for it)
    u = F.regexp_replace(u, f"({TRACKING_PARAMS})=[^&]*&", "")
    # 3. trailing tracking param, consuming its ? or & separator
    u = F.regexp_replace(u, f"[?&]({TRACKING_PARAMS})=[^&]*$", "")
    # 4. lowercase scheme+host only; path/query stay as-is
    head = F.regexp_extract(u, _SCHEME_HOST, 0)
    head = F.lower(F.regexp_replace(head, ":80$|:443$", ""))
    tail = F.substring(u, F.length(F.regexp_extract(u, _SCHEME_HOST, 0)) + 1, 1 << 20)
    u = F.concat(head, tail)
    # 5. single trailing slash
    return F.regexp_replace(u, "/$", "")


def canonical_urls(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canon_url, host): canonical form + lowercased host."""
    canon = canonicalize_url(F.col(url_col))
    return pages.select(
        F.col(url_col).alias("url"),
        canon.alias("canon_url"),
        F.regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/:]+)", 1).alias("host"),
    )


def paragraph_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\\. ",
) -> DataFrame:
    """(doc_id, para_idx, para_hash): md5 of each non-empty piece of the
    document split on ``sep`` (a regex; default sentence-ish '. ')."""
    pieces = F.split(F.col(text_col), sep)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(pieces).alias("para_idx", "para"))
        .where(F.length(F.trim("para")) > 0)
        .select(
            "doc_id",
            F.col("para_idx").cast("long").alias("para_idx"),
            F.md5(F.col("para").cast("binary")).alias("para_hash"),
        )
    )


def paragraph_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\\. ",
    min_docs: int = 2,
) -> DataFrame:
    """(para_hash, n_docs, n_occurrences, keep_doc): paragraphs appearing in
    ≥ min_docs distinct documents — crawl boilerplate candidates; keep_doc
    is the smallest holding doc (deterministic survivor)."""
    ph = paragraph_hashes(docs, text_col, id_col, sep)
    return (
        ph.groupBy("para_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("keep_doc"),
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
    )


def collapse_hits(
    hits: DataFrame,
    hosts: DataFrame,
    *,
    per_host: int = 2,
    k: int = 10,
) -> DataFrame:
    """(query_id, doc_id, rsv, host, rank): site/host collapse — the web
    SERP rule that at most `per_host` results from one host may occupy
    the top k, remaining slots back-filled by the next-best hits from
    other hosts. `hits` is any (query_id, doc_id, rsv) frame (the
    engine's serve output); `hosts` maps doc_id → host (in production
    the canonicalized URL's authority, cf. :func:`canonicalize_url`).

    Semantics (deterministic): order within a query by
    (rsv DESC, doc_id DESC) — the engine's own tie-break — keep the
    first `per_host` per (query, host), then re-rank the survivors by
    the same order and cut at k. Two window passes + one equi-join;
    ranks are dense after collapse (1..k), so downstream metrics treat
    the collapsed run like any other.

    Scale shape: the doc→host join is keyed on doc_id over hit-sized
    (not corpus-sized) frames; both windows partition by query_id (the
    second by (query_id, host) first), so the shuffle is hits-sized and
    skew-bounded by k·|queries| after the first cut."""
    from pyspark.sql import Window

    order = [F.col("rsv").desc(), F.col("doc_id").desc()]
    w_host = Window.partitionBy("query_id", "host").orderBy(*order)
    w_query = Window.partitionBy("query_id").orderBy(*order)
    return (
        hits.select("query_id", "doc_id", "rsv")
        .join(hosts.select("doc_id", "host"), "doc_id")
        .withColumn("hrn", F.row_number().over(w_host))
        .where(F.col("hrn") <= per_host)
        .withColumn("rank", F.row_number().over(w_query).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rsv", "host", "rank")
    )


def url_features(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, path_depth, n_params, url_len, digit_ppm, is_https):
    the URL-shape features every web quality classifier starts from
    (deep paths and parameter-heavy or digit-heavy URLs correlate with
    boilerplate/spam/session pages; C4 and Gopher both gate on URL
    shape before reading a byte of body text).

    All pure JVM regex/length expressions (RE2-safe — no backreferences
    or lookaround — so an oracle can mirror them exactly):
    - host: authority without userinfo/port,
    - path_depth: '/'-separated non-empty segments after the authority,
      query/fragment stripped,
    - n_params: '&'-split count of a non-empty query string, else 0,
    - digit_ppm: (10\u2076 \u00b7 digit count) DIV url length, exact integer,
    - is_https: scheme check.
    Map-only \u2014 a 10^12-row pass with no shuffle at all."""
    u = F.col(url_col)
    path = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
        r"[?#].*$",
        "",
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return (
        pages.select(
            u.alias("url"),
            F.regexp_extract(
                u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)", 1
            ).alias("host"),
            F.size(F.filter(F.split(path, "/"), lambda seg: seg != ""))
            .cast("long")
            .alias("path_depth"),
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("long")
            .alias("n_params"),
            F.length(u).cast("long").alias("url_len"),
            F.length(F.regexp_replace(u, r"[^0-9]", "")).cast("long").alias("__dg"),
            u.startswith("https://").alias("is_https"),
        )
        .select(
            "url",
            "host",
            "path_depth",
            "n_params",
            "url_len",
            F.expr("(1000000 * __dg) div url_len").cast("long").alias("digit_ppm"),
            "is_https",
        )
    )


def url_block_flags(
    pages: DataFrame,
    blocked_hosts: list[str],
    blocked_path_words: list[str],
    url_col: str = "url",
) -> DataFrame:
    """(url, host, host_blocked, path_blocked, keep): URL blocklist
    gating — the pre-fetch curation filter every Common-Crawl pipeline
    runs (C4 dropped pages via a badwords list, Raffel et al. 2020
    §2.2; RefinedWeb gates on UT1 blocklist domains, Penedo et al. 2023
    §3.1) applied to the URL alone, before a byte of body is read.

    - host_blocked: the URL's host equals a blocked host OR is a
      subdomain of one (suffix rule: 'ads.example.com' matches blocked
      'example.com'; 'notexample.com' does not — the dot boundary is
      required).
    - path_blocked: any blocked word appears as a substring of the
      LOWERCASED path+query (the C4-style keyword rule).
    - keep = neither.

    Scale shape: both lists ride into the plan as literal arrays
    (blocklists are 10^4-10^6 entries — for the large end, swap the
    `exists()` scan for a broadcast join on host; the path-word list
    stays literal since it is always small). Map-only, no shuffle.
    """
    u = F.col(url_col)
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)", 1)
    )
    hosts_arr = F.array(*[F.lit(h.lower()) for h in blocked_hosts]) if blocked_hosts else F.expr("array()").cast("array<string>")
    words_arr = F.array(*[F.lit(w.lower()) for w in blocked_path_words]) if blocked_path_words else F.expr("array()").cast("array<string>")
    path_q = F.lower(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    )
    host_blocked = F.exists(
        hosts_arr,
        lambda b: (F.col("__h") == b) | F.col("__h").endswith(F.concat(F.lit("."), b)),
    )
    path_blocked = F.exists(words_arr, lambda w: F.col("__p").contains(w))
    return (
        pages.select(u.alias("url"), host.alias("__h"), path_q.alias("__p"))
        .select(
            "url",
            F.col("__h").alias("host"),
            host_blocked.alias("host_blocked"),
            path_blocked.alias("path_blocked"),
        )
        .withColumn("keep", ~(F.col("host_blocked") | F.col("path_blocked")))
    )


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\\. ",
    min_docs: int = 3,
) -> DataFrame:
    """(doc_id, clean_text, n_paras, n_dropped): the ACTION op for
    :func:`paragraph_duplicates` — C4's line-deduplication rule (Raffel
    et al. 2020 §2.2 removed any 3-sentence span occurring more than
    once; the standard production form drops lines/paragraphs whose
    corpus document-frequency ≥ `min_docs`, i.e. navigation, footers,
    cookie banners). Surviving paragraphs are re-joined IN ORIGINAL
    ORDER with '. ' — the output is separator-normalized (split drops
    the original separators), documented rather than hidden. Documents
    whose every paragraph is boilerplate come back with clean_text = ''.

    Scale shape: paragraph df is a (hash)-keyed partial agg over the
    exploded pieces; the boilerplate hash set (small: only df ≥
    min_docs survive) BROADCASTS back onto the exploded side as an
    anti-join, and one (doc)-keyed sorted-struct rebuild ends it —
    two corpus passes, no skew (hashes uniform)."""
    pieces = F.split(F.col(text_col), sep)
    paras = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(pieces).alias("para_idx", "para"),
        )
        .where(F.length(F.trim("para")) > 0)
        .withColumn("para_hash", F.md5(F.col("para").cast("binary")))
    )
    boiler = (
        paras.groupBy("para_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
        .select("para_hash")
    )
    marked = paras.join(
        F.broadcast(boiler.withColumn("__boiler", F.lit(1))), "para_hash", "left"
    )
    rebuilt = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN __boiler IS NULL"
                " THEN struct(para_idx, para) END)), x -> x.para)"
            ),
            ". ",
        ).alias("clean_text"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_paras", F.lit(0).cast("long")).alias("n_paras"),
            F.coalesce("n_dropped", F.lit(0).cast("long")).alias("n_dropped"),
        )
    )
