"""Crawl-side operators: robots.txt gating and politeness scheduling.

The reference engine starts where a crawl ends (documents arrive as an
instream, `source/instream_document_warc.cpp`); a Common-Crawl-scale
pipeline also owns the step BEFORE fetch. Two operators cover it,
public-knowledge only (RFC 9309; the crawler-commons / Heritrix
politeness model):

- robots_gate: apply a parsed robots-rule table to a URL set with the
  RFC 9309 §2.2.2 precedence — among the rules of the URL's host whose
  path prefix matches, the LONGEST octet-length prefix wins, and on an
  allow/disallow tie at the same length allow wins; a URL with no
  matching rule (or an unknown host) is allowed. Rules here are the
  already-parsed (host, allow, path_prefix) rows a fetcher caches per
  host — prefix rules only (the '*'/'$' wildcard extension is a
  straightforward LIKE-rewrite on top of the same precedence, left
  out to keep the gate engine-portable).
- crawl_schedule: turn a prioritized frontier into per-host politeness
  lanes — fetch_seq ranks a host's URLs (priority DESC, url ASC), the
  fetch fires at (fetch_seq - 1) · crawl_delay_ms on that host's lane,
  and the host pins to one of n_workers fetch workers by portable hash
  (host affinity is what makes per-host delays enforceable on a fleet:
  one worker owns all of a host's fetches).

Scale shape: the rules table is hosts-sized — orders of magnitude
smaller than the URL set — and joins on host (broadcast when it fits,
an ordinary equi-join shuffle otherwise; never a cross join: the
prefix test runs inside the matched-host pairs). The winner pick is a
(url)-keyed window over match-count-sized frames (a host's rule list
is tens of rows, so frames are tiny). The schedule is one host-keyed
window — the honest cost of per-host sequencing — plus map-only
arithmetic; hosts are many and Zipf-mild, and a pathological mega-host
bounds its own lane, not the shuffle (one partition holds its rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]*)"


def _host(u):
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def _path(u):
    # path with query/fragment stripped; empty path normalizes to '/'
    p = F.regexp_replace(
        F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""), r"[?#].*$", ""
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_gate(
    pages: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """(url, host, allowed, matched_prefix): RFC 9309 gate of each URL
    against a parsed rule table (host, allow: bool, path_prefix).

    Precedence per URL: longest matching path_prefix wins; same-length
    allow beats disallow; no match → allowed with a NULL
    matched_prefix. Empty-prefix rules ('' — the parsed form of
    `Disallow:` with no value) match nothing, per the RFC."""
    u = F.col(url_col)
    base = pages.select(u.alias("url"), _host(u).alias("host"), _path(u).alias("__p"))
    r = rules.select(
        F.lower(F.col("host")).alias("host"),
        F.col("allow").cast("boolean").alias("allow"),
        F.col("path_prefix"),
    ).where(F.length("path_prefix") > 0)
    if broadcast_rules:
        r = F.broadcast(r)
    matched = base.join(r, "host").where(F.col("__p").startswith(F.col("path_prefix")))
    w = Window.partitionBy("url").orderBy(
        F.length("path_prefix").desc(), F.col("allow").desc()
    )
    winner = (
        matched.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("url", F.col("allow").alias("__a"), F.col("path_prefix").alias("matched_prefix"))
    )
    return (
        base.join(winner, "url", "left")
        .select(
            "url",
            "host",
            F.coalesce(F.col("__a"), F.lit(True)).alias("allowed"),
            "matched_prefix",
        )
    )


def crawl_schedule(
    frontier: DataFrame,
    *,
    url_col: str = "url",
    priority_col: str = "priority",
    delay_col: str | None = None,
    default_delay_ms: int = 1000,
    n_workers: int = 64,
) -> DataFrame:
    """(url, host, worker, fetch_seq, fetch_time_ms): per-host politeness
    lanes over a prioritized frontier. fetch_seq orders a host's URLs by
    (priority DESC, url ASC — deterministic); the fetch fires at
    (fetch_seq − 1) · host_delay on the host's lane, where host_delay is
    the MAX of delay_col over the host's rows (politeness is a per-host
    property; normalizing makes lane times cumulative and collision-free
    even when frontier rows disagree about a host's delay — ADVICE r2);
    the host pins to worker = 32-bit-md5(host) mod n_workers (the repo's
    portable hash recipe), so one worker owns each host's lane end to end."""
    u = F.col(url_col)
    host = _host(u)
    delay = (
        F.col(delay_col).cast("long")
        if delay_col
        else F.lit(int(default_delay_ms)).cast("long")
    )
    base = frontier.select(
        u.alias("url"),
        host.alias("host"),
        F.col(priority_col).alias("__pri"),
        delay.alias("__delay"),
    )
    # conservative per-host politeness: the slowest delay any row claims
    base = base.withColumn(
        "__delay", F.max("__delay").over(Window.partitionBy("host"))
    )
    w = Window.partitionBy("host").orderBy(F.col("__pri").desc(), F.col("url").asc())
    h32 = F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
    return base.select(
        "url",
        "host",
        (h32 % F.lit(int(n_workers))).cast("long").alias("worker"),
        F.row_number().over(w).cast("long").alias("fetch_seq"),
        ((F.row_number().over(w) - 1) * F.col("__delay")).cast("long").alias("fetch_time_ms"),
    )


def crawl_budget(
    hosts: DataFrame,
    budget: int,
    *,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """(host, weight, base_quota, extra, quota): apportion a total fetch
    budget across hosts proportionally to a value weight (host PageRank,
    revenue, freshness demand) by the LARGEST-REMAINDER method
    (Hamilton apportionment — the exact-integer way to make quotas sum
    to the budget): base = (B·w) div W, and the B − Σbase leftover
    seats go to the largest remainders ((B·w) mod W DESC, host ASC
    tie-break). Σ quota == budget exactly, every quota within 1 of its
    real share — the property float rounding loses.

    Scale shape: one global W agg (scalar), map-side quota arithmetic,
    one window rank over the host table for the leftover seats (hosts
    ≪ pages; at 10^8 hosts the rank is a single modest sort) — no
    corpus-scale exchange anywhere. Overflow: B·w must fit int64."""
    b = int(budget)
    h = hosts.select(F.col(host_col).alias("host"), F.col(weight_col).cast("long").alias("weight"))
    tot = h.agg(F.sum("weight").alias("W"))
    hx = h.crossJoin(F.broadcast(tot))
    hx = hx.select(
        "host",
        "weight",
        F.expr(f"({b} * weight) div W").cast("long").alias("base_quota"),
        F.expr(f"({b} * weight) % W").cast("long").alias("__rem"),
    )
    w = Window.orderBy(F.col("__rem").desc(), F.col("host").asc())
    sb = hx.agg(F.sum("base_quota").alias("SB"))
    ranked = (
        hx.withColumn("__rank", F.row_number().over(w))
        .crossJoin(F.broadcast(sb))
        .withColumn("__left", F.lit(b) - F.col("SB"))
    )
    return ranked.select(
        "host",
        "weight",
        "base_quota",
        (F.col("__rank") <= F.col("__left")).cast("long").alias("extra"),
        (F.col("base_quota") + (F.col("__rank") <= F.col("__left")).cast("long"))
        .cast("long")
        .alias("quota"),
    )


def resolve_redirects(
    redirects: DataFrame,
    *,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_jumps: int = 6,
) -> DataFrame:
    """(src_url, final_url, n_hops, resolved): every redirect source
    resolved to its terminal target — the canonicalization pass a
    crawler runs over its fetched 3xx log before urls enter the
    frontier/index (chains are common: http→https→www→final; cycles
    are the classic trap).

    The redirect map is FUNCTIONAL (one target per source; feed the
    latest-fetch winner). Resolution is pointer DOUBLING: each round
    composes the partial map with itself, so round k covers chains of
    2^k hops — max_jumps=6 resolves any chain ≤ 64 edges in 6
    self-joins, not 64 (the webgraph components/labels trick applied
    to the functional graph). n_hops is the exact edge count of the
    resolved chain (hop counts add under composition). Sources whose
    walk never leaves the redirect map within the horizon — cycles,
    or absurd chains — emit resolved=false with NULL final/hops.

    Scale shape: per round ONE equi-join of the map against itself
    keyed on the current target (uniform url keys) + the final
    terminal-check left-join; log-rounds total. At 10^9 redirect
    edges this is 6 keyed shuffles, each map-sized."""
    m = redirects.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(int(max_jumps)):
        nxt = m.select(
            F.col("src").alias("__s2"),
            F.col("cur").alias("__c2"),
            F.col("hops").alias("__h2"),
        )
        m = (
            m.join(nxt, m["cur"] == nxt["__s2"], "left")
            .select(
                "src",
                F.coalesce(F.col("__c2"), F.col("cur")).alias("cur"),
                (F.col("hops") + F.coalesce(F.col("__h2"), F.lit(0))).alias("hops"),
            )
        )
    srcs = redirects.select(F.col(src_col).alias("__asrc")).distinct()
    out = m.join(srcs, m["cur"] == srcs["__asrc"], "left")
    unresolved = F.col("__asrc").isNotNull()  # target is still a source ⇒ cycle/over-horizon
    return out.select(
        F.col("src").alias("src_url"),
        F.when(~unresolved, F.col("cur")).alias("final_url"),
        F.when(~unresolved, F.col("hops")).cast("long").alias("n_hops"),
        (~unresolved).alias("resolved"),
    )


def crawl_plan(
    pages: DataFrame,
    rules: DataFrame,
    budget: int,
    *,
    url_col: str = "url",
    priority_col: str | None = None,
    default_delay_ms: int = 1000,
    n_workers: int = 64,
) -> DataFrame:
    """(url, host, allowed, quota, fetch_seq, scheduled, fetch_time_ms):
    the whole pre-fetch planning stack in one pass — robots gate →
    host-budget apportionment → politeness schedule — i.e. what a crawl
    cycle actually computes before the first request:

      1. :func:`robots_gate` marks each URL allowed/blocked;
      2. each host's WEIGHT = its allowed-URL count, and
         :func:`crawl_budget` splits the total fetch budget across
         hosts (largest remainder — Σ quota == budget exactly);
      3. :func:`crawl_schedule` lanes the allowed URLs per host
         (priority DESC, url ASC; priority defaults to the portable
         md5-32 of the url — a deterministic shuffle), and a URL is
         SCHEDULED iff its lane position fits the host's quota, firing
         at (fetch_seq − 1)·delay.

    Blocked URLs carry quota/seq/time NULLs. The composition is the
    point: every stage is the already-verified operator, so the plan
    inherits their scale shapes (hosts-sized broadcasts, one host-keyed
    window, no corpus-scale exchange beyond the URL scan)."""
    gated = robots_gate(pages, rules, url_col=url_col)
    allowed = gated.where(F.col("allowed"))
    weights = allowed.groupBy("host").agg(F.count(F.lit(1)).alias("weight"))
    quotas = crawl_budget(weights, budget).select("host", "quota")
    fr = allowed.select(
        "url",
        (
            F.col(priority_col)
            if priority_col
            else F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long")
        ).alias("__pri"),
    )
    sched = crawl_schedule(
        fr, priority_col="__pri", default_delay_ms=default_delay_ms,
        n_workers=n_workers,
    ).select("url", "fetch_seq", "fetch_time_ms")
    out = (
        gated.join(F.broadcast(quotas), "host", "left")
        .join(sched, "url", "left")
    )
    scheduled = F.col("allowed") & (F.col("fetch_seq") <= F.col("quota"))
    return out.select(
        "url",
        "host",
        "allowed",
        F.when(F.col("allowed"), F.col("quota")).cast("long").alias("quota"),
        F.when(F.col("allowed"), F.col("fetch_seq")).cast("long").alias("fetch_seq"),
        F.coalesce(scheduled, F.lit(False)).alias("scheduled"),
        F.when(scheduled, F.col("fetch_time_ms")).cast("long").alias("fetch_time_ms"),
    )
