"""Robots gating (RFC 9309 precedence) and politeness crawl scheduling."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.crawl import crawl_schedule, robots_gate

RULES = [
    # host, allow, path_prefix
    ("a.example", False, "/priv"),
    ("a.example", True, "/priv/ok"),
    ("a.example", True, "/"),
    ("b.example", False, "/"),
    ("b.example", True, "/pub"),
    ("c.example", False, "/x"),
    ("c.example", True, "/x"),      # same length tie → allow wins
    ("c.example", False, ""),       # empty prefix matches nothing
]

URLS = [
    "https://a.example/priv/secret",      # /priv (len 5) beats / → blocked
    "https://a.example/priv/ok/page",     # /priv/ok (len 8) wins → allowed
    "https://a.example/open",             # only / matches → allowed
    "https://b.example/anything",         # / disallow → blocked
    "https://b.example/pub/doc",          # /pub beats / → allowed
    "https://c.example/xyz",              # tie at /x → allow wins
    "https://d.example/no/rules",         # no rules → allowed
    "https://b.example",                  # empty path → '/' → blocked
]


@pytest.fixture(scope="module")
def gated(spark):
    pages = spark.createDataFrame([(u,) for u in URLS], ["url"])
    rules = spark.createDataFrame(RULES, ["host", "allow", "path_prefix"])
    return {r["url"]: r for r in robots_gate(pages, rules).collect()}


def test_longest_prefix_wins(gated):
    assert gated["https://a.example/priv/secret"]["allowed"] is False
    assert gated["https://a.example/priv/ok/page"]["allowed"] is True
    assert gated["https://b.example/pub/doc"]["allowed"] is True


def test_tie_allow_wins(gated):
    assert gated["https://c.example/xyz"]["allowed"] is True


def test_default_allow_and_root_block(gated):
    assert gated["https://d.example/no/rules"]["allowed"] is True
    assert gated["https://d.example/no/rules"]["matched_prefix"] is None
    assert gated["https://b.example"]["allowed"] is False  # '' path → '/'
    assert gated["https://a.example/open"]["matched_prefix"] == "/"


def test_schedule_politeness_lanes(spark):
    rows = [
        ("https://h1.example/a", 5),
        ("https://h1.example/b", 9),
        ("https://h1.example/c", 9),
        ("https://h2.example/z", 1),
    ]
    frontier = spark.createDataFrame(rows, ["url", "priority"])
    out = {r["url"]: r for r in crawl_schedule(
        frontier, default_delay_ms=500, n_workers=8
    ).collect()}
    # priority DESC, url ASC within host
    assert out["https://h1.example/b"]["fetch_seq"] == 1
    assert out["https://h1.example/c"]["fetch_seq"] == 2
    assert out["https://h1.example/a"]["fetch_seq"] == 3
    assert out["https://h1.example/a"]["fetch_time_ms"] == 1000
    assert out["https://h2.example/z"]["fetch_seq"] == 1
    assert out["https://h2.example/z"]["fetch_time_ms"] == 0
    # host affinity: every URL of a host lands on one worker
    w1 = {out[u]["worker"] for u in out if "h1" in u}
    assert len(w1) == 1 and 0 <= w1.pop() < 8


def test_schedule_per_host_delay_column(spark):
    frontier = spark.createDataFrame(
        [("https://h1.example/a", 2, 100), ("https://h1.example/b", 1, 100)],
        ["url", "priority", "delay_ms"],
    )
    out = {r["url"]: r["fetch_time_ms"] for r in crawl_schedule(
        frontier, delay_col="delay_ms"
    ).collect()}
    assert out == {"https://h1.example/a": 0, "https://h1.example/b": 100}


def test_crawl_budget_sums_exactly_and_bounds_error(spark):
    from jassv2_spark.operators.crawl import crawl_budget

    hosts = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 2), ("d", 1)], ["host", "weight"]
    )
    out = {r["host"]: r for r in crawl_budget(hosts, 100).collect()}
    total = sum(r["quota"] for r in out.values())
    assert total == 100
    # every quota within 1 of the real share B*w/W (W=11)
    for h, w in [("a", 5), ("b", 3), ("c", 2), ("d", 1)]:
        real = 100 * w / 11
        assert abs(out[h]["quota"] - real) < 1.0


def test_crawl_budget_remainder_tiebreak(spark):
    from jassv2_spark.operators.crawl import crawl_budget

    # equal weights, budget not divisible: leftover goes to host ASC
    hosts = spark.createDataFrame(
        [("x", 1), ("y", 1), ("z", 1)], ["host", "weight"]
    )
    out = {r["host"]: r["quota"] for r in crawl_budget(hosts, 7).collect()}
    assert out == {"x": 3, "y": 2, "z": 2}
    assert sum(out.values()) == 7


def test_redirect_resolution_chains_and_cycles(spark):
    from jassv2_spark.operators.crawl import resolve_redirects

    r = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "T"),   # 3-hop chain
            ("d", "T"),                            # direct
            ("e", "f"), ("f", "e"),                # 2-cycle
            ("g", "g"),                            # self-loop
        ],
        ["src_url", "dst_url"],
    )
    out = {x["src_url"]: x for x in resolve_redirects(r).collect()}
    assert out["a"]["final_url"] == "T" and out["a"]["n_hops"] == 3
    assert out["b"]["final_url"] == "T" and out["b"]["n_hops"] == 2
    assert out["d"]["final_url"] == "T" and out["d"]["n_hops"] == 1
    for cyc in ("e", "f", "g"):
        assert out[cyc]["resolved"] is False
        assert out[cyc]["final_url"] is None and out[cyc]["n_hops"] is None


def test_redirect_resolution_long_chain_within_horizon(spark):
    from jassv2_spark.operators.crawl import resolve_redirects

    # a 40-edge chain resolves with max_jumps=6 (2^6 = 64 ≥ 40)
    rows = [(f"u{i}", f"u{i+1}") for i in range(40)]
    r = spark.createDataFrame(rows, ["src_url", "dst_url"])
    out = {x["src_url"]: x for x in resolve_redirects(r, max_jumps=6).collect()}
    assert out["u0"]["final_url"] == "u40" and out["u0"]["n_hops"] == 40
    assert out["u39"]["n_hops"] == 1


def test_crawl_plan_composes_gate_budget_schedule(spark):
    from jassv2_spark.operators.crawl import crawl_plan

    pages = spark.createDataFrame(
        [(f"https://h1.example/p{i}",) for i in range(6)]
        + [(f"https://h2.example/p{i}",) for i in range(3)]
        + [("https://h1.example/priv/x",)],
        ["url"],
    )
    rules = spark.createDataFrame(
        [("h1.example", False, "/priv")], ["host", "allow", "path_prefix"]
    )
    out = {r["url"]: r for r in crawl_plan(
        pages, rules, budget=5, default_delay_ms=100
    ).collect()}
    blocked = out["https://h1.example/priv/x"]
    assert blocked["allowed"] is False and blocked["scheduled"] is False
    assert blocked["quota"] is None and blocked["fetch_time_ms"] is None
    # quotas: weights 6 (h1) and 3 (h2) over budget 5 → Hamilton gives
    # h1: floor(30/9)=3 rem 3, h2: floor(15/9)=1 rem 6 → leftover 1 → h2
    h1 = [r for u, r in out.items() if r["host"] == "h1.example" and r["allowed"]]
    h2 = [r for u, r in out.items() if r["host"] == "h2.example"]
    assert all(r["quota"] == 3 for r in h1)
    assert all(r["quota"] == 2 for r in h2)
    assert sum(1 for r in out.values() if r["scheduled"]) == 5
    # scheduled fetches fire at (seq-1)*delay inside their host lane
    for r in out.values():
        if r["scheduled"]:
            assert r["fetch_time_ms"] == (r["fetch_seq"] - 1) * 100
        elif r["allowed"]:
            assert r["fetch_seq"] > r["quota"]
