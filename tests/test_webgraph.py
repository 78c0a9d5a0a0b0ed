"""Web link graph: link round-trip through html, anchor aggregation,
integer PageRank vs a pure-Python fixed-point oracle."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.webgraph import (
    PR_SCALE,
    anchor_field,
    extract_links,
    linked_html,
    pagerank,
    synthesize_links,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"alpha{i % 7} beta{i % 5} gamma{i % 3} delta common text") for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_link_roundtrip_through_html(spark, docs):
    links = synthesize_links(docs)
    want = sorted((r["src"], r["dst"], r["anchor"]) for r in links.collect())
    assert want, "link rule must produce edges"
    pages = linked_html(docs, links)
    got = sorted(
        (r["src"], r["dst"], r["anchor"]) for r in extract_links(pages).collect()
    )
    assert got == want


def test_link_rule_shape(spark, docs):
    links = synthesize_links(docs).collect()
    n = 40
    for r in links:
        assert r["src"] != r["dst"]
        assert r["dst"] in {(r["src"] * 7 + 3) % n, (r["src"] * 13 + 5) % n, (r["src"] + 1) % n}
        assert r["anchor"]  # first tokens of the target text
    # ≤ 3 out-links, deduped
    from collections import Counter

    out = Counter(r["src"] for r in links)
    assert max(out.values()) <= 3


def test_anchor_field_deterministic_order(spark, docs):
    links = synthesize_links(docs)
    a1 = {r["doc_id"]: r["text"] for r in anchor_field(links).collect()}
    a2 = {r["doc_id"]: r["text"] for r in anchor_field(links.repartition(8)).collect()}
    assert a1 == a2
    # anchors are the target's own leading tokens, repeated per inlink
    some = next(iter(a1.items()))
    assert some[1].split()  # non-empty token stream


def _py_pagerank(n, edges, iterations=10, scale=PR_SCALE):
    from collections import defaultdict

    out = defaultdict(int)
    for s, _ in edges:
        out[s] += 1
    r = {v: scale for v in range(n)}
    base = 15 * scale // 100
    for _ in range(iterations):
        mass = defaultdict(int)
        for s, d in edges:
            mass[d] += r[s] // out[s]
        r = {v: base + (85 * mass[v]) // 100 for v in range(n)}
    return r


def test_pagerank_matches_python_oracle(spark, docs):
    links = synthesize_links(docs)
    edges = [(r["src"], r["dst"]) for r in links.select("src", "dst").collect()]
    want = _py_pagerank(40, edges)
    got = {r["doc_id"]: r["pr"] for r in pagerank(docs.select("doc_id"), links).collect()}
    assert got == want


def test_pagerank_parallelism_invariant(spark, docs):
    links = synthesize_links(docs)
    r1 = {
        r["doc_id"]: r["pr"]
        for r in pagerank(docs.select("doc_id").repartition(1), links.repartition(1)).collect()
    }
    r8 = {
        r["doc_id"]: r["pr"]
        for r in pagerank(docs.select("doc_id").repartition(8), links.repartition(8)).collect()
    }
    assert r1 == r8


def test_pagerank_hub_ranks_higher(spark):
    # star graph: everyone links to 0; 0 links to 1
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)] + [(0, 1)], ["src", "dst"]
    )
    pr = {r["doc_id"]: r["pr"] for r in pagerank(nodes, edges).collect()}
    # hub and the hub-fed node both dominate the unlinked leaves; the
    # hub↔fed pair itself oscillates with period 2 (star graphs are not
    # aperiodic), so no ordering is asserted between them.
    assert pr[0] > pr[2] and pr[1] > pr[2]
    assert pr[2] == pr[3]  # symmetric leaves tie exactly (integer math)
    assert pr[2] == 15 * PR_SCALE // 100  # leaves get exactly the base mass


def test_pagerank_checkpoint_option(spark, docs):
    links = synthesize_links(docs)
    plain = {r["doc_id"]: r["pr"] for r in pagerank(docs.select("doc_id"), links).collect()}
    ckpt = {
        r["doc_id"]: r["pr"]
        for r in pagerank(docs.select("doc_id"), links, checkpoint_every=3).collect()
    }
    assert plain == ckpt


def test_recrawl_priority_importance_times_staleness(spark):
    from jassv2_spark.operators.webgraph import recrawl_priority

    ranks = spark.createDataFrame(
        [(1, 1000), (2, 100), (3, 1000)], ["doc_id", "pr"]
    )
    ts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"),   # old + important
         (2, "2024-01-01 00:00:00"),   # old + unimportant
         (3, "2024-01-10 00:00:00")],  # fresh + important
        ["doc_id", "ts"],
    ).select("doc_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {
        r["doc_id"]: (r["age_s"], r["priority"], r["prio_rank"])
        for r in recrawl_priority(
            ranks, ts, now_ts="2024-01-11 00:00:00", age_cap_s=86400 * 5
        ).collect()
    }
    # doc1: age 10d capped at 5d -> 1000*432000; doc2: 100*432000;
    # doc3: age 1d=86400 -> 1000*86400
    assert got[1] == (864000, 1000 * 432000, 1)
    assert got[3] == (86400, 1000 * 86400, 2)
    assert got[2] == (864000, 100 * 432000, 3)
