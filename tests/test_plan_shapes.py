"""Physical-plan regression tests for the newest operators: the scale
properties claimed in docstrings must be visible in the executed plan
(broadcasts where promised, no accidental cartesian joins)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_combsum_no_cartesian(spark):
    from jassv2_spark.operators.fusion import combsum_fuse

    a = spark.createDataFrame(
        [("q1", 1, 10, 1), ("q1", 2, 5, 2)], ["query_id", "doc_id", "score", "rank"]
    )
    b = spark.createDataFrame(
        [("q1", 2, 0.5, 1), ("q1", 3, 0.1, 2)], ["query_id", "doc_id", "score", "rank"]
    )
    plan = _plan(combsum_fuse([a, b], k=5, depth=5))
    assert "CartesianProduct" not in plan


def test_prefix_expansion_broadcasts_probe_side(spark):
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.fuzzy import prefix_term_expansions

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    probes = spark.createDataFrame([("qu",), ("sc",)], ["probe"])
    plan = _plan(prefix_term_expansions(idx.term_stats, probes, max_expand=3))
    # prefix match is a non-equi condition: it must run as a BROADCAST
    # nested loop (tiny probe side), never a cartesian product
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_bucket_table_broadcasts(spark):
    from jassv2_spark.operators.curation import dsir_weights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dsir_weights(docs, docs.where(F.col("doc_id") % 10 == 0), buckets=64))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_coec_ctr_table_broadcasts(spark):
    from jassv2_spark.operators.events import item_coec

    imps = spark.createDataFrame(
        [(1, 1, True), (2, 2, False), (1, 2, True)], ["item_id", "rank", "clicked"]
    )
    plan = _plan(item_coec(imps))
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


def test_lpa_and_kcore_no_cartesian(spark):
    from jassv2_spark.operators.webgraph import k_core, label_propagation

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["src", "dst"])
    assert "CartesianProduct" not in _plan(
        label_propagation(nodes, edges, iterations=2)
    )
    assert "CartesianProduct" not in _plan(k_core(nodes, edges, k=1, rounds=2))


def test_wildcard_expansion_broadcasts_probe_side(spark):
    from jassv2_spark.operators.wildcard import wildcard_term_expansions

    stats = spark.createDataFrame(
        [("spark", 4), ("scan", 2), ("table", 3)], ["term", "df"]
    )
    pats = spark.createDataFrame([("s*",), ("*ab*",)], ["pattern"])
    plan = _plan(wildcard_term_expansions(stats, pats, max_expand=3))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_robots_rules_broadcast_no_cartesian(spark):
    from jassv2_spark.operators.crawl import robots_gate

    pages = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",)], ["url"]
    )
    rules = spark.createDataFrame(
        [("a.example", False, "/x")], ["host", "allow", "path_prefix"]
    )
    plan = _plan(robots_gate(pages, rules))
    assert "CartesianProduct" not in plan
    # the host equi-key must reach the join (broadcast hash, not NL)
    assert "BroadcastHashJoin" in plan


def test_kmv_no_corpuswide_single_partition_sort(spark):
    """The first window must be keyed by (group, lane), not group alone:
    both window sorts partition by at least one key column."""
    from jassv2_spark.operators.sketch import kmv_hashes

    df = spark.createDataFrame([("g", f"v{i}") for i in range(50)], ["g", "v"])
    plan = _plan(kmv_hashes(df, ["g"], "v", k=8))
    # a missing partition key would appear as a global Sort before Window
    assert "Window" in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange SinglePartition") == 0
