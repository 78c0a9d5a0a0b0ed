"""Snippet window selection — hand-checkable anchor/tie-break semantics."""

from jassv2_spark.operators.snippets import snippets


def _dfs(spark):
    docs = spark.createDataFrame(
        [
            # doc 1: 'alpha' at 0 and 'beta' at 12 are too far apart for a
            # 5-token window; 'alpha beta' adjacent at 6-7 wins (2 terms)
            (1, "alpha x x x x x alpha beta y y y y beta z"),
            # doc 2: only 'beta' matches; earliest match anchors the window
            (2, "n n beta n n beta n"),
        ],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame([("q1", "alpha"), ("q1", "beta")], ["query_id", "term"])
    hits = spark.createDataFrame([("q1", 1), ("q1", 2)], ["query_id", "doc_id"])
    return docs, q, hits


def test_snippet_picks_densest_window(spark):
    docs, q, hits = _dfs(spark)
    out = {r["doc_id"]: r for r in snippets(docs, q, hits, window=5).collect()}
    assert out[1]["win_start"] == 6 and out[1]["n_terms"] == 2
    assert out[1]["snippet"] == "alpha beta y y y"
    # doc 2: both anchors cover 1 distinct term; anchor 2 covers 2 total
    # matches (positions 2 and 5 within [2,6]) -> wins over anchor 5
    assert out[2]["win_start"] == 2 and out[2]["n_terms"] == 1
    assert out[2]["snippet"] == "beta n n beta n"


def test_snippet_window_clamps_at_end(spark):
    docs = spark.createDataFrame([(1, "x y term")], ["doc_id", "text"])
    q = spark.createDataFrame([("q1", "term")], ["query_id", "term"])
    hits = spark.createDataFrame([("q1", 1)], ["query_id", "doc_id"])
    out = snippets(docs, q, hits, window=5).collect()
    assert len(out) == 1
    assert out[0]["win_start"] == 2 and out[0]["snippet"] == "term"


def test_snippet_no_match_yields_no_row(spark):
    docs = spark.createDataFrame([(1, "only mismatched words")], ["doc_id", "text"])
    q = spark.createDataFrame([("q1", "absent")], ["query_id", "term"])
    hits = spark.createDataFrame([("q1", 1)], ["query_id", "doc_id"])
    assert snippets(docs, q, hits, window=5).count() == 0
