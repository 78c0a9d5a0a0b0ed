"""Engine facade: result-side extension methods delegate correctly."""

import pytest
from pyspark.sql import functions as F

from jassv2_spark import Engine
from jassv2_spark.operators.build import BuildConf, build_index


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame(
        [(1, "spark join table", "en"), (2, "spark query window", "de"),
         (3, "join table table", "en"), (4, "window scan", "de")],
        ["doc_id", "text", "lang"],
    )
    e = Engine(build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    ))
    e._docs = docs
    return e


def test_facade_methods_run(spark, eng):
    q = spark.createDataFrame([("q1", "spark joinn")], ["query_id", "query"])
    assert eng.search_fuzzy(q, k=3).count() > 0
    allowed = eng._docs.where(F.col("lang") == "en")
    assert eng.search_filtered(
        spark.createDataFrame([("q1", "spark")], ["query_id", "query"]), allowed, k=3
    ).count() == 1
    qn = spark.createDataFrame([("q1", "table -join")], ["query_id", "query"])
    assert eng.search_negated(qn, k=5).count() == 0  # all 'table' docs have 'join'
    assert eng.more_like_this([1], k=2).count() > 0
    qs = spark.createDataFrame([("q1", "spark")], ["query_id", "query"])
    assert eng.facet_counts(qs, eng._docs, "lang").count() == 2
    assert eng.significant_terms(qs, m=5).count() > 0
    assert eng.ltr_features(qs, k=3).count() > 0
    assert eng.qpp_features(qs).count() == 1
    inc = spark.createDataFrame([(99, "spark text")], ["doc_id", "text"])
    assert eng.percolate(qs, inc).count() == 1


def test_run_tooling_facades(spark, eng):
    q = spark.createDataFrame(
        [("q1", "spark table"), ("q2", "window")], ["query_id", "query"]
    )
    full = eng.search(q, k=3)
    assert eng.doc_keyterms(m=2).groupBy("doc_id").count().count() == 4
    pool = eng.pool_runs([full, full], depth=3)
    assert pool.where(F.col("n_runs") != 2).count() == 0  # same run twice
    (cmp_row,) = eng.compare_runs(full, full, k=3).collect()
    assert cmp_row["ties"] == cmp_row["n"] and cmp_row["t_micros"] is None
    tau = eng.run_correlation(full, full, k=3).collect()
    assert all(r["tau_micros"] == 1_000_000 for r in tau)


def test_rbo_and_collapse_facades(spark, eng):
    q = spark.createDataFrame(
        [("q1", "spark table"), ("q2", "window")], ["query_id", "query"]
    )
    full = eng.search(q, k=3)
    rbo = eng.run_rbo(full, full, k=3).collect()
    # a self-comparison scores exactly 1.0 when the run fills the depth;
    # a shorter run legitimately scores < 1.0 under truncated RBO@k
    # (agreement A_d = n/d < 1 for d beyond the run length).
    assert rbo and all(
        r["rbo_micros"] == 1_000_000
        if r["n_common"] == 3
        else 0 < r["rbo_micros"] < 1_000_000
        for r in rbo
    )
    hosts = eng._docs.select(
        "doc_id", (F.col("doc_id") % 2).cast("string").alias("host")
    )
    coll = eng.collapse_results(full, hosts, per_host=1, k=3).collect()
    per = {}
    for r in coll:
        per.setdefault((r["query_id"], r["host"]), 0)
        per[(r["query_id"], r["host"])] += 1
    assert coll and max(per.values()) == 1


def test_anytime_quality_curve_facade(spark, eng):
    q = spark.createDataFrame(
        [("q1", "spark table"), ("q2", "window")], ["query_id", "query"]
    )
    rows = {r["rho_ppm"]: r for r in eng.anytime_quality_curve(
        q, rhos=(0.25, 1.0), k=3
    ).collect()}
    assert set(rows) == {250_000, 1_000_000}
    # ρ=1.0 processes every posting → identical to the exhaustive run
    full = rows[1_000_000]
    assert full["overlap_pct"] == 100 and full["sum_common"] == full["sum_full"]
    # the budgeted run can only lose overlap, never gain
    assert rows[250_000]["sum_common"] <= rows[250_000]["sum_full"]
    assert rows[250_000]["n_queries"] == 2


def test_search_prefix_facade(spark, eng):
    q = spark.createDataFrame([("q1", "sp win")], ["query_id", "query"])
    got = eng.search_prefix(q, k=3, min_prefix=2)
    assert got.count() > 0  # 'sp' -> spark, 'win' -> window
    # equivalent to literal search on the expanded terms
    full = spark.createDataFrame([("q1", "spark window")], ["query_id", "query"])
    want = sorted(map(tuple, eng.search(full, k=3).collect()))
    assert sorted(map(tuple, got.collect())) == want


def test_engine_wildcard_rocchio_suggest_context(spark):
    from jassv2_spark import Engine
    from jassv2_spark.operators.fuzzy import corpus_bigrams

    docs = spark.createDataFrame(
        [(1, "spark join table"), (2, "spark stream query"), (3, "join query")],
        ["doc_id", "text"],
    )
    eng = Engine.build(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id")
    q = spark.createDataFrame([("q1", "sp*k")], ["query_id", "query"])
    assert eng.search_wildcard(q, k=3).count() > 0
    q2 = spark.createDataFrame([("q2", "spark")], ["query_id", "query"])
    assert eng.search_rocchio(q2, k=3, fb_docs=2, fb_terms=3).count() > 0
    big = corpus_bigrams(docs)
    typo = spark.createDataFrame([("q3", "spark joim")], ["query_id", "query"])
    out = eng.suggest_context(typo, big).collect()[0]
    assert out["suggestion"] == "spark join" and out["n_corrected"] == 1


def test_engine_common_dropped_and_term_sharded(spark):
    from jassv2_spark import Engine

    docs = spark.createDataFrame(
        [(1, "the spark join"), (2, "the table"), (3, "the spark"), (4, "vector")],
        ["doc_id", "text"],
    )
    eng = Engine.build(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id")
    q = spark.createDataFrame([("q1", "the spark")], ["query_id", "query"])
    plain = sorted(map(tuple, eng.search(q, k=4).collect()))
    sharded = sorted(map(tuple, eng.search_term_sharded(q, k=4).collect()))
    assert sharded == plain
    dropped = eng.search_common_dropped(q, k=4, cutoff_ppm=600_000)
    # 'the' (df 3/4) drops; only the two 'spark' docs match
    assert {r["doc_id"] for r in dropped.collect()} == {1, 3}
