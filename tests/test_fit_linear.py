"""Closed-form OLS (fit_linear): exact recovery of a planted linear
model, numpy lstsq parity on noisy data, and singular-Gram handling."""

import numpy as np

from jassv2_spark.operators.ltr import fit_linear

COLS = ["x1", "x2", "y"]


def _run(spark, rows):
    df = spark.createDataFrame(rows, COLS)
    r = fit_linear(df, "x1", "x2", "y").collect()[0]
    return (r["n_rows"], r["w1_micros"], r["w2_micros"], r["w0_micros"], r["singular"])


def test_recovers_planted_integer_model_exactly(spark):
    # y = 3*x1 - 2*x2 + 7, exact integer data -> exact micros weights
    rows = [(x1, x2, 3 * x1 - 2 * x2 + 7)
            for x1 in range(0, 6) for x2 in range(0, 4)]
    assert _run(spark, rows) == (24, 3_000_000, -2_000_000, 7_000_000, False)


def test_matches_numpy_lstsq_on_nonexact_data(spark):
    rng = np.random.default_rng(5)
    X1 = rng.integers(0, 50, 40)
    X2 = rng.integers(0, 20, 40)
    Y = 2 * X1 + 5 * X2 + rng.integers(-3, 4, 40)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(X1, X2, Y)]
    n, w1, w2, w0, sing = _run(spark, rows)
    A = np.stack([X1, X2, np.ones_like(X1)], axis=1).astype(float)
    ref = np.linalg.lstsq(A, Y.astype(float), rcond=None)[0]
    assert not sing and n == 40
    for got_micros, want in zip((w1, w2, w0), ref):
        assert abs(got_micros / 1e6 - want) < 1e-5  # floor(1e6·exact) vs float


def test_collinear_features_flag_singular(spark):
    rows = [(i, 2 * i, i + 1) for i in range(10)]  # x2 = 2*x1
    n, w1, w2, w0, sing = _run(spark, rows)
    assert sing is True and (w1, w2, w0) == (0, 0, 0)


def test_empty_input_singular(spark):
    df = spark.createDataFrame([], "x1 long, x2 long, y long")
    r = fit_linear(df, "x1", "x2", "y").collect()[0]
    assert r["singular"] is True and r["n_rows"] == 0


def test_ridge_resolves_collinearity_and_shrinks(spark):
    from jassv2_spark.operators.ltr import fit_linear

    rows = [(i, 2 * i, 3 * i + 1) for i in range(1, 11)]  # x2 = 2*x1
    df = spark.createDataFrame(rows, COLS)
    r0 = fit_linear(df, "x1", "x2", "y").collect()[0]
    assert r0["singular"] is True
    r1 = fit_linear(df, "x1", "x2", "y", ridge=1).collect()[0]
    assert r1["singular"] is False
    big = fit_linear(df, "x1", "x2", "y", ridge=10**9).collect()[0]
    # huge lambda crushes feature weights toward 0, intercept -> mean(y)
    assert abs(big["w1_micros"]) < abs(r1["w1_micros"])
    assert abs(big["w1_micros"]) < 1000 and abs(big["w2_micros"]) < 1000


def test_ltr_rerank_orders_by_model_score(spark):
    from jassv2_spark.operators.ltr import ltr_rerank

    feats = spark.createDataFrame(
        [
            ("q1", 1, 10, 2),
            ("q1", 2, 20, 1),
            ("q1", 3, 15, 3),
            ("q2", 4, 5, 1),
        ],
        ["query_id", "doc_id", "rsv", "n_matched"],
    )
    # model favors n_matched heavily: w1=1, w2=1000, w0=7 (micros already)
    w = spark.createDataFrame(
        [(1, 1000, 7)], ["w1_micros", "w2_micros", "w0_micros"]
    )
    out = ltr_rerank(feats, w, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    q1 = sorted(by_q["q1"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in q1] == [3, 1, 2]  # 3·1000+15 > 2·1000+10 > 1·1000+20
    assert q1[0]["ltr_micros"] == 15 + 3 * 1000 + 7
    assert by_q["q2"][0]["rank"] == 1


def test_ltr_rerank_after_fit_is_deterministic(spark):
    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.ltr import fit_linear, ltr_features, ltr_rerank
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    idx = build_index(docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
                      conf=BuildConf(tokenizer="parity"))
    q = spark.createDataFrame([("q1", "spark join"), ("q2", "hash scan")],
                              ["query_id", "query"])
    feats = ltr_features(idx, q, k=10)
    data = feats.select(F.col("rsv").alias("x1"), F.col("n_matched").alias("x2"),
                        F.least(F.col("sum_tf"), F.lit(50)).cast("long").alias("y"))
    w = fit_linear(data, "x1", "x2", "y")
    r1 = sorted(map(tuple, ltr_rerank(feats, w, k=10).collect()))
    r2 = sorted(map(tuple, ltr_rerank(feats, w, k=10).collect()))
    assert r1 == r2 and len(r1) == 20
