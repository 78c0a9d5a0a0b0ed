"""IR-eval metric goldens, hand-computed per the reference formulas
(`tools/JASS_eval.cpp`, `source/evaluate_*.cpp`)."""

import math

import pytest

from jassv2_spark.operators.evaluate import (
    evaluate_run,
    evaluate_run_priced,
    mean_metrics,
)


@pytest.fixture(scope="module")
def run_and_qrels(spark):
    # q1: ranks 1..4 = [rel, non, rel, non]; 3 relevant total (one unfound)
    # q2: no relevant assessments at all (MAP convention → 1, recall NULL)
    # q3: relevant exist but none retrieved (MAP 0)
    run = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q1", 13, 4),
         ("q2", 20, 1), ("q2", 21, 2),
         ("q3", 30, 1)],
        ["query_id", "doc_id", "rank"],
    )
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 12), ("q1", 99),
         ("q3", 31)],
        ["query_id", "doc_id"],
    )
    return run, qrels


def test_per_query_goldens(spark, run_and_qrels):
    run, qrels = run_and_qrels
    rows = {r["query_id"]: r for r in evaluate_run(run, qrels, depth=10).collect()}

    # q1: AP = (1/1 + 2/3) / 3  (divide by TOTAL relevant, evaluate_map.cpp)
    assert rows["q1"]["map"] == pytest.approx((1 + 2 / 3) / 3, abs=1e-12)
    assert rows["q1"]["mrr"] == pytest.approx(1.0)
    assert rows["q1"]["p_at_depth"] == pytest.approx(2 / 10)
    assert rows["q1"]["recall"] == pytest.approx(2 / 3)
    # RBP(p=.95) = .05 * (p^0 + p^2)
    assert rows["q1"]["rbp"] == pytest.approx(0.05 * (1 + 0.95 ** 2), abs=1e-9)

    assert rows["q2"]["map"] == 1.0  # no relevant assessments → 1
    assert rows["q2"]["recall"] is None
    assert rows["q3"]["map"] == 0.0
    assert rows["q3"]["mrr"] == 0.0


def test_esl_and_f1(spark, run_and_qrels):
    """ESL (`evaluate_expected_search_length.cpp:21-39`): non-relevant seen
    before the first relevant, depth when none. F1 (`evaluate_f.cpp:20-29`)."""
    run, qrels = run_and_qrels
    rows = {r["query_id"]: r for r in evaluate_run(run, qrels, depth=10).collect()}
    assert rows["q1"]["esl"] == 0.0  # first result is relevant
    assert rows["q2"]["esl"] == 10.0  # no relevant → depth
    assert rows["q3"]["esl"] == 10.0
    p, r = 0.2, 2 / 3
    assert rows["q1"]["f1"] == pytest.approx(2 * ((p * r) / (p + r)), abs=1e-12)
    assert rows["q2"]["f1"] is None  # recall undefined
    assert rows["q3"]["f1"] == 0.0


def test_ecommerce_metrics_goldens(spark, run_and_qrels):
    """Hand-computed CP/BP/SP per `evaluate_cheapest_precision.cpp`,
    `evaluate_buying_power.cpp`, `evaluate_selling_power.cpp`."""
    run, qrels = run_and_qrels
    prices = spark.createDataFrame(
        [(10, 5.0), (11, 7.0), (12, 3.0), (13, 9.0), (99, 2.0),
         (20, 4.0), (21, 6.0), (30, 8.0), (31, 1.0)],
        ["doc_id", "price"],
    )
    rows = {
        r["query_id"]: r
        for r in evaluate_run_priced(run, qrels, prices, depth=10).collect()
    }
    # q1: rel {10:5, 12:3, 99:2}; results [10,11,12,13]
    # BP: cheapest rel price 2; spend through first relevant (rank 1) = 5
    assert rows["q1"]["buying_power"] == pytest.approx(2 / 5, abs=1e-15)
    # SP: query_depth=3; rel hits at ranks 1 (price 5) and 3 (price 3);
    # cheapest rel prices in order: [2, 3, 5] → (2/5 + 3/3) / 3
    assert rows["q1"]["selling_power"] == pytest.approx((2 / 5 + 1.0) / 3, abs=1e-15)
    # CP: slice keeps all 3 relevant (sp0=4 ≥ 3); found 10, 12 → 2/10
    assert rows["q1"]["cheapest_precision"] == pytest.approx(0.2, abs=1e-15)

    # q2: no relevant assessments → all perfect scores
    assert rows["q2"]["buying_power"] == 1.0
    assert rows["q2"]["selling_power"] == 1.0
    assert rows["q2"]["cheapest_precision"] == 1.0

    # q3: relevant {31} never retrieved
    assert rows["q3"]["buying_power"] == 0.0
    assert rows["q3"]["selling_power"] == 0.0
    assert rows["q3"]["cheapest_precision"] == 0.0


def test_4k_metrics(spark, run_and_qrels):
    """MRR4K (`evaluate_mean_reciprocal_rank4k.cpp:19-44`) and BP4K
    (`evaluate_buying_power4k.cpp:21-95`) at k4=2."""
    run, qrels = run_and_qrels
    rows = {r["query_id"]: r for r in evaluate_run(run, qrels, depth=10, k4=2).collect()}
    # q1: relevant at ranks 1 and 3 → (1/1 + 1/3) / 2
    assert rows["q1"]["mrr4k"] == pytest.approx((1 + 1 / 3) / 2, abs=1e-12)
    assert rows["q2"]["mrr4k"] == 0.0  # no relevant
    assert rows["q3"]["mrr4k"] == 0.0  # fewer than k4 relevant retrieved

    prices = spark.createDataFrame(
        [(10, 5.0), (11, 7.0), (12, 3.0), (13, 9.0), (99, 2.0),
         (20, 4.0), (21, 6.0), (30, 8.0), (31, 1.0)],
        ["doc_id", "price"],
    )
    prow = {
        r["query_id"]: r
        for r in evaluate_run_priced(run, qrels, prices, depth=10, k4=2).collect()
    }
    # q1: 2 cheapest relevant = 2+3 = 5; spend through 2nd relevant hit
    # (ranks 1..3: 5+7+3 = 15) → 5/15
    assert prow["q1"]["buying_power4k"] == pytest.approx(5 / 15, abs=1e-15)
    assert prow["q2"]["buying_power4k"] == 0.0  # n_rel < k4
    assert prow["q3"]["buying_power4k"] == 0.0


def test_price_ndcg_goldens(spark, run_and_qrels):
    """PBnDCG / BPnDCG per the reference formulas
    (`evaluate_price_based_normalized_discounted_cumulative_gain.cpp`,
    `evaluate_buying_power_normalized_discounted_cumulative_gain.cpp`),
    recomputed independently here."""
    run, qrels = run_and_qrels
    prices = spark.createDataFrame(
        [(10, 5.0), (11, 7.0), (12, 3.0), (13, 9.0), (99, 2.0),
         (20, 4.0), (21, 6.0), (30, 8.0), (31, 1.0)],
        ["doc_id", "price"],
    )
    rows = {
        r["query_id"]: r
        for r in evaluate_run_priced(run, qrels, prices, depth=10).collect()
    }

    # q1: relevant prices {5, 3, 2}; results [(1, price 5, rel), (2, 7, non),
    # (3, 3, rel), (4, 9, non)]
    lo, hi = 2.0, 5.0
    bins = [lo + (hi - lo) * (1 - math.exp(i)) / (1 - math.exp(5)) for i in range(5)]

    def gain(p):
        return 6 - sum(1 for b in bins if b <= p)

    ideal_prices = [2.0, 3.0, 5.0]
    pb_ideal = sum(gain(p) / math.log2(i + 2) for i, p in enumerate(ideal_prices))
    bp_ideal = sum((lo / p) / math.log2(i + 2) for i, p in enumerate(ideal_prices))
    pb_dcg = gain(5.0) / math.log2(0 + 2) + gain(3.0) / math.log2(2 + 2)
    bp_dcg = (lo / 5.0) / math.log2(0 + 2) + (lo / 3.0) / math.log2(2 + 2)
    assert rows["q1"]["pb_ndcg"] == pytest.approx(pb_dcg / pb_ideal, abs=1e-12)
    assert rows["q1"]["bp_ndcg"] == pytest.approx(bp_dcg / bp_ideal, abs=1e-12)

    assert rows["q2"]["pb_ndcg"] == 1.0  # no relevant assessments
    assert rows["q2"]["bp_ndcg"] == 1.0
    assert rows["q3"]["pb_ndcg"] == 0.0  # relevant exists, none retrieved
    assert rows["q3"]["bp_ndcg"] == 0.0


def test_gmap_reference_semantics(spark, run_and_qrels):
    """GMAP = exp(mean over ALL queries of (ap==0 ? 0 : ln ap))
    (`tools/JASS_eval.cpp:295,365`): zero-AP queries contribute log-term 0
    yet still count in the denominator."""
    run, qrels = run_and_qrels
    per_q = evaluate_run(run, qrels, depth=10)
    m = mean_metrics(per_q).collect()[0]

    ap_q1 = (1 + 2 / 3) / 3
    expected = math.exp((math.log(ap_q1) + math.log(1.0) + 0.0) / 3)
    assert m["gmap"] == pytest.approx(expected, abs=1e-12)
    assert m["n_queries"] == 3
    assert m["mean_map"] == pytest.approx((ap_q1 + 1.0 + 0.0) / 3, abs=1e-12)


def test_deep_depth_float_fallback(spark, run_and_qrels):
    """depth > ~42 overflows the lcm fixed-point; the float fallback must
    return the same metric values (JASS_eval reports depths 100/200/...)."""
    run, qrels = run_and_qrels
    rows = {r["query_id"]: r for r in evaluate_run(run, qrels, depth=100).collect()}
    assert rows["q1"]["map"] == pytest.approx((1 + 2 / 3) / 3, abs=1e-12)
    assert rows["q1"]["mrr"] == pytest.approx(1.0)
    assert rows["q1"]["p_at_depth"] == pytest.approx(2 / 100)
    assert rows["q2"]["map"] == 1.0
    assert rows["q3"]["map"] == 0.0
    # shallow (fixed-point) and deep (float) agree on rank-limited metrics
    shallow = {r["query_id"]: r for r in evaluate_run(run, qrels, depth=10).collect()}
    assert rows["q1"]["map"] == pytest.approx(shallow["q1"]["map"], abs=1e-12)


def test_ndcg_goldens(spark, run_and_qrels):
    """Graded nDCG@10, exponential gains 2^rel - 1, hand-computed
    (Järvelin & Kekäläinen TOIS'02; trec_eval convention — the metric the
    reference's JASS_eval lacks outside its price-binned variants)."""
    from jassv2_spark.operators.evaluate import evaluate_ndcg, ndcg_discounts_fixed

    run, _ = run_and_qrels
    qrels = spark.createDataFrame(
        [("q1", 10, 2), ("q1", 12, 1), ("q1", 99, 3),
         ("q3", 31, 1),
         ("q1", 13, 0)],  # rel=0 rows are non-relevant: must be ignored
        ["query_id", "doc_id", "rel"],
    )
    rows = {r["query_id"]: r for r in evaluate_ndcg(run, qrels, depth=10).collect()}

    w, scale = ndcg_discounts_fixed(10, 4)
    wi = dict(w)
    assert scale == 1 << 54  # 15 * 2^54 * 10 < 2^62 <= 15 * 2^55 * 10
    for r in (1, 5, 10):
        assert wi[r] == round(scale / math.log2(r + 1))

    # q1: run = [10(rel2)@1, 11@2, 12(rel1)@3, 13(rel0)@4]
    dcg = 3 * wi[1] + 1 * wi[3]
    idcg = 7 * wi[1] + 3 * wi[2] + 1 * wi[3]  # ideal: rel 3, 2, 1
    assert rows["q1"]["dcg_int"] == dcg
    assert rows["q1"]["idcg_int"] == idcg
    assert rows["q1"]["ndcg"] == dcg / idcg  # exact: one int64→double divide

    # q3: relevant exists (doc 31) but none retrieved
    assert rows["q3"]["dcg_int"] == 0
    assert rows["q3"]["idcg_int"] == 1 * wi[1]
    assert rows["q3"]["ndcg"] == 0.0

    # q2: no positively graded assessment → omitted entirely (0/0)
    assert "q2" not in rows

    # grades above max_rel clamp to it (overflow guard)
    qrels_hot = spark.createDataFrame([("q1", 10, 9)], ["query_id", "doc_id", "rel"])
    hot = evaluate_ndcg(run, qrels_hot, depth=10, max_rel=4).collect()[0]
    assert hot["dcg_int"] == 15 * wi[1]
    assert hot["idcg_int"] == 15 * wi[1]
    assert hot["ndcg"] == 1.0


def test_rbp_moffat_vector(spark):
    """The Moffat et al. worked example the reference's OWN RBP class
    unittests ($$---$----$-----$--- at p=0.95 → 0.1881,
    `evaluate_rank_biased_precision.cpp:44-56`). The JASS_eval CLI cannot
    serve as the oracle here — its RBP line calls the MAP computer
    (`tools/JASS_eval.cpp:836`), a live bug documented by
    tests/test_eval_differential.py — so the class vector is the anchor."""
    import pytest as _pytest

    from jassv2_spark.operators.evaluate import evaluate_run

    pattern = "$$---$----$-----$---"
    run = spark.createDataFrame(
        [("m1", f"d{i}", i + 1) for i in range(len(pattern))],
        "query_id string, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [("m1", f"d{i}") for i, c in enumerate(pattern) if c == "$"],
        "query_id string, doc_id string",
    )
    (row,) = evaluate_run(run, qrels, depth=len(pattern)).collect()
    assert row["rbp"] == _pytest.approx(0.1881, abs=5e-5)
