"""Significant terms: exact lift values, min_fg cut, rank order."""

import math

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.sigterms import significant_terms

# 'needle' co-occurs with every 'spark' doc but nowhere else → max lift
# for the 'spark' query; 'common' is in every doc → lift 1.
DOCS = [
    (1, "spark needle common"),
    (2, "spark needle common"),
    (3, "spark needle common"),
    (4, "other words common"),
    (5, "other stuff common"),
    (6, "unrelated text common"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )


def test_sigterms_lift_hand_checked(spark, idx):
    q = spark.createDataFrame([("q1", "spark")], ["query_id", "query"])
    rows = {r["term"]: r for r in
            significant_terms(idx, q, m=10, min_fg=2).collect()}
    # hit set = docs 1-3 (fg_n=3, N=6)
    rn = rows["needle"]
    assert (rn["fg_df"], rn["fg_n"], rn["bg_df"]) == (3, 3, 3)
    assert rn["lift_micros"] == math.floor((1e6 * (3 * 6)) / (3 * 3))  # lift 2.0
    rc = rows["common"]
    assert rc["lift_micros"] == 1_000_000  # background rate → lift 1
    # ranking: needle (and spark itself, same lift) above common
    assert rows["needle"]["sig_rank"] < rows["common"]["sig_rank"]
    assert "other" not in rows or rows.get("other") is None  # not in hit set


def test_min_fg_cuts_rare_noise(spark, idx):
    q = spark.createDataFrame([("q1", "spark")], ["query_id", "query"])
    terms3 = {r["term"] for r in significant_terms(idx, q, min_fg=3).collect()}
    terms1 = {r["term"] for r in significant_terms(idx, q, min_fg=1).collect()}
    assert terms3 <= terms1
    assert all(t in terms1 for t in ("spark", "needle", "common"))
