"""Zipf rank-frequency profile and log-log slope."""

import math

import pytest

from jassv2_spark.operators.build import BuildConf, build_index
from jassv2_spark.operators.textstats import zipf_profile, zipf_slope


@pytest.fixture(scope="module")
def postings(spark):
    # ctf: aaa=6, bbb=3, ccc=2, ddd=1 (term-ASC tiebreak never needed)
    docs = spark.createDataFrame(
        [
            (1, "aaa aaa aaa bbb ccc"),
            (2, "aaa aaa aaa bbb bbb ccc ddd"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    return idx.postings


def test_profile_ranked_by_ctf(spark, postings):
    got = sorted(zipf_profile(postings, top_r=3).collect(),
                 key=lambda r: r["rank"])
    assert [(r["rank"], r["term"], r["ctf"]) for r in got] == [
        (1, "aaa", 6), (2, "bbb", 3), (3, "ccc", 2),
    ]


def test_slope_matches_hand_regression(spark, postings):
    (r,) = zipf_slope(postings, top_r=4).collect()
    assert r["n_ranks"] == 4
    xs = [math.floor(1e6 * math.log(i)) for i in (1, 2, 3, 4)]
    ys = [math.floor(1e6 * math.log(c)) for c in (6, 3, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    want = math.floor(1e6 * float(n * sxy - sx * sy) / float(n * sxx - sx * sx))
    assert r["slope_micros"] == want
    # perfectly Zipfian-ish fixture: slope is strongly negative
    assert r["slope_micros"] < -1_000_000


def test_slope_single_rank_is_null(spark, postings):
    (r,) = zipf_slope(postings, top_r=1).collect()
    assert r["n_ranks"] == 1 and r["slope_micros"] is None
