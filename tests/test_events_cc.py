"""Connected-components dedup clustering + event-stream analytics tests:
hand-checkable component labelling (chains, cliques, singletons),
determinism across parallelism, and sessionization gap semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jassv2_spark.operators.dedup import connected_components, dedup_cluster_assign
from jassv2_spark.operators.events import sessionize, tumbling_counts

SF = "/root/testdata/sf0.001"


def test_cc_chain_cliques_singletons(spark):
    # components: chain {1,2,3,4}, clique {10,11,12}, singleton {20}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        ["doc_a", "doc_b"],
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20]], ["doc_id"])
    got = {r["node"]: r["label"] for r in connected_components(pairs, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_cc_long_chain_converges_logarithmically(spark):
    # 64-node path graph: diameter 63; pointer jumping must converge well
    # inside the 25-iteration cap (plain propagation would need 63)
    n = 64
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = connected_components(pairs, nodes, max_iter=12).collect()
    assert all(r["label"] == 0 for r in got) and len(got) == n


def test_cluster_assign_matches_exact_dup_groups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80).cache()
    out = dedup_cluster_assign(docs).collect()
    assert len(out) == 80
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)  # survivor = min id
    sizes = {r["doc_id"]: r["cluster_size"] for r in out}
    for cid, members in by_cluster.items():
        for m in members:
            assert sizes[m] == len(members)


def test_cc_deterministic_across_parallelism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    a = sorted(map(tuple, dedup_cluster_assign(docs.repartition(1)).collect()))
    b = sorted(map(tuple, dedup_cluster_assign(docs.repartition(17)).collect()))
    assert a == b


def _ev(spark, rows):
    return spark.createDataFrame(
        [(eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), uid, "c", v)
         for eid, m, uid, v in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_sessionize_gap_split(spark):
    # user 7: events at t+0, t+10, t+50 (40' gap > 30' => new session)
    ev = _ev(spark, [(1, 0, 7, 1.5), (2, 10, 7, 2.25), (3, 50, 7, 4.0)])
    out = sorted(sessionize(ev, gap_minutes=30).collect(), key=lambda r: r["session_idx"])
    assert [r["session_idx"] for r in out] == [1, 2]
    assert out[0]["n_events"] == 2 and out[1]["n_events"] == 1
    assert out[0]["sum_value_milli"] == 1500 + 2250
    assert out[0]["session_start"] == dt.datetime(2024, 1, 1)
    assert out[0]["session_end"] == dt.datetime(2024, 1, 1, 0, 10)


def test_sessionize_gap_boundary_inclusive(spark):
    # exactly 30' gap does NOT split (strict > semantics)
    ev = _ev(spark, [(1, 0, 3, 0.0), (2, 30, 3, 0.0)])
    out = sessionize(ev, gap_minutes=30).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_tumbling_epoch_aligned(spark):
    ev = _ev(spark, [(1, 5, 1, 1.0), (2, 59, 2, 1.0), (3, 61, 1, 1.0)])
    out = {(r["window_start"], r["n_events"], r["n_users"]) for r in tumbling_counts(ev).collect()}
    assert out == {
        (dt.datetime(2024, 1, 1, 0), 2, 2),
        (dt.datetime(2024, 1, 1, 1), 1, 1),
    }


def test_trending_terms_hand_checked(spark):
    import datetime

    from jassv2_spark.operators.events import trending_terms

    base = datetime.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),          # bucket 0
            (2, "alpha"),               # bucket 0
            (3, "alpha gamma gamma"),   # bucket 1
            (4, "gamma beta"),          # bucket 1
        ],
        ["doc_id", "text"],
    )
    ts = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=s))
         for i, s in [(1, 0), (2, 30), (3, 60), (4, 90)]],
        ["doc_id", "ts"],
    )
    got = {(r["bucket"], r["term"]): r for r in trending_terms(
        docs, ts, bucket_s=60, top_m=5).collect()}
    # bucket 0: alpha df2 (prev 0, delta 2), beta df1 (delta 1)
    assert got[(0, "alpha")]["delta"] == 2
    assert got[(0, "alpha")]["trend_rank"] == 1
    # bucket 1: gamma df2 prev 0 delta +2 (dedup within doc 3: df not tf);
    # alpha df1 prev 2 delta -1; beta df1 prev 1 delta 0
    assert (got[(1, "gamma")]["df"], got[(1, "gamma")]["delta"]) == (2, 2)
    assert got[(1, "gamma")]["trend_rank"] == 1
    assert got[(1, "alpha")]["delta"] == -1
    assert got[(1, "beta")]["delta"] == 0


def test_ab_test_conversion_counts_and_z(spark):
    import hashlib
    import math

    from jassv2_spark.operators.events import ab_test_conversion

    rows = []
    for u in range(40):
        rows.append((u, "view"))
        if u % 3 == 0:
            rows.append((u, "purchase"))
    ev = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = ab_test_conversion(ev).collect()[0]

    def variant(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for u in range(40):
        v = variant(u)
        n[v] += 1
        conv[v] += 1 if u % 3 == 0 else 0
    assert (out["n_a"], out["conv_a"]) == (n[0], conv[0])
    assert (out["n_b"], out["conv_b"]) == (n[1], conv[1])
    assert out["conv_a_ppm"] == 10**6 * conv[0] // n[0]
    p1, p2 = conv[0] / n[0], conv[1] / n[1]
    pp = (conv[0] + conv[1]) / (n[0] + n[1])
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
    assert out["z_micros"] == math.floor(1e6 * z)


def test_ab_test_zero_variance_z_is_null(spark):
    from jassv2_spark.operators.events import ab_test_conversion

    ev = spark.createDataFrame(
        [(u, "purchase") for u in range(20)], ["user_id", "event_type"]
    )
    out = ab_test_conversion(ev).collect()[0]
    assert out["z_micros"] is None  # every user converted: p-hat = 1
