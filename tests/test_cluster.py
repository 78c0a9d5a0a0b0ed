"""k-means + cluster-balanced sampling: exact re-simulation of the
fixed-point Lloyd's recipe (floor-micros components, integer distances,
floor-div centroid means, low-cluster tie-break) plus structural checks."""

import hashlib
import math

from jassv2_spark.operators.cluster import cluster_sample, kmeans_assign

VECS = {
    # two obvious blobs plus a straggler between them
    1: [0.1, 0.2],
    2: [0.0, -0.1],
    3: [0.15, 0.05],
    4: [10.0, 10.1],
    5: [9.9, 10.0],
    6: [10.2, 9.95],
    7: [5.0, 5.0],
}


def _py_kmeans(vecs, k, iters, scale=10**6):
    iv = {i: [math.floor(x * scale) for x in v] for i, v in vecs.items()}
    cent = {j: list(iv[i]) for j, i in enumerate(sorted(iv)[:k])}
    assign = {}
    for it in range(iters):
        for i, v in iv.items():
            best = min(
                (sum((x - c) ** 2 for x, c in zip(v, cv)), j)
                for j, cv in cent.items()
            )
            assign[i] = best[1]
        if it == iters - 1:
            break
        nxt = {}
        for j in set(assign.values()):
            members = [iv[i] for i in iv if assign[i] == j]
            nxt[j] = [
                sum(col) // len(members) for col in zip(*members)  # floor div
            ]
        cent = nxt
    return assign


def _spark_assign(spark, k=2, iters=4):
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(VECS.items())],
        "vec_id long, embedding array<double>",
    )
    return kmeans_assign(emb, k=k, iterations=iters)


def test_kmeans_matches_reference_simulation(spark):
    got = {r["vec_id"]: r["cluster"] for r in _spark_assign(spark).collect()}
    assert got == _py_kmeans(VECS, k=2, iters=4)


def test_kmeans_separates_blobs(spark):
    got = {r["vec_id"]: r["cluster"] for r in _spark_assign(spark).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_kmeans_single_iteration_is_seed_assignment(spark):
    got = {r["vec_id"]: r["cluster"] for r in _spark_assign(spark, iters=1).collect()}
    assert got == _py_kmeans(VECS, k=2, iters=1)


def test_cluster_sample_is_md5_ranked(spark):
    assigned = _spark_assign(spark)
    got = {
        (r["vec_id"], r["cluster"], r["rk"])
        for r in cluster_sample(assigned, n_per_cluster=2).collect()
    }
    ref = _py_kmeans(VECS, k=2, iters=4)
    want = set()
    for j in set(ref.values()):
        members = sorted(
            (i for i in ref if ref[i] == j),
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        want |= {(i, j, rk + 1) for rk, i in enumerate(members[:2])}
    assert got == want


def test_cluster_labels_topm_tfidf(spark):
    import math

    from jassv2_spark.operators.build import BuildConf, build_index
    from jassv2_spark.operators.cluster import cluster_labels

    docs = spark.createDataFrame(
        [
            (1, "spark join table table"),
            (2, "spark join join"),
            (3, "cable coin coin"),
            (4, "coin window window"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(
        docs, text_col="text", key_col="doc_id", doc_id_col="doc_id",
        conf=BuildConf(tokenizer="parity"),
    )
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["vec_id", "cluster"]
    )
    got = {
        (r["cluster"], r["term"]): (r["ctf"], r["df"], r["weight_micros"], r["term_rank"])
        for r in cluster_labels(idx, assign, m=2).collect()
    }
    # cluster 0: table ctf=2 df=1, join ctf=3 df=2, spark ctf=2 df=2
    # weights: table 2·ln(4) > join 3·ln(2) > spark 2·ln(2)
    assert 2 * math.log(4) > 3 * math.log(2) > 2 * math.log(2)
    im = lambda d: int(math.floor(1_000_000 * math.log(4 / d)))
    assert got[(0, "table")] == (2, 1, 2 * im(1), 1)
    assert got[(0, "join")] == (3, 2, 3 * im(2), 2)
    assert (0, "spark") not in got
    # cluster 1: coin ctf=3 df=2 beats window ctf=2 df=1 (3ln2 > 2ln4? no!)
    assert 2 * math.log(4) > 3 * math.log(2)
    assert got[(1, "window")] == (2, 1, 2 * im(1), 1)
    assert got[(1, "coin")] == (3, 2, 3 * im(2), 2)


def test_keep_best_picks_highest_quality_rep(spark):
    from jassv2_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (10, "y")], ["doc_id", "text"]
    )
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 1)],
        ["doc_id", "cluster_id", "cluster_size"],
    )
    quality = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9)], ["doc_id", "quality"]  # 10 missing → 0
    )
    out = {r["doc_id"]: r for r in dedup_keep_best(
        docs, clusters=clusters, quality=quality
    ).collect()}
    # tie at quality 9 between 2 and 3 → smaller id wins
    assert out[2]["rep_doc_id"] == 2 and out[2]["keep"] is True
    assert out[3]["rep_doc_id"] == 2 and out[3]["keep"] is False
    assert out[1]["keep"] is False
    # singleton with missing quality keeps itself at quality 0
    assert out[10]["quality"] == 0 and out[10]["keep"] is True


def test_keep_best_default_quality_is_n_types(spark):
    from jassv2_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta gamma delta"),   # 4 types
            (2, "alpha beta alpha beta gamma"),          # 3 types, same shingles head
        ],
        ["doc_id", "text"],
    )
    clusters = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 2)], ["doc_id", "cluster_id", "cluster_size"]
    )
    out = {r["doc_id"]: r for r in dedup_keep_best(docs, clusters=clusters).collect()}
    assert out[1]["keep"] is True and out[1]["quality"] == 4
    assert out[2]["keep"] is False and out[2]["quality"] == 3


def test_lsh_quality_counts_against_brute_force(spark):
    from jassv2_spark.operators.dedup import (
        lsh_candidate_quality,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    texts = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),    # near-dup of 1
        (3, "one two three four five six seven"),
        (4, "one two three four five six eight"),     # near-dup of 3
        (5, "totally different words here now"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    out = lsh_candidate_quality(docs, tau_num=1, tau_den=2).collect()[0]
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs).collect()
        if 2 * r["inter"] >= r["uni"]
    }
    cand = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert out["n_true"] == len(truth)
    assert out["n_candidates"] == len(cand)
    assert out["tp"] == len(truth & cand)
    assert out["fp"] == len(cand - truth)
    assert out["fn"] == len(truth - cand)
    assert out["tp"] + out["fn"] == out["n_true"]
    if out["n_candidates"]:
        assert out["precision_ppm"] == 10**6 * out["tp"] // out["n_candidates"]


def test_lsh_quality_vacuous_conventions(spark):
    from jassv2_spark.operators.dedup import lsh_candidate_quality

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")], ["doc_id", "text"]
    )
    out = lsh_candidate_quality(docs, tau_num=1, tau_den=2).collect()[0]
    assert out["n_true"] == 0 and out["n_candidates"] == 0
    assert out["precision_ppm"] == 10**6 and out["recall_ppm"] == 10**6


def test_minhash_estimate_audit_vs_python(spark):
    import hashlib

    from jassv2_spark.operators.dedup import minhash_estimate_audit

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",
        3: "alpha beta gamma delta epsilon zeta",  # exact dup of 1
    }
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    out = {(r["doc_a"], r["doc_b"]): r for r in minhash_estimate_audit(docs).collect()}

    def shingles(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    def sig(t):
        return [
            min(hashlib.md5(f"{i}:{s}".encode()).hexdigest() for s in shingles(t))
            for i in range(16)
        ]

    # exact dup: guaranteed band collision; all 16 components agree
    r13 = out[(1, 3)]
    assert r13["n_hash_agree"] == 16 and r13["est_ppm"] == 10**6
    assert r13["true_ppm"] == 10**6 and r13["err_ppm"] == 0
    # every emitted pair matches the python-reference signature agreement
    # and exact Jaccard (near-dup pairs appear only when banding catches
    # them - that selectivity is lsh_candidate_quality's subject)
    for (a, b), r in out.items():
        sa, sb = sig(texts[a]), sig(texts[b])
        assert r["n_hash_agree"] == sum(x == y for x, y in zip(sa, sb))
        inter = len(shingles(texts[a]) & shingles(texts[b]))
        uni = len(shingles(texts[a]) | shingles(texts[b]))
        assert r["true_ppm"] == 10**6 * inter // uni
        assert r["err_ppm"] == abs(r["est_ppm"] - r["true_ppm"])
