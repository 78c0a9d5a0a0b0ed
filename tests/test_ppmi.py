"""PPMI term-context features: python re-simulation parity on the exact
bit-length score and the map-side pair-generation rule, plus structural
checks (collocated pair outranks an incidental one)."""

import re

from jassv2_spark.operators.curation import ppmi_term_contexts


def _py_ppmi(corpus, window=3, top_m=5, min_pair=2):
    pairs = []
    for _, t in corpus:
        a = re.findall(r"[a-z]+|[0-9]+", t.lower())
        for i in range(len(a)):
            for o in range(1, window + 1):
                if i + o < len(a):
                    pairs.append((a[i], a[i + o]))
                    pairs.append((a[i + o], a[i]))
    pc, uni = {}, {}
    for w, c in pairs:
        pc[(w, c)] = pc.get((w, c), 0) + 1
        uni[w] = uni.get(w, 0) + 1
    n_all = sum(uni.values())
    bits = lambda x: x.bit_length()
    scored = [
        (w, c, n, max(0, bits(n) + bits(n_all) - bits(uni[w]) - bits(uni[c])))
        for (w, c), n in pc.items()
        if n >= min_pair
    ]
    out = {}
    for w in {s[0] for s in scored}:
        rows = sorted(
            [s for s in scored if s[0] == w], key=lambda s: (-s[3], -s[2], s[1])
        )[:top_m]
        for rk, (_, c, n, p) in enumerate(rows, 1):
            out[(w, c)] = (n, p, rk)
    return out


def _run(spark, corpus, **kw):
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    return {
        (r["term"], r["context"]): (r["n_pair"], r["ppmi_bits"], r["ctx_rank"])
        for r in ppmi_term_contexts(docs, **kw).collect()
    }


def test_ppmi_python_parity(spark):
    corpus = [
        (1, "new york city has new york pizza"),
        (2, "york new city the the the"),
        (3, "pizza in new york is good pizza"),
        (4, "the good city the good pizza"),
    ]
    assert _run(spark, corpus, window=3, top_m=5, min_pair_count=2) == _py_ppmi(
        corpus, window=3, top_m=5, min_pair=2
    )


def test_ppmi_collocation_beats_incidental(spark):
    # 'new york' always adjacent; 'the' co-occurs with everything ->
    # PPMI ranks 'york' above 'the' as a context of 'new'
    corpus = [(i, "new york " + "the filler " * 3) for i in range(6)]
    got = _run(spark, corpus, window=2, top_m=3, min_pair_count=2)
    assert got[("new", "york")][1] >= got.get(("new", "the"), (0, 0, 9))[1]
    assert got[("new", "york")][2] == 1


def test_ppmi_window_respects_document_boundary(spark):
    got = _run(spark, [(1, "alpha beta"), (2, "gamma delta")],
               window=5, top_m=5, min_pair_count=1)
    assert ("alpha", "gamma") not in got and ("beta", "gamma") not in got


def test_related_terms_python_parity_and_symmetry(spark):
    from jassv2_spark.operators.curation import related_terms

    corpus = [
        (1, "cat dog pet animal cat dog"),
        (2, "dog cat pet animal dog cat"),
        (3, "car road drive fast car road"),
        (4, "road car drive fast road car"),
        (5, "cat dog pet " * 3),
        (6, "car road drive " * 3),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    ctx = ppmi_term_contexts(docs, window=2, top_m=4, min_pair_count=2)
    got = {
        (r["term"], r["related"]): (r["n_shared"], r["dot"], r["sim_rank"])
        for r in related_terms(ctx, top_s=2, min_shared=2).collect()
    }
    # python re-simulation over the collected context table
    feats = {}
    for r in ctx.collect():
        feats.setdefault(r["term"], {})[r["context"]] = r["ppmi_bits"]
    want = {}
    for w1, f1 in feats.items():
        cands = []
        for w2, f2 in feats.items():
            if w1 == w2:
                continue
            shared = set(f1) & set(f2)
            if len(shared) >= 2:
                cands.append((w2, len(shared), sum(f1[c] * f2[c] for c in shared)))
        cands.sort(key=lambda t: (-t[2], -t[1], t[0]))
        for rk, (w2, ns, dot) in enumerate(cands[:2], 1):
            want[(w1, w2)] = (ns, dot, rk)
    assert got == want
    # cross-domain terms must not relate: 'cat' never pairs with 'car'
    assert ("cat", "car") not in got and ("car", "cat") not in got
